"""Block-SpMM Pallas kernel parity vs segment_sum propagation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.ops.graph import build_graph, propagate
from recsys_tpu.ops.pallas_spmm import block_graph, spmm


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(0)
    nu, ni = 700, 500
    e = np.unique(np.stack([rng.integers(0, nu, 8000),
                            rng.integers(0, ni, 8000)], 1), axis=0)
    return build_graph(e[:, 0], e[:, 1], nu, ni, svd_rank=3, pad_multiple=128)


@pytest.mark.parametrize("pack", [1, 2])
@pytest.mark.parametrize("wide", [True, False])
def test_spmm_forward_parity(graph, pack, wide):
    n = graph.num_nodes
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    ref = propagate(x, jnp.asarray(graph.src), jnp.asarray(graph.dst),
                    jnp.asarray(graph.weight), n)
    blocked = block_graph(graph.src, graph.dst, graph.weight, n,
                          block_n=256, chunk_e=1024, pack=pack, wide=wide)
    got = spmm(blocked.meta, blocked.device_arrays(), x, "f32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_spmm_packed_narrow_features(graph):
    """pack=2 with feat < 64 (lanes only partially used) stays exact."""
    n = graph.num_nodes
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    ref = propagate(x, jnp.asarray(graph.src), jnp.asarray(graph.dst),
                    jnp.asarray(graph.weight), n)
    blocked = block_graph(graph.src, graph.dst, graph.weight, n,
                          block_n=512, chunk_e=1024, pack=2)
    got = spmm(blocked.meta, blocked.device_arrays(), x, "f32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("pack", [1, 2])
def test_spmm_grad_is_symmetric_propagation(graph, pack):
    n = graph.num_nodes
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    blocked = block_graph(graph.src, graph.dst, graph.weight, n,
                          block_n=256, chunk_e=1024, pack=pack)
    arrays = blocked.device_arrays()
    dx = jax.grad(lambda xx: jnp.sum(spmm(blocked.meta, arrays, xx, "f32") * g))(x)
    dx_ref = propagate(g, jnp.asarray(graph.src), jnp.asarray(graph.dst),
                       jnp.asarray(graph.weight), n)  # A^T g == A g
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-5)


def test_block_graph_covers_all_dst_blocks(graph):
    n = graph.num_nodes
    blocked = block_graph(graph.src, graph.dst, graph.weight, n,
                          block_n=256, chunk_e=1024)
    n_blocks = blocked.meta.num_nodes // 256
    assert set(blocked.dst_block.tolist()) == set(range(n_blocks))
    # dst-major ordering (the kernel's accumulation contract)
    assert (np.diff(blocked.dst_block) >= 0).all()
    # real edge count preserved
    assert (blocked.weight > 0).sum() == (graph.weight > 0).sum()


@pytest.mark.parametrize("split", [2, 4])
def test_spmm_split_chunks_parity(graph, split):
    """split>1 packs multiple same-dst logical runs per physical chunk
    (small-block fragmentation fix); result must match exactly."""
    n = graph.num_nodes
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    ref = propagate(x, jnp.asarray(graph.src), jnp.asarray(graph.dst),
                    jnp.asarray(graph.weight), n)
    blocked = block_graph(graph.src, graph.dst, graph.weight, n,
                          block_n=256, chunk_e=1024, pack=2, split=split)
    got = spmm(blocked.meta, blocked.device_arrays(), x, "f32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # grad path shares the kernel (symmetric A)
    g = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    arrays = blocked.device_arrays()
    dx = jax.grad(lambda xx: jnp.sum(spmm(blocked.meta, arrays, xx, "f32") * g))(x)
    dx_ref = propagate(g, jnp.asarray(graph.src), jnp.asarray(graph.dst),
                       jnp.asarray(graph.weight), n)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-5)


@pytest.mark.parametrize("mxu_parts", [2, 4])
def test_spmm_mxu_parts_parity(graph, mxu_parts):
    """mxu_parts>1 chops the wide kernel's per-chunk matmuls into
    independent sub-chains (VPU/MXU overlap); result must match exactly,
    forward and grad (the default GNN config runs mxu_parts=2)."""
    n = graph.num_nodes
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    ref = propagate(x, jnp.asarray(graph.src), jnp.asarray(graph.dst),
                    jnp.asarray(graph.weight), n)
    blocked = block_graph(graph.src, graph.dst, graph.weight, n,
                          block_n=256, chunk_e=1024, pack=2,
                          mxu_parts=mxu_parts)
    arrays = blocked.device_arrays()
    got = spmm(blocked.meta, arrays, x, "f32")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    g = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    dx = jax.grad(lambda xx: jnp.sum(spmm(blocked.meta, arrays, xx, "f32") * g))(x)
    dx_ref = propagate(g, jnp.asarray(graph.src), jnp.asarray(graph.dst),
                       jnp.asarray(graph.weight), n)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-5)


def test_block_graph_autoscales_block_n_to_smem_budget(monkeypatch):
    """When the chunk-count bound would blow the SMEM scalar-prefetch
    budget, block_graph must double block_n until it fits (the H&M-shape
    failure mode: ~278k chunks at block_n=1024 > 1 MB/operand)."""
    import recsys_tpu.ops.pallas_spmm as ps

    rng = np.random.default_rng(0)
    n_nodes = 4096
    e = 6000
    src = rng.integers(0, n_nodes, e)
    dst = rng.integers(0, n_nodes, e)
    w = np.ones(e, np.float32)
    base = ps.block_graph(src, dst, w, n_nodes, block_n=1024, chunk_e=1024)
    # shrink the budget below the base chunk arrays -> must auto-scale
    need = 8 * base.meta.num_chunks
    monkeypatch.setattr(ps, "SMEM_PREFETCH_BUDGET", need - 1)
    scaled = ps.block_graph(src, dst, w, n_nodes, block_n=1024, chunk_e=1024)
    assert scaled.meta.block_n > 1024
    assert 8 * scaled.meta.num_chunks < need
    # numerics identical across the two geometries
    x = rng.normal(size=(scaled.meta.num_nodes, 8)).astype(np.float32)
    xb = x[: base.meta.num_nodes]
    a = ps.spmm(base.meta, jax.tree.map(jnp.asarray, base.device_arrays()),
                jnp.asarray(xb), "fp32")
    b = ps.spmm(scaled.meta, jax.tree.map(jnp.asarray, scaled.device_arrays()),
                jnp.asarray(x), "fp32")
    np.testing.assert_allclose(np.asarray(a)[:n_nodes],
                               np.asarray(b)[:n_nodes], rtol=2e-4, atol=2e-4)


def test_block_graph_smem_bound_counts_split_operands(monkeypatch):
    """The SMEM bound models split+1 scalar-prefetch operands (db + one sb
    column per slot), so at an equal budget a split=4 geometry must scale
    block_n at least as far as split=1 (ADVICE r2: the old 2-operand
    estimate let split>1 pass the check yet exceed the per-kernel SMEM)."""
    import recsys_tpu.ops.pallas_spmm as ps

    rng = np.random.default_rng(1)
    n_nodes = 4096
    e = 6000
    src = rng.integers(0, n_nodes, e)
    dst = rng.integers(0, n_nodes, e)
    w = np.ones(e, np.float32)
    base = ps.block_graph(src, dst, w, n_nodes, block_n=512, chunk_e=1024,
                          pack=2, split=1)
    # budget that base (2 operands) passes exactly
    monkeypatch.setattr(ps, "SMEM_PREFETCH_BUDGET",
                        4 * 2 * base.meta.num_chunks + 4096)
    s1 = ps.block_graph(src, dst, w, n_nodes, block_n=512, chunk_e=1024,
                        pack=2, split=1)
    s4 = ps.block_graph(src, dst, w, n_nodes, block_n=512, chunk_e=1024,
                        pack=2, split=4)
    assert s4.meta.block_n >= s1.meta.block_n
    # the split geometry actually fits its 5 operands in the budget
    # (logical_bound in the loop upper-bounds the final packed+padded C)
    assert 4 * 5 * s4.meta.num_chunks <= ps.SMEM_PREFETCH_BUDGET
