"""Block-sparse SpMM on the MXU — the graph-propagation kernel.

XLA's scatter-add makes ``segment_sum`` propagation latency-bound on TPU
(~520 ms per pass over a 22.6M-edge graph; scatter ~385 ms of it). This
kernel reformulates A_norm @ x as a sweep of MXU matmuls over node blocks:

  * edges are sorted by (dst_block, src_block) and cut into fixed chunks of
    ``chunk_e`` edges that never cross a block pair (boundary runs padded
    with zero-weight dummy edges);
  * per chunk, the kernel builds one-hot matrices from the local src/dst
    ids via iota-compare (never materialized in HBM) and computes
      msgs     = OneHot(src_local) @ x_slab          (MXU)
      out_slab += OneHot(dst_local)^T @ (w * msgs)   (MXU)
    with the x slab auto-DMA'd per chunk via a scalar-prefetch index map
    and the out slab accumulated in VMEM across the consecutive chunks of
    one dst block (pallas revisiting);
  * both gather AND scatter become dense matmuls: cost is FLOPs on the
    MXU, not random HBM access.

For the symmetric normalized adjacency LightGCL uses (A^T = A: both edge
directions present with equal weights) the backward pass is the SAME
kernel, wired as a custom VJP.

The chunk arrays are jit ARGUMENTS (a ``device_arrays()`` pytree), never
closure constants — embedding tens of MB of literals in the jaxpr breaks
compilation (and the remote-compile transport).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# TPU SMEM budget for scalar-prefetch chunk arrays (observed hard limit
# ~1 MB/operand; keep headroom for the grid index maps)
SMEM_PREFETCH_BUDGET = 800_000


@dataclass(frozen=True)
class SpmmMeta:
    """Static (hashable) kernel geometry."""

    num_nodes: int            # padded to a block_n multiple
    orig_nodes: int
    block_n: int
    chunk_e: int
    num_chunks: int
    pack: int = 1             # 1 = plain; 2 = two half-blocks share the lanes
    wide: bool = True         # one (chunk_e, .) matmul pair per chunk vs
                              # chunk_e/128 small pairs (MXU utilization)
    split: int = 1            # logical sub-runs per chunk: each physical
                              # chunk holds `split` runs with independent
                              # src blocks but ONE dst block, so small
                              # block_n keeps low padding (see block_graph)
    mxu_parts: int = 1        # wide-kernel matmul granularity: >1 chops the
                              # per-chunk gather/scatter matmuls into that
                              # many independent sub-matmul chains so Mosaic
                              # can overlap one-hot VPU builds with MXU work
                              # (identical FLOPs; pack=2 split=1 path only)


class BlockedGraph:
    """Chunked block-pair edge layout for the SpMM kernel (symmetric A)."""

    def __init__(self, meta: SpmmMeta, src_block, dst_block, src_local,
                 dst_local, weight):
        self.meta = meta
        self.src_block = src_block    # (C,) int32
        self.dst_block = dst_block    # (C,) int32
        self.src_local = src_local    # (C, chunk_e) int32
        self.dst_local = dst_local    # (C, chunk_e) int32
        self.weight = weight          # (C, chunk_e) float32, 0 on padding

    def device_arrays(self) -> dict:
        # scalar-prefetch arrays MUST stay 1-D: a (C, split) i32 in SMEM is
        # lane-padded to (C, 128) — 22 MB at C=44k vs the 1 MB SMEM budget —
        # so each split slot ships as its own contiguous (C,) array
        out = {"db": jnp.asarray(self.dst_block),
               "sl": jnp.asarray(self.src_local),
               "dl": jnp.asarray(self.dst_local),
               "w": jnp.asarray(self.weight)}
        sb = self.src_block
        if sb.ndim == 1:
            out["sb"] = jnp.asarray(sb)
        else:
            for j in range(sb.shape[1]):
                out[f"sb{j}"] = jnp.asarray(np.ascontiguousarray(sb[:, j]))
        return out


def block_graph(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
                num_nodes: int, block_n: int = 1024,
                chunk_e: int = 1024, pack: int = 1,
                wide: bool = True, split: int = 1,
                mxu_parts: int = 1) -> BlockedGraph:
    assert chunk_e % 128 == 0 and chunk_e // 128 >= 8, \
        "chunk_e must be a multiple of 128 with >=8 sublanes (TPU tiling)"
    assert split in (1, 2, 4, 8) and chunk_e % (128 * split) == 0
    """Vectorized host-side chunking. ``weight==0`` edges (upstream
    fixed-shape padding) are dropped first.

    ``split`` > 1 packs that many LOGICAL runs (length chunk_e/split, each
    with its own src block) into one physical chunk sharing a dst block.
    Small blocks fragment runs (at block_n=512 ~64% of chunks hold <256
    edges on the 22.6M-edge bench graph); same-dst packing keeps block_n
    small — half the per-edge one-hot FLOPs of 1024 — at ~1.36x padding
    instead of 3.5x."""
    keep = weight > 0
    src = src[keep].astype(np.int64)
    dst = dst[keep].astype(np.int64)
    weight = weight[keep].astype(np.float32)
    q = chunk_e // split                 # logical run length

    # The chunk arrays ride TPU SMEM as scalar-prefetch operands. The hard
    # limit is the TOTAL SMEM space (~1 MB = 1,048,576 B on v5e; observed
    # AOT failure at the H&M shape: a single 1,114,112 B "prefetched SMEM
    # operand 0" vs a 1,048,576 B space). SMEM_PREFETCH_BUDGET = 800k
    # models that 1 MB space with headroom for the kernel's own scalars.
    # The kernel prefetches split+1 int32 arrays of ~C entries each (db +
    # one sb column per slot), so the bound is 4*(split+1)*C against the
    # whole budget. Chunk count C is floored by the number of non-empty
    # (dst_block, src_block) pairs — block_n=1024 gives ~278k chunks at
    # 1.47M nodes / ~57M symmetric edges; larger blocks quadratically
    # shrink the pair count, so auto-double block_n until the bound fits.
    smem_budget = SMEM_PREFETCH_BUDGET
    n_operands = split + 1                 # chunk_db + sb column per slot
    while True:
        n_pad = ((num_nodes + block_n - 1) // block_n) * block_n
        n_blocks = n_pad // block_n
        sb = src // block_n
        db = dst // block_n
        _, counts = np.unique(db * n_blocks + sb, return_counts=True)
        logical_bound = int(np.sum(-(-counts // q))) + n_blocks
        # each operand flattens to <= logical_bound entries (C <= logical)
        if 4 * n_operands * logical_bound <= smem_budget or block_n >= n_pad:
            break
        if block_n >= 16384:  # VMEM x-slab bound; beyond this the kernel
            raise ValueError(  # can't fit — use gnn.propagation=segment_sum
                f"block-SpMM chunk arrays exceed the SMEM budget even at "
                f"block_n={block_n} ({logical_bound} chunks); set "
                f"gnn.propagation=segment_sum for this graph")
        block_n *= 2
    order = np.lexsort((sb, db))
    src, dst, weight, sb, db = (a[order] for a in (src, dst, weight, sb, db))

    key = db * n_blocks + sb
    new_run = np.empty(len(key), bool)
    new_run[0] = True
    np.not_equal(key[1:], key[:-1], out=new_run[1:])
    run_id = np.cumsum(new_run) - 1
    run_starts = np.flatnonzero(new_run)
    run_lens = np.diff(np.append(run_starts, len(key)))

    # logical chunks of q edges per run (runs stay db-sorted)
    run_chunks = (run_lens + q - 1) // q
    lbase = np.concatenate([[0], np.cumsum(run_chunks)])
    L = int(lbase[-1])
    run_of_logical = np.repeat(np.arange(len(run_lens)), run_chunks)
    ldb = db[run_starts][run_of_logical]
    lsb = sb[run_starts][run_of_logical]

    # pack `split` same-db logical chunks into one physical chunk
    grp_new = np.empty(L, bool)
    grp_new[0] = True
    np.not_equal(ldb[1:], ldb[:-1], out=grp_new[1:])
    grp_id = np.cumsum(grp_new) - 1
    grp_starts = np.flatnonzero(grp_new)
    grp_lens = np.diff(np.append(grp_starts, L))
    phys_per_grp = (grp_lens + split - 1) // split
    pbase = np.concatenate([[0], np.cumsum(phys_per_grp)])
    within = np.arange(L) - grp_starts[grp_id]
    phys_of_logical = pbase[grp_id] + within // split
    slot_of_logical = within % split
    C = int(pbase[-1])

    off = np.arange(len(key)) - run_starts[run_id]
    logical_of_edge = lbase[run_id] + off // q
    flat = (phys_of_logical[logical_of_edge] * chunk_e
            + slot_of_logical[logical_of_edge] * q + off % q)

    src_local = np.zeros((C, chunk_e), np.int32)
    dst_local = np.zeros((C, chunk_e), np.int32)
    w = np.zeros((C, chunk_e), np.float32)
    src_local.reshape(-1)[flat] = (src % block_n).astype(np.int32)
    dst_local.reshape(-1)[flat] = (dst % block_n).astype(np.int32)
    w.reshape(-1)[flat] = weight
    sub = chunk_e // 128
    src_local = src_local.reshape(C, sub, 128)
    dst_local = dst_local.reshape(C, sub, 128)
    w = w.reshape(C, sub, 128)

    chunk_sb = np.zeros((C, split), np.int32)
    chunk_sb[phys_of_logical, slot_of_logical] = lsb.astype(np.int32)
    chunk_db = np.zeros(C, np.int32)
    chunk_db[phys_of_logical] = ldb.astype(np.int32)

    # every dst block needs >=1 chunk or its out slab is never initialized
    missing = np.setdiff1d(np.arange(n_blocks), chunk_db)
    if len(missing):
        pad = len(missing)
        chunk_sb = np.concatenate([chunk_sb, np.zeros((pad, split), np.int32)])
        chunk_db = np.concatenate([chunk_db, missing.astype(np.int32)])
        src_local = np.concatenate([src_local, np.zeros((pad, sub, 128), np.int32)])
        dst_local = np.concatenate([dst_local, np.zeros((pad, sub, 128), np.int32)])
        w = np.concatenate([w, np.zeros((pad, sub, 128), np.float32)])
        order2 = np.argsort(chunk_db, kind="stable")
        chunk_sb, chunk_db = chunk_sb[order2], chunk_db[order2]
        src_local, dst_local, w = src_local[order2], dst_local[order2], w[order2]
        C += pad

    assert pack in (1, 2)
    if split > 1:
        assert pack == 2 and wide, "split chunks: packed wide kernel only"
    if mxu_parts > 1:
        assert pack == 2 and wide and split == 1 and \
            (chunk_e // 128) % mxu_parts == 0, \
            "mxu_parts: packed wide split-1 kernel only"
    meta = SpmmMeta(n_pad, num_nodes, block_n, chunk_e, C, pack, wide, split,
                    mxu_parts)
    if split == 1:
        chunk_sb = chunk_sb[:, 0]
    return BlockedGraph(meta, chunk_sb, chunk_db, src_local, dst_local, w)


def _spmm_kernel(sb_ref, db_ref, x_ref, sl_ref, dl_ref, w_ref, out_ref,
                 *, block_n, chunk_e, acc_dtype, wide):
    c = pl.program_id(0)
    prev_db = db_ref[jnp.maximum(c - 1, 0)]
    is_new = (c == 0) | (prev_db != db_ref[c])

    @pl.when(is_new)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # chunk data arrives as (1, chunk_e/128, 128); one-hot rows are built
    # per 128-edge sub-chunk (TPU tiling forbids a (1, chunk_e) layout)
    xb = x_ref[:].astype(acc_dtype)                            # (Bn, D)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (128, block_n), 1)
    rows_bn = jax.lax.broadcasted_iota(jnp.int32, (block_n, 128), 0)
    if wide:
        # Concatenate the sub-chunk one-hots and run ONE (chunk_e, Bn) @
        # (Bn, D) gather and ONE (Bn, chunk_e) @ (chunk_e, D) scatter per
        # chunk: identical FLOPs to the loop below, far better MXU
        # utilization. The edge weight folds into the gather one-hot
        # exactly (each row has a single nonzero).
        oh_parts, ohT_parts = [], []
        for j in range(chunk_e // 128):
            sl = sl_ref[0, j, :]                               # (128,)
            dl = dl_ref[0, j, :]
            # minor-dim insertion must happen on the 32-bit value — Mosaic
            # can't reshape (128,) bf16 -> (128, 1)
            w = w_ref[0, j, :][:, None].astype(acc_dtype)      # (128, 1)
            oh_parts.append((sl[:, None] == lanes).astype(acc_dtype) * w)
            ohT_parts.append((dl[None, :] == rows_bn).astype(acc_dtype))
        oh_s = jnp.concatenate(oh_parts, axis=0)               # (Ec, Bn)
        msgs = jax.lax.dot_general(
            oh_s, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Ec, D)
        oh_dT = jnp.concatenate(ohT_parts, axis=1)             # (Bn, Ec)
        out_ref[:] += jax.lax.dot_general(
            oh_dT, msgs.astype(acc_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Bn, D)
        return
    acc = jnp.zeros_like(out_ref)
    for j in range(chunk_e // 128):
        sl = sl_ref[0, j, :]                                   # (128,)
        dl = dl_ref[0, j, :]
        w = w_ref[0, j, :]
        onehot_s = (sl[:, None] == lanes).astype(acc_dtype)    # (128, Bn)
        msgs = jax.lax.dot_general(
            onehot_s, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (128, D)
        msgs = msgs * w[:, None]
        # scatter one-hot built pre-transposed so the second matmul
        # contracts over the lhs LAST dim (MXU-native orientation)
        onehot_dT = (dl[None, :] == rows_bn).astype(acc_dtype)  # (Bn, 128)
        acc = acc + jax.lax.dot_general(
            onehot_dT, msgs.astype(acc_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Bn, D)
    out_ref[:] += acc


def _spmm_kernel_packed(db_ref, *refs,
                        block_n, chunk_e, feat, acc_dtype, interpret, wide,
                        split=1, mxu_parts=1):
    """pack=2 variant: a block of ``block_n`` nodes is stored as
    (block_n/2, 2*feat) — two half-blocks side by side in the 128 lanes.

    With feat=64 (the LightGCL dim) this fills all 128 MXU lanes AND halves
    the one-hot contraction length, so the same node reach costs half the
    per-edge FLOPs of the plain kernel.  Cross-half edges are fixed up with
    a circular lane roll (the wrong half is zero, so roll == swap).

    ``split`` > 1: the chunk holds that many logical runs, each gathered
    from its own src slab; one fused scatter matmul lands them all on the
    shared dst block. Scalar-prefetch refs arrive first (db, then the
    per-slot src-block arrays — consumed by the index maps, unused here).
    """
    x_refs = refs[split:2 * split]
    sl_ref, dl_ref, w_ref, out_ref = refs[2 * split:]
    c = pl.program_id(0)
    prev_db = db_ref[jnp.maximum(c - 1, 0)]
    is_new = (c == 0) | (prev_db != db_ref[c])

    @pl.when(is_new)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    Br = block_n // 2
    roll = jnp.roll if interpret else pltpu.roll
    lanes_b = jax.lax.broadcasted_iota(jnp.int32, (128, Br), 1)
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (Br, 128), 0)
    lane_hi = (jax.lax.broadcasted_iota(jnp.int32, (1, 2 * feat), 1)
               >= feat).astype(jnp.int32)
    if wide and split == 1:
        # The whole split=1 wide path: mxu_parts independent
        # gather->fixup->scatter chains per chunk (mxu_parts=1 == the
        # single-matmul form). Same FLOPs at any parts count, but with
        # parts>1 the one-hot VPU builds of chain k+1 have no dependency
        # on chain k's MXU matmuls, so the scheduler overlaps VPU and MXU
        # work (~15% per-pass at bench scale; see GNNConfig.spmm_mxu_parts).
        # The split>1 variant below keeps its own per-slot-slab form.
        xb = x_refs[0][:].astype(acc_dtype)                    # (Br, 2F)
        q_sub = chunk_e // 128
        g_sub = q_sub // mxu_parts
        acc = jnp.zeros_like(out_ref)
        for gpart in range(mxu_parts):
            oh_parts, ohT_parts, keep_parts, swap_parts = [], [], [], []
            for t in range(g_sub):
                j = gpart * g_sub + t
                sl = sl_ref[0, j, :]
                dl = dl_ref[0, j, :]
                w = w_ref[0, j, :][:, None].astype(acc_dtype)
                s_hi = (sl >= Br).astype(jnp.int32)
                d_hi = (dl >= Br).astype(jnp.int32)
                s_row = sl - s_hi * Br
                d_row = dl - d_hi * Br
                oh_parts.append((s_row[:, None] == lanes_b).astype(acc_dtype)
                                * w)
                ohT_parts.append((d_row[None, :] == rows_b).astype(acc_dtype))
                keep_parts.append(lane_hi == s_hi[:, None])
                swap_parts.append(jnp.broadcast_to(
                    (s_hi ^ d_hi)[:, None], (128, 2 * feat)) == 1)
            oh_s = jnp.concatenate(oh_parts, axis=0)           # (Ec/g, Br)
            msgs = jax.lax.dot_general(
                oh_s, xb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (Ec/g, 2F)
            msgs = jnp.where(jnp.concatenate(keep_parts, axis=0), msgs, 0.0)
            swapped = roll(msgs, feat, axis=1)
            msgs = jnp.where(jnp.concatenate(swap_parts, axis=0), swapped, msgs)
            oh_dT = jnp.concatenate(ohT_parts, axis=1)         # (Br, Ec/g)
            acc = acc + jax.lax.dot_general(
                oh_dT, msgs.astype(acc_dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (Br, 2F)
        out_ref[:] += acc
        return
    if wide:
        # Big-matmul fusion: per logical slot, one (q, Br) gather matmul
        # against that slot's src slab; the half-select (keep) and
        # cross-half fixup (roll) stay elementwise on the concatenated
        # (Ec, 2F) message block; ONE (Br, Ec) scatter matmul at the end.
        q_sub = chunk_e // 128 // split
        msg_parts, ohT_parts, keep_parts, swap_parts = [], [], [], []
        for s in range(split):
            xb = x_refs[s][:].astype(acc_dtype)                # (Br, 2F)
            oh_parts = []
            for t in range(q_sub):
                j = s * q_sub + t
                sl = sl_ref[0, j, :]                           # (128,)
                dl = dl_ref[0, j, :]
                # minor-dim insertion on the 32-bit value (Mosaic can't
                # reshape (128,) bf16 -> (128, 1)); cast the 2-D result
                w = w_ref[0, j, :][:, None].astype(acc_dtype)  # (128, 1)
                s_hi = (sl >= Br).astype(jnp.int32)
                d_hi = (dl >= Br).astype(jnp.int32)
                s_row = sl - s_hi * Br
                d_row = dl - d_hi * Br
                oh_parts.append((s_row[:, None] == lanes_b).astype(acc_dtype)
                                * w)
                ohT_parts.append((d_row[None, :] == rows_b).astype(acc_dtype))
                keep_parts.append(lane_hi == s_hi[:, None])    # (128, 2F)
                # insert the minor dim on i32, compare in 2-D (i1 reshape
                # is unsupported by Mosaic)
                swap_parts.append(jnp.broadcast_to(
                    (s_hi ^ d_hi)[:, None], (128, 2 * feat)) == 1)
            oh_s = jnp.concatenate(oh_parts, axis=0)           # (q, Br)
            msg_parts.append(jax.lax.dot_general(
                oh_s, xb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))           # (q, 2F)
        msgs = (msg_parts[0] if split == 1
                else jnp.concatenate(msg_parts, axis=0))       # (Ec, 2F)
        msgs = jnp.where(jnp.concatenate(keep_parts, axis=0), msgs, 0.0)
        swapped = roll(msgs, feat, axis=1)
        msgs = jnp.where(jnp.concatenate(swap_parts, axis=0), swapped, msgs)
        oh_dT = jnp.concatenate(ohT_parts, axis=1)             # (Br, Ec)
        out_ref[:] += jax.lax.dot_general(
            oh_dT, msgs.astype(acc_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Br, 2F)
        return
    assert split == 1
    xb = x_refs[0][:].astype(acc_dtype)                        # (Br, 2F)
    acc = jnp.zeros_like(out_ref)
    for j in range(chunk_e // 128):
        sl = sl_ref[0, j, :]                                   # (128,)
        dl = dl_ref[0, j, :]
        w = w_ref[0, j, :]
        # Mosaic can't insert a minor dim on i1 vectors — keep the half
        # flags as i32 and do the comparisons in 2-D
        s_hi = (sl >= Br).astype(jnp.int32)
        d_hi = (dl >= Br).astype(jnp.int32)
        s_row = sl - s_hi * Br
        d_row = dl - d_hi * Br
        onehot_s = (s_row[:, None] == lanes_b).astype(acc_dtype)  # (128, Br)
        msgs = jax.lax.dot_general(
            onehot_s, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (128, 2F)
        keep = lane_hi == s_hi[:, None]
        msgs = jnp.where(keep, msgs, 0.0) * w[:, None]
        swapped = roll(msgs, feat, axis=1)
        msgs = jnp.where((s_hi ^ d_hi)[:, None] == 1, swapped, msgs)
        onehot_dT = (d_row[None, :] == rows_b).astype(acc_dtype)  # (Br, 128)
        acc = acc + jax.lax.dot_general(
            onehot_dT, msgs.astype(acc_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Br, 2F)
    out_ref[:] += acc


def _pack2(x_pad: jnp.ndarray, block_n: int) -> jnp.ndarray:
    n, D = x_pad.shape
    nb, Br = n // block_n, block_n // 2
    return (x_pad.reshape(nb, 2, Br, D).transpose(0, 2, 1, 3)
            .reshape(nb * Br, 2 * D))


def _unpack2(y: jnp.ndarray, block_n: int) -> jnp.ndarray:
    nBr, D2 = y.shape
    Br, D = block_n // 2, D2 // 2
    nb = nBr // Br
    return (y.reshape(nb, Br, 2, D).transpose(0, 2, 1, 3)
            .reshape(nb * block_n, D))


def _spmm_call(meta: SpmmMeta, arrays: dict, x: jnp.ndarray,
               precision: str) -> jnp.ndarray:
    Bn, Ec, C, n = meta.block_n, meta.chunk_e, meta.num_chunks, meta.num_nodes
    D = x.shape[1]
    x_pad = x if x.shape[0] == n else jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))
    acc_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    sub = Ec // 128

    # ship x in the accumulate dtype: halves the per-chunk slab DMA in bf16
    # mode (the kernel casts to acc_dtype anyway)
    x_dtype = acc_dtype

    if meta.pack == 2:
        assert D <= 64, "pack=2 needs feat <= 64 (two halves share 128 lanes)"
        Br = Bn // 2
        S = meta.split
        xp = _pack2(x_pad.astype(x_dtype), Bn)                 # (n/2, 2D)

        # scalar-prefetch operands: db, then one 1-D src-block array per slot
        sb_arrays = ([arrays["sb"]] if S == 1
                     else [arrays[f"sb{j}"] for j in range(S)])

        def _x_spec(j):
            # scalars arrive positionally: (c, db, sb0, ..., sb{S-1})
            return pl.BlockSpec((Br, 2 * D),
                                lambda c, db, *sbs, j=j: (sbs[j][c], 0))

        def _chunk_spec():
            return pl.BlockSpec((1, sub, 128), lambda c, db, *sbs: (c, 0, 0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1 + S,
            grid=(C,),
            in_specs=[_x_spec(j) for j in range(S)] + [
                _chunk_spec(), _chunk_spec(), _chunk_spec(),
            ],
            out_specs=pl.BlockSpec((Br, 2 * D),
                                   lambda c, db, *sbs: (db[c], 0)),
        )
        out = pl.pallas_call(
            functools.partial(_spmm_kernel_packed, block_n=Bn, chunk_e=Ec,
                              feat=D, acc_dtype=acc_dtype,
                              interpret=_interpret(), wide=meta.wide,
                              split=S, mxu_parts=meta.mxu_parts),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n // 2, 2 * D), jnp.float32),
            interpret=_interpret(),
        )(arrays["db"], *sb_arrays, *([xp] * S),
          arrays["sl"], arrays["dl"], arrays["w"])
        return _unpack2(out, Bn)[: x.shape[0]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((Bn, D), lambda c, sb, db: (sb[c], 0)),
            pl.BlockSpec((1, sub, 128), lambda c, sb, db: (c, 0, 0)),
            pl.BlockSpec((1, sub, 128), lambda c, sb, db: (c, 0, 0)),
            pl.BlockSpec((1, sub, 128), lambda c, sb, db: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Bn, D), lambda c, sb, db: (db[c], 0)),
    )
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, block_n=Bn, chunk_e=Ec,
                          acc_dtype=acc_dtype, wide=meta.wide),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, D), jnp.float32),
        interpret=_interpret(),
    )(arrays["sb"], arrays["db"], x_pad.astype(x_dtype),
      arrays["sl"], arrays["dl"], arrays["w"])
    return out[: x.shape[0]]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def spmm(meta: SpmmMeta, arrays: dict, x: jnp.ndarray,
         precision: str = "bf16") -> jnp.ndarray:
    """A_norm @ x over the blocked symmetric graph.

    ``arrays`` = ``BlockedGraph.device_arrays()`` (pass the SAME dict object
    across calls so jit caches); ``precision``: 'bf16' (MXU-fast) or 'f32'
    (exact, for parity tests)."""
    return _spmm_call(meta, arrays, x, precision)


def _zero_cotangent(a):
    if jnp.issubdtype(a.dtype, jnp.floating):
        return jnp.zeros_like(a)
    return np.zeros(a.shape, jax.dtypes.float0)


def _spmm_fwd(meta, arrays, x, precision):
    return _spmm_call(meta, arrays, x, precision), arrays


def _spmm_bwd(meta, precision, arrays, g):
    # symmetric adjacency: d/dx (A x) applied to g is A^T g = A g
    dx = _spmm_call(meta, arrays, g, precision)
    return ({k: _zero_cotangent(v) for k, v in arrays.items()}, dx)


spmm.defvjp(_spmm_fwd, _spmm_bwd)
