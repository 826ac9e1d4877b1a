"""Pallas kernel parity vs the XLA reference forms (interpret mode on the
CPU test mesh; the same kernels compile on TPU — see bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.ops import contrastive as C
from recsys_tpu.ops import select_infonce, select_logq_loss, use_pallas
from recsys_tpu.ops.pallas_contrastive import (
    fused_bidirectional_infonce,
    fused_diag_ce,
    fused_inbatch_logq_loss,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    B, D = 200, 32  # deliberately not a TILE multiple
    u = rng.normal(size=(B, D)).astype(np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    it = rng.normal(size=(B, D)).astype(np.float32)
    it /= np.linalg.norm(it, axis=1, keepdims=True)
    return {
        "u": jnp.asarray(u), "i": jnp.asarray(it),
        "pos": jnp.asarray(rng.integers(1, 50, B)),
        "uid": jnp.asarray(rng.integers(0, 60, B)),
        "logq": jnp.asarray(rng.uniform(-8, -1, 60).astype(np.float32)),
        "valid": jnp.asarray((rng.random(B) > 0.1).astype(np.int32)),
    }


def test_fused_logq_forward_parity(problem):
    p = problem
    ref = C.inbatch_logq_loss(p["u"], p["i"], p["pos"], p["logq"],
                              temperature=0.1, user_ids=p["uid"], valid=p["valid"])
    got = fused_inbatch_logq_loss(p["u"], p["i"], p["pos"], p["logq"],
                                  temperature=0.1, user_ids=p["uid"],
                                  valid=p["valid"])
    assert float(got) == pytest.approx(float(ref), abs=1e-4)


def test_fused_logq_grad_parity(problem):
    p = problem
    f_ref = lambda q, k: C.inbatch_logq_loss(
        q, k, p["pos"], p["logq"], temperature=0.1, user_ids=p["uid"],
        valid=p["valid"])
    f_pal = lambda q, k: fused_inbatch_logq_loss(
        q, k, p["pos"], p["logq"], temperature=0.1, user_ids=p["uid"],
        valid=p["valid"])
    gr = jax.grad(f_ref, argnums=(0, 1))(p["u"], p["i"])
    gp = jax.grad(f_pal, argnums=(0, 1))(p["u"], p["i"])
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), atol=1e-5)


def test_fused_infonce_parity(problem):
    p = problem
    ref = C.bidirectional_infonce(p["u"], p["i"], 0.08)
    got = fused_bidirectional_infonce(p["u"], p["i"], 0.08)
    assert float(got) == pytest.approx(float(ref), abs=1e-4)
    gr = jax.grad(lambda a, b: C.bidirectional_infonce(a, b, 0.08),
                  argnums=(0, 1))(p["u"], p["i"])
    gp = jax.grad(lambda a, b: fused_bidirectional_infonce(a, b, 0.08),
                  argnums=(0, 1))(p["u"], p["i"])
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-5)


def test_fused_under_jit_and_vjp_composition(problem):
    """The kernel must survive jit + being one term of a bigger loss."""
    p = problem

    @jax.jit
    def composite(q, k):
        a = fused_inbatch_logq_loss(q, k, p["pos"], p["logq"], temperature=0.1)
        return a + 0.1 * jnp.sum(q**2)

    val, grads = jax.value_and_grad(composite)(p["u"], p["i"])
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grads)).all()


def test_kernel_dispatch():
    # CPU test mesh -> XLA forms by default; explicit pallas -> fused
    assert not use_pallas("auto")
    assert select_infonce("auto") is C.bidirectional_infonce
    assert select_infonce("pallas") is fused_bidirectional_infonce
    assert select_logq_loss("xla") is C.inbatch_logq_loss


def test_fused_fm_parity():
    from recsys_tpu.ops.fm import fm_interaction
    from recsys_tpu.ops.pallas_fm import fused_fm_interaction

    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.normal(size=(200, 12, 16)).astype(np.float32))
    ref = fm_interaction(v)
    got = fused_fm_interaction(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)
