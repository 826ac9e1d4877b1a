"""Fused Pallas FM second-order interaction kernel.

The DeepFM reranker's hot op (BASELINE north star names it as a Pallas
target): for field embeddings v (B, F, K),

    out_b = 0.5 * sum_k ((sum_f v_bfk)^2 - sum_f v_bfk^2)

Fuses the two reductions and the elementwise square into one VMEM pass per
row tile — the XLA form materializes the (B, K) intermediates in HBM.
At reranker scales the XLA form is already fast; this twin exists for the
large-candidate serving path (B ~ 10^5 candidates per request) and as the
pattern for fusing FM into the scoring matmul. Parity with ops/fm.py is
asserted in tests.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _fm_kernel(v_ref, out_ref):
    v = v_ref[:].astype(jnp.float32)              # (TILE_B, F, K)
    s = jnp.sum(v, axis=1)                        # (TILE_B, K)
    sq = jnp.sum(v * v, axis=1)
    out_ref[:] = 0.5 * jnp.sum(s * s - sq, axis=-1, keepdims=True)


def fused_fm_interaction(v: jnp.ndarray) -> jnp.ndarray:
    """(B, F, K) -> (B,) FM second-order term (Pallas twin of
    ops/fm.fm_interaction)."""
    B0, F, K = v.shape
    B = ((B0 + TILE_B - 1) // TILE_B) * TILE_B
    if B != B0:
        v = jnp.pad(v, ((0, B - B0), (0, 0), (0, 0)))
    out = pl.pallas_call(
        _fm_kernel,
        grid=(B // TILE_B,),
        in_specs=[pl.BlockSpec((TILE_B, F, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_B, 1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=_interpret(),
    )(v)
    return out[:B0, 0]
