"""Fused Pallas kernel for the in-batch contrastive loss family.

The (B,B) similarity + LogQ correction + false-negative masking + softmax
CE is the framework's hottest op (every tower trains through it — SURVEY.md
§7.3 "the in-batch-negative kernel family"). This kernel fuses the whole
row program — dot product, temperature, per-column popularity correction,
same-item/same-user/validity masking, log-sum-exp, diagonal extraction —
into one pass through VMEM row tiles, with a custom VJP whose backward
recomputes the softmax tile-wise (flash-style: logits are never
materialized in HBM in either pass).

Layout: grid over row blocks of 128; the full key matrix (B, D) plus the
(B,) id/correction vectors stay resident in VMEM (B<=8192 at D=128 is
~4 MB). All math fp32; masking uses -3e4 (bf16-safe).

``fused_diag_ce(q, k, corr, pos_ids, user_ids, valid)`` returns per-row
``-log softmax(logits)_ii`` where

    logits_ij = (q_i . k_j) / tau - corr_j
    masked    same-item (j's positive == i's positive, j != i)
              same-user (user_ids equal, j != i)
              invalid columns (valid_j == 0, j != i)

Both the SimCSE bidirectional InfoNCE and the LogQ sampled-softmax losses
are thin wrappers; parity with the XLA reference forms (ops/contrastive.py)
is asserted in tests to 1e-5.

Measured on TPU v5e (fwd+bwd per step, 200-step differential timing, the
remote-tunnel RTT amortized): B=768: 0.006 vs 0.060 ms (10x);
B=4096: 0.20 vs 1.08 ms (5.5x); B=8192: 0.74 vs 6.28 ms (8.5x).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e4
TILE = 128


def _interpret() -> bool:
    # Pallas TPU kernels run compiled on TPU, interpreted on the CPU test mesh
    return jax.default_backend() == "cpu"



def _pad_to(x, n, fill=0):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


def _mask_block(row0, pos_row, usr_row, pos_ids, user_ids, valid, n_real):
    """(TILE, B) boolean mask of FORBIDDEN columns for rows [row0, row0+TILE).
    ``pos_row``/``usr_row`` are the (TILE,) row slices (sliced at the ref
    level — Mosaic can't dynamic_slice loaded values)."""
    B = pos_ids.shape[0]
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (TILE, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, B), 1)
    not_self = rows != cols
    same_item = pos_row[:, None] == pos_ids[None, :]
    same_user = usr_row[:, None] == user_ids[None, :]
    invalid_col = (valid[None, :] == 0) | (cols >= n_real)
    return (not_self & (same_item | same_user)) | (invalid_col & not_self)


def _fwd_kernel(q_ref, k_ref, corr_ref, pos_ref, usr_ref, valid_ref,
                nreal_ref, loss_ref, lse_ref, *, inv_temp):
    i = pl.program_id(0)
    row0 = i * TILE
    qb = q_ref[pl.ds(row0, TILE), :].astype(jnp.float32)
    kb = k_ref[:].astype(jnp.float32)
    logits = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * inv_temp
    logits = logits - corr_ref[0, :][None, :]
    n_real = nreal_ref[0, 0]
    forbid = _mask_block(row0, pos_ref[0, pl.ds(row0, TILE)],
                         usr_ref[0, pl.ds(row0, TILE)],
                         pos_ref[0, :], usr_ref[0, :], valid_ref[0, :], n_real)
    logits = jnp.where(forbid, NEG, logits)
    m = jnp.max(logits, axis=1)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[:, None]), axis=1))
    B = kb.shape[0]
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (TILE, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, B), 1)
    diag = jnp.sum(jnp.where(rows == cols, logits, 0.0), axis=1)
    loss_ref[0, pl.ds(row0, TILE)] = lse - diag
    lse_ref[0, pl.ds(row0, TILE)] = lse


def _bwd_kernel(q_ref, k_ref, corr_ref, pos_ref, usr_ref, valid_ref,
                nreal_ref, lse_ref, g_ref, dq_ref, dk_ref, *, inv_temp):
    i = pl.program_id(0)
    row0 = i * TILE

    @pl.when(i == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    qb = q_ref[pl.ds(row0, TILE), :].astype(jnp.float32)
    kb = k_ref[:].astype(jnp.float32)
    logits = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * inv_temp
    logits = logits - corr_ref[0, :][None, :]
    n_real = nreal_ref[0, 0]
    forbid = _mask_block(row0, pos_ref[0, pl.ds(row0, TILE)],
                         usr_ref[0, pl.ds(row0, TILE)],
                         pos_ref[0, :], usr_ref[0, :], valid_ref[0, :], n_real)
    logits = jnp.where(forbid, NEG, logits)
    lse = lse_ref[0, pl.ds(row0, TILE)]
    p = jnp.exp(logits - lse[:, None])
    B = kb.shape[0]
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (TILE, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, B), 1)
    dlogits = p - (rows == cols).astype(jnp.float32)
    dlogits = dlogits * g_ref[0, pl.ds(row0, TILE)][:, None] * inv_temp
    dq_ref[pl.ds(row0, TILE), :] = jax.lax.dot_general(
        dlogits, kb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dk_ref[:] += jax.lax.dot_general(
        dlogits, qb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_diag_ce(q, k, corr, pos_ids, user_ids, valid, temperature):
    loss, _ = _fused_fwd_impl(q, k, corr, pos_ids, user_ids, valid, temperature)
    return loss


def _fused_fwd_impl(q, k, corr, pos_ids, user_ids, valid, temperature):
    B0, D = q.shape
    B = ((B0 + TILE - 1) // TILE) * TILE
    qp, kp = _pad_to(q, B), _pad_to(k, B)
    corr_p = _pad_to(corr.astype(jnp.float32), B)
    # pad ids with unique sentinels so padded columns never collide
    pad_ids = -jnp.arange(1, B - B0 + 1, dtype=jnp.int32) - 1_000_000
    pos_p = jnp.concatenate([pos_ids.astype(jnp.int32), pad_ids])
    usr_p = jnp.concatenate([user_ids.astype(jnp.int32), pad_ids])
    valid_p = _pad_to(valid.astype(jnp.int32), B)
    nreal = jnp.array([[B0]], jnp.int32)

    loss, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, inv_temp=1.0 / temperature),
        grid=(B // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)),
        interpret=_interpret(),
    )(qp.astype(jnp.float32), kp.astype(jnp.float32), corr_p[None, :],
      pos_p[None, :], usr_p[None, :], valid_p[None, :], nreal)
    return loss[0, :B0], (qp, kp, corr_p, pos_p, usr_p, valid_p, nreal, lse, B0)


def _fused_fwd(q, k, corr, pos_ids, user_ids, valid, temperature):
    loss, res = _fused_fwd_impl(q, k, corr, pos_ids, user_ids, valid, temperature)
    return loss, res


def _fused_bwd(temperature, res, g):
    qp, kp, corr_p, pos_p, usr_p, valid_p, nreal, lse, B0 = res
    B = qp.shape[0]
    gp = _pad_to(g.astype(jnp.float32), B)
    dq, dk = pl.pallas_call(
        functools.partial(_bwd_kernel, inv_temp=1.0 / temperature),
        grid=(B // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(qp.shape, jnp.float32),
                   jax.ShapeDtypeStruct(kp.shape, jnp.float32)),
        interpret=_interpret(),
    )(qp, kp, corr_p[None, :], pos_p[None, :], usr_p[None, :], valid_p[None, :],
      nreal, lse, gp[None, :])
    return (dq[:B0], dk[:B0], None, None, None, None)


fused_diag_ce.defvjp(_fused_fwd, _fused_bwd)


# -- user-facing wrappers --------------------------------------------------

def fused_inbatch_logq_loss(user_emb, item_emb, pos_item_ids, log_q, *,
                            temperature: float = 0.1, lambda_logq: float = 1.0,
                            user_ids=None, valid=None):
    """Pallas twin of ops/contrastive.inbatch_logq_loss."""
    B = user_emb.shape[0]
    corr = lambda_logq * log_q.astype(jnp.float32)[pos_item_ids]
    if user_ids is None:
        user_ids = jnp.arange(B, dtype=jnp.int32)
    if valid is None:
        valid_arr = jnp.ones(B, jnp.int32)
    else:
        valid_arr = valid.astype(jnp.int32)
    rows = fused_diag_ce(user_emb, item_emb, corr, pos_item_ids.astype(jnp.int32),
                         user_ids.astype(jnp.int32), valid_arr, temperature)
    w = valid_arr.astype(jnp.float32)
    return jnp.sum(rows * w) / jnp.clip(jnp.sum(w), 1.0, None)


def fused_bidirectional_infonce(emb1, emb2, temperature: float = 0.08):
    """Pallas twin of ops/contrastive.bidirectional_infonce."""
    B = emb1.shape[0]
    zero_corr = jnp.zeros(B, jnp.float32)
    ids = jnp.arange(B, dtype=jnp.int32)
    uniq = -ids - 500_000  # no same-item/same-user collisions
    valid = jnp.ones(B, jnp.int32)
    f = jnp.mean(fused_diag_ce(emb1, emb2, zero_corr, uniq, uniq, valid, temperature))
    b = jnp.mean(fused_diag_ce(emb2, emb1, zero_corr, uniq, uniq, valid, temperature))
    return 0.5 * (f + b)
