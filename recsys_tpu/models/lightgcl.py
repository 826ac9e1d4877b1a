"""LightGCL: SVD-augmented graph contrastive learning + magnitude->cosine
distillation projector.

TPU redesign of `gnn_model/v1_lightgcl.py` and
`gnn_model/distill_mag_to_cos_l2.py`:

  * user/item embeddings (dim 64, xavier init);
  * LOCAL view — n-layer COO segment-sum propagation, layer-mean;
  * GLOBAL view — propagation through the rank-q SVD reconstruction,
    layer-mean;
  * BPR pairwise loss on the local view; robust InfoNCE SSL between local
    and global views of the batch's unique users/items (logits clamped to
    +-100, `v1_lightgcl.py:197-213`); L2 regularization on batch embeddings.

``MagnitudeEncoder``: MLP 64 -> 128 -> 64 + L2 norm + learnable CLIP-style
logit scale, distilling the teacher's DOT-product scores (which carry
popularity via embedding magnitude) into pure cosine geometry so
cosine-only ANN engines preserve popularity ranking
(`distill_mag_to_cos_l2.py:6-108`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from recsys_tpu.config import GNNConfig
from recsys_tpu.models.layers import l2_normalize
from recsys_tpu.ops.graph import propagate, svd_propagate


class LightGCL(nn.Module):
    """``prop_fn(prop_args, x) -> A_norm @ x`` is the pluggable propagation
    backend: gather+segment_sum (ops/graph.propagate) or the block-SpMM
    Pallas kernel (ops/pallas_spmm.spmm) — selected in train/gnn.py."""

    num_users: int
    num_items: int
    cfg: GNNConfig = GNNConfig()
    prop_fn: object = None  # static Callable[[Any, Array], Array]

    def setup(self):
        d = self.cfg.emb_dim
        init = nn.initializers.xavier_uniform()
        self.user_emb = self.param("user_emb", init, (self.num_users, d))
        self.item_emb = self.param("item_emb", init, (self.num_items, d))

    def __call__(self, prop_args, svd_u, svd_s, svd_v):
        """Full-graph forward -> (local_u, local_i, global_u, global_i)."""
        n = self.num_users + self.num_items
        prop = self.prop_fn or (
            lambda args, x: propagate(x, args[0], args[1], args[2], n))
        x0 = jnp.concatenate([self.user_emb, self.item_emb]).astype(jnp.float32)
        local_sum, global_sum = x0, x0
        x_loc, x_glb = x0, x0
        for _ in range(self.cfg.num_layers):
            x_loc = prop(prop_args, x_loc)
            x_glb = svd_propagate(x_glb, svd_u, svd_s, svd_v)
            local_sum = local_sum + x_loc
            global_sum = global_sum + x_glb
        denom = self.cfg.num_layers + 1
        local = local_sum / denom
        glob = global_sum / denom
        return (local[: self.num_users], local[self.num_users:],
                glob[: self.num_users], glob[self.num_users:])


def bpr_loss(local_u, local_i, users, pos, neg) -> jnp.ndarray:
    u = jnp.take(local_u, users, axis=0)
    p = jnp.take(local_i, pos, axis=0)
    ng = jnp.take(local_i, neg, axis=0)
    diff = jnp.sum(u * p, -1) - jnp.sum(u * ng, -1)
    return -jnp.mean(jax.nn.log_sigmoid(diff))


def ssl_loss(local, glob, ids, temperature: float, clamp: float = 100.0) -> jnp.ndarray:
    """InfoNCE aligning local vs global views of the SAME nodes against the
    other batch nodes. Duplicate batch ids are down-weighted to mimic the
    reference's unique-node handling without dynamic shapes."""
    a = l2_normalize(jnp.take(local, ids, axis=0))
    b = l2_normalize(jnp.take(glob, ids, axis=0))
    logits = jnp.clip(a @ b.T / temperature, -clamp, clamp)
    same = ids[None, :] == ids[:, None]
    eye = jnp.eye(ids.shape[0], dtype=bool)
    logits = jnp.where(same & ~eye, -3e4, logits)  # duplicate nodes aren't negatives
    logp = jnp.diagonal(jax.nn.log_softmax(logits, -1))
    # weight 1/multiplicity so each unique node counts once
    mult = jnp.sum(same, axis=-1).astype(jnp.float32)
    return -jnp.sum(logp / mult) / jnp.clip(jnp.sum(1.0 / mult), 1.0, None)


def reg_loss(params, users, pos, neg) -> jnp.ndarray:
    u = jnp.take(params["user_emb"], users, axis=0)
    p = jnp.take(params["item_emb"], pos, axis=0)
    ng = jnp.take(params["item_emb"], neg, axis=0)
    return 0.5 * (jnp.sum(u**2) + jnp.sum(p**2) + jnp.sum(ng**2)) / users.shape[0]


class MagnitudeEncoder(nn.Module):
    """Student projector folding dot-product magnitude into cosine angles."""

    in_dim: int = 64
    hidden: int = 128
    out_dim: int = 64

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden)(x.astype(jnp.float32))
        h = nn.gelu(h)
        h = nn.Dense(self.out_dim)(h)
        scale = self.param("logit_scale", nn.initializers.constant(jnp.log(10.0)), ())
        return l2_normalize(h), scale


def distill_loss(student_u, student_i, scale, teacher_u, teacher_i) -> jnp.ndarray:
    """MSE between teacher dot scores and student cos * exp(scale)."""
    t = teacher_u @ teacher_i.T
    s = (student_u @ student_i.T) * jnp.exp(scale)
    return jnp.mean((t - s) ** 2)
