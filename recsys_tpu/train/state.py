"""Train-state plumbing shared by all trainers.

Covers the reference's optimizer patterns the TPU way:
  * two-lr param groups (BERT vs rest, `item_tower.py:1012-1022`) via
    ``optax.multi_transform`` over path labels;
  * linear warmup -> linear decay schedule (`item_tower.py:1037-1043`);
  * grad clipping (clip 5.0, `v1_usertower_train.py:850`);
  * freeze -> unfreeze-with-scaled-lr phase switching
    (`v1_usertower_train.py:968-982`) expressed as a *static* multi-transform
    mask keyed on a phase flag — resume-safe because the optimizer tree
    shape never changes (SURVEY.md §7.3 calls this out).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)

    @classmethod
    def create(cls, params, tx):
        import jax.numpy as jnp
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)


def warmup_linear_schedule(base_lr: float, total_steps: int,
                           warmup_frac: float = 0.1) -> optax.Schedule:
    warmup = max(int(total_steps * warmup_frac), 1)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup),
         optax.linear_schedule(base_lr, 0.0, max(total_steps - warmup, 1))],
        [warmup])


def label_params(params, fn: Callable[[str], str]):
    """Label every leaf by its '/'-joined path through ``fn``."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    def _name(path):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
    labels = [fn(_name(path)) for path, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], labels)


def grouped_adamw(groups: dict[str, optax.GradientTransformation],
                  params, label_fn: Callable[[str], str],
                  grad_clip: float | None = None) -> optax.GradientTransformation:
    tx = optax.multi_transform(groups, label_params(params, label_fn))
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
