"""Metric logging + contrastive-health metrics.

Replaces the reference's wandb + emoji-print observability (SURVEY.md §5):
a structured JSONL metric writer every trainer shares, plus the SimCSE
alignment/uniformity health metrics (reference `item_tower.py:607-629`) and
gate-weight introspection (reference `v1_usertower_train.py:526-533`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping

import jax.numpy as jnp


class MetricWriter:
    """Append-only JSONL metric log: one record per call, tagged with a run
    name and wall-clock. Cheap enough to call every step."""

    def __init__(self, path: str, run: str, config: Mapping[str, Any] | None = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.run = run
        self._f = open(path, "a", buffering=1)
        if config is not None:
            self.write("config", 0, **{"config": dict(config)})

    def write(self, kind: str, step: int, **metrics) -> None:
        rec = {"run": self.run, "kind": kind, "step": int(step), "t": time.time()}
        for k, v in metrics.items():
            if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
                v = v.item()
            rec[k] = v
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()


class SmartLogger:
    """Verbosity-leveled print logger (reference ``SmartLogger``,
    `mined_inference.py:47-52`): level 0 silent, 1 milestones, 2 chatty."""

    def __init__(self, level: int = 1):
        self.level = level

    def log(self, msg: str, level: int = 1) -> None:
        if level <= self.level:
            print(msg, flush=True)


def maybe_wandb_writer(project: str, run: str, config=None):
    """Optional wandb sink: returns a callable(step, **metrics) that logs to
    wandb when the package is importable, else a no-op (the image has no
    wandb; MetricWriter JSONL is the primary sink either way)."""
    try:
        import wandb  # noqa: PLC0415
    except ImportError:
        return lambda step, **metrics: None
    wandb.init(project=project, name=run, config=config or {})
    return lambda step, **metrics: wandb.log(metrics, step=step)


def profile_trace(out_dir: str):
    """jax.profiler trace context — the tracing subsystem (SURVEY.md §5
    'Tracing/profiling'). Usage: ``with profile_trace('artifacts/trace'): ...``;
    view with tensorboard or xprof."""
    import jax

    return jax.profiler.trace(out_dir)


def alignment(emb_a: jnp.ndarray, emb_b: jnp.ndarray) -> jnp.ndarray:
    """Mean squared distance between positive pairs — lower is better
    (reference `item_tower.py:612-616`). Inputs are L2-normalized (B, D)."""
    return jnp.mean(jnp.sum((emb_a - emb_b) ** 2, axis=-1))


def uniformity(emb: jnp.ndarray) -> jnp.ndarray:
    """log E[exp(-2 ||x_i - x_j||^2)] over distinct pairs — more negative is
    better (reference `item_tower.py:618-629`). O(B^2), fine at probe cadence."""
    sq = jnp.sum(emb**2, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * emb @ emb.T
    n = emb.shape[0]
    mask = 1.0 - jnp.eye(n, dtype=emb.dtype)
    mean = jnp.sum(jnp.exp(-2.0 * d2) * mask) / (n * (n - 1))
    return jnp.log(mean + 1e-12)


def gate_weights(params, path_filter: str = "gate") -> dict[str, float]:
    """Sigmoid feature-gate values as interpretability metrics (the reference
    logs these per feature to wandb, `v1_usertower_train.py:526-533`)."""
    import jax

    out: dict[str, float] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if path_filter in name and getattr(leaf, "ndim", None) == 1 and leaf.size <= 16:
            vals = jax.nn.sigmoid(leaf)
            for i, v in enumerate(vals.tolist()):
                out[f"{name}[{i}]"] = float(v)
    return out


def meta_feature_importance(kernel, slices: Mapping[str, slice]) -> dict[str, float]:
    """First-layer |weight|-norm attribution over named input-column groups
    — which raw feature group drives a head (reference
    ``get_meta_feature_importance``, `mined_inference.py:712-734`).

    ``kernel`` is a flax Dense kernel (in_dim, out_dim); ``slices`` names
    row ranges of the input dimension. Returns shares summing to ~1."""
    import numpy as np

    w = np.abs(np.asarray(kernel, dtype=np.float32))
    means = {name: float(w[sl].mean()) for name, sl in slices.items()}
    total = sum(means.values()) + 1e-9
    return {k: v / total for k, v in means.items()}


def static_branch_importance(user_params, tower_cfg) -> dict[str, float]:
    """Feature-group attribution for the SASRec static branch: slices the
    static-MLP first layer by (bucket embs | categorical embs | continuous
    projection) per the concat order in ``SASRecUserTower.__call__``."""
    kernel = user_params["static_mlp"]["Dense_0"]["kernel"]
    c = tower_cfg
    slices: dict[str, slice] = {}
    off = 0
    for i in range(c.static_bucket_fields):
        slices[f"bucket{i}"] = slice(off, off + c.bucket_emb_dim)
        off += c.bucket_emb_dim
    for i in range(c.static_cat_fields):
        slices[f"cat{i}"] = slice(off, off + c.cat_emb_dim)
        off += c.cat_emb_dim
    slices["cont"] = slice(off, off + c.cont_proj_dim)
    return meta_feature_importance(kernel, slices)
