"""Benchmark: SimCSE item-tower training throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation: the only throughput trace the reference publishes is
LightGCL at 1.50 it/s x batch 8192 = 12288 examples/s on a CUDA GPU
(`gnn_model/v1_lightgcl.py:645`; see BASELINE.md). Until our LightGCL lands,
this bench reports item-tower contrastive training examples/s at the
reference batch size (192) with vs_baseline computed against that number —
an imperfect but honest cross-model anchor, replaced by the matching
LightGCL bench in a later round.
"""

import json
import time

import numpy as np

import jax

REFERENCE_EXAMPLES_PER_S = 12288.0  # LightGCL, batch 8192, 1.50 it/s (CUDA)


def main():
    from recsys_tpu.config import Config, DataConfig
    from recsys_tpu.data.dataset import slice_item_batch, tokenize_items
    from recsys_tpu.data.synthetic import generate_dataset
    from recsys_tpu.data.vocab import StdVocab
    from recsys_tpu.parallel.mesh import build_mesh, data_sharding, replicated
    from recsys_tpu.train.simcse import (
        build_model, init_params, make_optimizer, make_train_step)
    from recsys_tpu.train.state import TrainState
    from recsys_tpu.config import MeshConfig

    cfg = Config(data=DataConfig(num_items=512, num_users=32, days=30, seed=0))
    bs = cfg.simcse.batch_size  # 192, the reference's serving/train batch
    items, _, _ = generate_dataset(cfg.data)
    tensors = tokenize_items(items, StdVocab(), cfg.vocab)

    mesh = build_mesh(MeshConfig())
    model = build_model(cfg, StdVocab().size, tensors["std"].shape[1])
    params = init_params(model, tensors, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, params, total_steps=1000)
    state = jax.device_put(TrainState.create(params, tx), replicated(mesh))
    step_fn = make_train_step(model, cfg)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def one_step(state, key):
        idx = rng.integers(0, len(tensors["item_ids"]), size=bs)
        batch = jax.device_put(slice_item_batch(tensors, idx), data_sharding(mesh))
        key, sub = jax.random.split(key)
        state, aux = step_fn(state, batch, sub)
        return state, key, aux

    # warmup/compile
    for _ in range(3):
        state, key, aux = one_step(state, key)
    jax.block_until_ready(state.params)

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, key, aux = one_step(state, key)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    eps = n_steps * bs / dt
    print(json.dumps({
        "metric": "item_tower_train_examples_per_s",
        "value": round(eps, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(eps / REFERENCE_EXAMPLES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
