"""Stage-2 SASRec pipeline: model forward, jitted train step, recall eval,
freeze/unfreeze schedule, plateau lr, checkpoint resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recsys_tpu.config import (
    Config, DataConfig, MeshConfig, UserTowerConfig, UserTrainConfig, VocabConfig)
from recsys_tpu.data.synthetic import generate_dataset
from recsys_tpu.parallel.mesh import build_mesh
from recsys_tpu.train import sasrec

CFG = Config(
    data=DataConfig(num_items=120, num_users=60, days=60, seed=11),
    vocab=VocabConfig(num_hash_buckets=50),
    user_tower=UserTowerConfig(max_len=12, num_layers=1),
    user_train=UserTrainConfig(batch_size=16, epochs=2, positions_per_user=2,
                               eval_ks=(5, 20), freeze_item_epochs=1,
                               steps_per_epoch_min=1),
)


@pytest.fixture(scope="module")
def world():
    return generate_dataset(CFG.data)


@pytest.fixture(scope="module")
def stage2_data(world):
    items, users, tx = world
    return sasrec.prepare_stage2(CFG, items, users, tx)


@pytest.fixture(scope="module")
def mesh():
    return build_mesh(MeshConfig(num_data=4, num_model=1), jax.devices()[:4])


def test_prepare_stage2(stage2_data):
    t = stage2_data["tensors"]
    assert t["input_ids"].shape[1] == 12
    assert stage2_data["logq"].shape[0] == 121
    assert stage2_data["side"].shape == (121, 4)
    assert len(stage2_data["targets_idx"]) > 5
    # targets are valid model indices
    for s in stage2_data["targets_idx"].values():
        assert all(0 < i <= 120 for i in s)


def test_freeze_gate_and_plateau():
    from recsys_tpu.train.state import PlateauScheduler, freeze_gate_schedule

    g = freeze_gate_schedule(5)
    assert float(g(0)) == 0.0 and float(g(4)) == 0.0 and float(g(5)) == 1.0
    p = PlateauScheduler(factor=0.5, patience=2)
    assert p.update(1.0) == 1.0
    assert p.update(0.9) == 1.0   # 1 bad epoch
    assert p.update(0.8) == 0.5   # 2 bad epochs -> halve
    assert p.update(2.0) == 0.5   # improvement resets counter, scale stays


def test_train_user_tower_end_to_end(stage2_data, mesh, tmp_path):
    rng = np.random.default_rng(0)
    pretrained = rng.normal(0, 0.05, (121, 128)).astype(np.float32)
    pretrained[0] = 0
    state, history, (models, uv_fn) = sasrec.train_user_tower(
        CFG, stage2_data, pretrained, mesh, str(tmp_path))
    assert len(history) == 2
    for m in history:
        assert np.isfinite(m["recall@20"]) and m["n_eval"] > 0

    import json
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    losses = [r["loss"] for r in recs if r["kind"] == "train"]
    assert losses and all(np.isfinite(l) for l in losses)

    # frozen phase: item matrix unchanged after epoch 1? (freeze_item_epochs=1
    # means the whole first epoch has zero item grads; by end of epoch 2 it
    # must have moved)
    final_mat = np.asarray(state.params["item"]["item_matrix"])
    assert not np.allclose(final_mat, pretrained)

    # resume: restores latest epoch and continues without error
    cfg3 = Config(**{**CFG.__dict__, "user_train":
                     UserTrainConfig(batch_size=16, epochs=3, positions_per_user=2,
                                     eval_ks=(5, 20), freeze_item_epochs=1,
                                     steps_per_epoch_min=1)})
    state2, history2, _ = sasrec.train_user_tower(
        cfg3, stage2_data, pretrained, mesh, str(tmp_path), resume=True)
    assert len(history2) == 1  # only epoch 3 ran


def test_user_vectors_normalized(stage2_data, mesh):
    rng = np.random.default_rng(0)
    pretrained = rng.normal(0, 0.05, (121, 128)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    t = stage2_data["tensors"]
    sample = sasrec._slice(t, np.arange(8))
    params, models = sasrec.init_stage2_params(CFG, 121, pretrained, key, sample)
    _, uv_fn = sasrec.make_stage2_step(CFG, models, stage2_data["side"],
                                       stage2_data["logq"])
    u = uv_fn(params, {k: jnp.asarray(v) for k, v in sample.items()})
    assert u.shape == (8, 128)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(u), axis=-1), 1.0, rtol=1e-3)


@pytest.mark.parametrize("variant", ["hnm", "mixed_hnm", "margin"])
def test_loss_variants_train(stage2_data, mesh, tmp_path, variant):
    """Every loss-zoo variant runs through the jitted stage-2 step."""
    from recsys_tpu.config import Config as C2

    cfg = C2(**{**CFG.__dict__,
                "user_train": UserTrainConfig(
                    batch_size=16, epochs=1, positions_per_user=2,
                    eval_ks=(5,), freeze_item_epochs=0, loss_variant=variant,
                    top_k_percent=0.1, steps_per_epoch_min=1)})
    rng = np.random.default_rng(0)
    pretrained = rng.normal(0, 0.05, (121, 128)).astype(np.float32)
    state, history, _ = sasrec.train_user_tower(
        cfg, stage2_data, pretrained, mesh, str(tmp_path / variant))
    assert len(history) == 1 and np.isfinite(history[0]["recall@5"])


def test_steps_per_epoch_min_multiplies_passes(stage2_data, mesh, tmp_path):
    """Small worlds: an epoch runs ceil(min/base) shuffled passes so the
    optimizer-step count reaches reference scale."""
    from dataclasses import replace

    cfg = Config(**{**CFG.__dict__, "user_train": replace(
        CFG.user_train, epochs=1, steps_per_epoch_min=7)})
    pretrained = np.zeros((121, 128), np.float32)
    state, history, _ = sasrec.train_user_tower(
        cfg, stage2_data, pretrained, mesh, str(tmp_path / "a"))
    n = stage2_data["tensors"]["input_ids"].shape[0]
    base = max(n // 16, 1)
    passes = -(-7 // base)
    assert int(state.step) == base * passes
    assert len(history) == 1


def test_step_numerics_mesh_size_invariant(stage2_data):
    """jit-SPMD must be semantics-preserving: the SAME train step on a
    1-device mesh and an 8-device (data x model) mesh produces the same
    loss trajectory (sharding changes layout, not math — SURVEY.md §2.12's
    DP design depends on this)."""
    from recsys_tpu.config import MeshConfig
    from recsys_tpu.parallel.mesh import data_sharding, replicated
    from recsys_tpu.train.state import TrainState

    rng = np.random.default_rng(0)
    pretrained = rng.normal(0, 0.05, (121, 128)).astype(np.float32)
    t = stage2_data["tensors"]
    n = t["input_ids"].shape[0]
    sample = sasrec._slice(t, np.arange(16))
    losses = {}
    for name, mcfg in [("m1", MeshConfig(num_data=1, num_model=1)),
                       ("m8", MeshConfig(num_data=4, num_model=2))]:
        mesh = build_mesh(mcfg, jax.devices()[: mcfg.num_data * mcfg.num_model])
        key = jax.random.PRNGKey(7)
        params, models = sasrec.init_stage2_params(CFG, 121, pretrained,
                                                   jax.random.PRNGKey(0), sample)
        tx = sasrec.make_stage2_optimizer(CFG, params, steps_per_epoch=4)
        state = jax.device_put(TrainState.create(params, tx), replicated(mesh))
        step_fn, _ = sasrec.make_stage2_step(CFG, models, stage2_data["side"],
                                             stage2_data["logq"])
        traj = []
        for s in range(3):
            idx = np.arange(s * 16, s * 16 + 16) % n
            batch = jax.device_put(sasrec._slice(t, idx), data_sharding(mesh))
            key, sub = jax.random.split(key)
            state, aux = step_fn(state, batch, sub)
            traj.append(float(aux["loss"]))
        losses[name] = traj
    np.testing.assert_allclose(losses["m1"], losses["m8"], rtol=5e-4)


def test_stage2_a2a_lookup_matches_dense():
    """lookup='a2a' (DLRM-style shard_map exchange over the model axis) must
    reproduce the dense jnp.take step exactly: same params, same batch, same
    rng -> same loss trajectory. Catalog pad 128 divides the model axis."""
    import dataclasses

    from recsys_tpu.parallel.mesh import data_sharding, replicated
    from recsys_tpu.train.state import TrainState

    cfg = Config(
        data=DataConfig(num_items=127, num_users=40, days=50, seed=3),
        vocab=VocabConfig(num_hash_buckets=50),
        user_tower=UserTowerConfig(max_len=10, num_layers=1),
        user_train=UserTrainConfig(batch_size=16, positions_per_user=2,
                                   steps_per_epoch_min=1, kernel="xla"),
    )
    items, users, tx = generate_dataset(cfg.data)
    data = sasrec.prepare_stage2(cfg, items, users, tx)
    assert len(data["item_map"]) + 1 == 128
    t = data["tensors"]
    n = t["input_ids"].shape[0]
    sample = sasrec._slice(t, np.arange(16))
    mesh = build_mesh(MeshConfig(num_data=4, num_model=2), jax.devices()[:8])

    losses = {}
    for lookup in ("dense", "a2a"):
        c = dataclasses.replace(
            cfg, user_train=dataclasses.replace(cfg.user_train, lookup=lookup))
        params, models = sasrec.init_stage2_params(c, 128, None,
                                                   jax.random.PRNGKey(0), sample)
        tx_opt = sasrec.make_stage2_optimizer(c, params, steps_per_epoch=4)
        state = jax.device_put(TrainState.create(params, tx_opt), replicated(mesh))
        step_fn, uv_fn = sasrec.make_stage2_step(c, models, data["side"],
                                                 data["logq"], mesh=mesh)
        key = jax.random.PRNGKey(9)
        traj = []
        for s in range(3):
            idx = np.arange(s * 16, s * 16 + 16) % n
            batch = jax.device_put(sasrec._slice(t, idx), data_sharding(mesh))
            key, sub = jax.random.split(key)
            state, aux = step_fn(state, batch, sub)
            traj.append(float(aux["loss"]))
        # the eval path goes through the lookup too
        u = uv_fn(state.params, batch)
        assert np.all(np.isfinite(np.asarray(u)))
        losses[lookup] = traj
    np.testing.assert_allclose(losses["dense"], losses["a2a"], rtol=1e-5)
