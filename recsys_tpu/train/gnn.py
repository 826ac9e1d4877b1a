"""LightGCL training / resume / fine-tune + post-hoc eval + distillation.

TPU redesign of the reference loops (`gnn_model/v1_lightgcl.py:224-562`,
eval `v1_evaluate_lightgcl.py`, distill `distill_mag_to_cos_l2.py`):

  * full-graph forward every step (the reference's structure, SURVEY.md
    §3.4) as one jitted segment-sum program — bf16-free fp32 graph math at
    dim 64, BPR + clamped SSL InfoNCE + L2 reg;
  * vectorized host-side rejection sampling for BPR negatives;
  * full train-state checkpoints (params+opt+epoch+config) best/last, resume
    with optional fresh-optimizer lr reset, fine-tune with cosine decay;
  * post-hoc n-layer propagation of trained layer-0 embeddings for export /
    eval (dot-product Recall@{20,100} — NOT cosine, reference
    `v1_evaluate_lightgcl.py:275-340`);
  * magnitude->cosine distillation of the teacher's dot scores.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from recsys_tpu.config import Config, GNNConfig
from recsys_tpu.models.lightgcl import (
    LightGCL,
    MagnitudeEncoder,
    bpr_loss,
    distill_loss,
    reg_loss,
    ssl_loss,
)
from recsys_tpu.ops.graph import BipartiteGraph, build_graph, propagate
from recsys_tpu.train.checkpoint import CheckpointStore, save_array_with_ids
from recsys_tpu.train.metrics import MetricWriter
from recsys_tpu.train.state import TrainState


def graph_from_transactions(tx_df, user_map, item_map, cfg: GNNConfig,
                            seed: int = 0) -> BipartiteGraph:
    """Transactions + id maps -> normalized bipartite COO graph. User/item
    indices here are 0-based dense graph indices (no PAD row)."""
    u = np.array([user_map[uid] for uid in tx_df["user_id"]], np.int64)
    i = np.array([item_map[iid] for iid in tx_df["item_id"]], np.int64)
    return build_graph(u, i, len(user_map), len(item_map),
                       svd_rank=cfg.svd_rank, svd_iters=cfg.svd_iters, seed=seed)


def edge_key_index(graph_u: np.ndarray, graph_i: np.ndarray,
                   num_items: int) -> np.ndarray:
    """Sorted unique (user*num_items+item) keys for O(log E) membership."""
    return np.unique(graph_u.astype(np.int64) * num_items
                     + graph_i.astype(np.int64))


def _in_edges(sorted_keys: np.ndarray, users: np.ndarray, neg: np.ndarray,
              num_items: int) -> np.ndarray:
    cand = users.astype(np.int64) * num_items + neg.astype(np.int64)
    so = np.argsort(cand, kind="stable")  # ordered probes: ~1.5x fewer cache misses
    pos = np.minimum(np.searchsorted(sorted_keys, cand[so]),
                     len(sorted_keys) - 1)
    out = np.zeros(len(cand), bool)
    out[so] = sorted_keys[pos] == cand[so]
    return out


def sample_bpr_batches(graph_u: np.ndarray, graph_i: np.ndarray, num_items: int,
                       batch_size: int, rng: np.random.Generator,
                       sorted_keys: np.ndarray | None = None):
    """Shuffled (users, pos, rejection-sampled neg) batches over all edges.

    Negative rejection is a searchsorted probe against the sorted edge-key
    array — pure numpy, no Python set membership (the round-1 form hashed
    8192 Python ints per rejection round per batch: ~45x slower measured at
    22.6M edges, and the set itself cost ~2 GB). Pass ``sorted_keys``
    (from :func:`edge_key_index`) to amortize the sort across epochs."""
    if sorted_keys is None:
        sorted_keys = edge_key_index(graph_u, graph_i, num_items)
    order = rng.permutation(len(graph_u))
    end = len(order) - len(order) % batch_size
    if end == 0 and len(order) > 0:
        end = len(order)  # single short batch for tiny graphs
    for s in range(0, end, batch_size):
        idx = order[s:s + batch_size]
        users, pos = graph_u[idx], graph_i[idx]
        neg = rng.integers(0, num_items, size=len(idx))
        for _ in range(10):  # vectorized rejection rounds
            bad = _in_edges(sorted_keys, users, neg, num_items)
            if not bad.any():
                break
            neg[bad] = rng.integers(0, num_items, size=int(bad.sum()))
        yield users.astype(np.int32), pos.astype(np.int32), neg.astype(np.int32)


def select_propagation(cfg: GNNConfig, graph: BipartiteGraph, num_nodes: int,
                       mesh=None):
    """Pick the propagation backend + its device-resident args.

    'auto' -> the block-SpMM Pallas kernel on accelerators (scatter-free,
    ~3.5x the XLA segment_sum path at 22.6M edges), plain segment_sum on
    the CPU test mesh. 'segment_sum_sharded' (requires ``mesh``) shards the
    edge list over the mesh's model axis — each shard segment-sums its
    slice, one psum merges (multi-chip full-graph propagation)."""
    from recsys_tpu.ops import use_pallas

    mode = cfg.propagation
    if mode == "auto":
        mode = "spmm" if use_pallas("auto") else "segment_sum"
    if mode == "segment_sum_sharded":
        if mesh is None:
            raise ValueError("segment_sum_sharded propagation needs a mesh")
        from recsys_tpu.ops.graph import make_edge_sharded_propagate

        axis = mesh.axis_names[1]
        prop_fn, place_edges = make_edge_sharded_propagate(mesh, num_nodes, axis)
        return prop_fn, place_edges(graph.src, graph.dst, graph.weight)
    if mode == "spmm":
        from recsys_tpu.ops.pallas_spmm import block_graph, spmm

        pack = cfg.spmm_pack if cfg.emb_dim <= 64 else 1
        split = cfg.spmm_split if pack == 2 else 1
        mxu_parts = cfg.spmm_mxu_parts if (pack == 2 and split == 1) else 1
        if (cfg.spmm_chunk_e // 128) % max(mxu_parts, 1):
            mxu_parts = 1  # odd sub-chunk counts: fall back, don't crash
        blocked = block_graph(graph.src, graph.dst, graph.weight, num_nodes,
                              block_n=cfg.spmm_block_n, chunk_e=cfg.spmm_chunk_e,
                              pack=pack, split=split, mxu_parts=mxu_parts)
        arrays = {k: jax.device_put(v) for k, v in blocked.device_arrays().items()}
        meta = blocked.meta
        return (lambda args, x: spmm(meta, args, x, "bf16")), arrays
    args = (jax.device_put(jnp.asarray(graph.src)),
            jax.device_put(jnp.asarray(graph.dst)),
            jax.device_put(jnp.asarray(graph.weight)))
    from recsys_tpu.ops.graph import propagate as _propagate

    return (lambda a, x: _propagate(x, a[0], a[1], a[2], num_nodes)), args


def make_gnn_step(model: LightGCL, graph: BipartiteGraph, cfg: GNNConfig,
                  prop_args=None):
    # Graph arrays are passed as jit ARGUMENTS (device-resident), never as
    # closure constants — 22M-element literals embedded in the jaxpr make
    # compilation pathological.
    graph_args = (prop_args,
                  jax.device_put(jnp.asarray(graph.svd_u)),
                  jax.device_put(jnp.asarray(graph.svd_s)),
                  jax.device_put(jnp.asarray(graph.svd_v)))

    def loss_fn(params, g, users, pos, neg):
        lu, li, gu, gi = model.apply({"params": params}, *g)
        l_bpr = bpr_loss(lu, li, users, pos, neg)
        l_ssl = (ssl_loss(lu, gu, users, cfg.temperature, cfg.logit_clamp)
                 + ssl_loss(li, gi, pos, cfg.temperature, cfg.logit_clamp))
        l_reg = reg_loss(params, users, pos, neg)
        total = l_bpr + cfg.lambda_ssl * l_ssl + cfg.lambda_reg * l_reg
        return total, {"bpr": l_bpr, "ssl": l_ssl, "reg": l_reg}

    @jax.jit
    def _step(state: TrainState, g, users, pos, neg):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, g, users, pos, neg)
        new_state = state.apply_gradients(grads)
        aux["loss"] = loss
        return new_state, aux

    def step(state, users, pos, neg):
        return _step(state, graph_args, users, pos, neg)

    return step


def train_lightgcl(cfg: Config, graph: BipartiteGraph, edges_u: np.ndarray,
                   edges_i: np.ndarray, workdir: str, *,
                   resume: bool = False, fine_tune: bool = False,
                   writer: MetricWriter | None = None):
    """Train (or resume / cosine-fine-tune) LightGCL over the whole edge set."""
    g = cfg.gnn
    prop_fn, prop_args = select_propagation(g, graph, graph.num_nodes)
    model = LightGCL(graph.num_users, graph.num_items, g, prop_fn=prop_fn)
    params = jax.jit(model.init)(jax.random.PRNGKey(cfg.data.seed), prop_args,
                                 jnp.asarray(graph.svd_u), jnp.asarray(graph.svd_s),
                                 jnp.asarray(graph.svd_v))["params"]
    passes = max(1, -(-g.steps_per_epoch_min //
                      max(len(edges_u) // g.batch_size, 1)))
    steps_per_epoch = max(len(edges_u) // g.batch_size, 1) * passes
    if g.steps_per_epoch_max:
        steps_per_epoch = min(steps_per_epoch, g.steps_per_epoch_max)
    if fine_tune:
        sched = optax.cosine_decay_schedule(g.lr * 0.4, steps_per_epoch * g.epochs,
                                            alpha=1e-5 / (g.lr * 0.4))
        tx = optax.adam(sched)
    else:
        tx = optax.adam(g.lr)
    state = TrainState.create(params, tx)
    store = CheckpointStore(workdir, maximize=False)
    start_epoch = 1
    if resume or fine_tune:
        restored = store.restore_latest(state if resume else
                                        TrainState.create(params, optax.adam(g.lr)))
        if restored is not None:
            prev, entry = restored
            if resume:
                state, start_epoch = prev, entry["extra"].get("epoch", 0) + 1
            else:  # fine-tune: fresh optimizer, previous params
                state = TrainState.create(prev.params, tx)
    step_fn = make_gnn_step(model, graph, g, prop_args)
    writer = writer or MetricWriter(f"{workdir}/metrics.jsonl", "lightgcl")
    rng = np.random.default_rng(cfg.data.seed)
    sorted_keys = edge_key_index(edges_u, edges_i, graph.num_items)

    gstep = 0
    for epoch in range(start_epoch, g.epochs + 1):
        losses: list = []   # device scalars; a float() per step would block
        ep_steps = 0        # on a full tunnel round trip per step
        for _pass in range(passes):   # steps floor: shuffled re-passes
            for users, pos, neg in sample_bpr_batches(edges_u, edges_i,
                                                      graph.num_items,
                                                      g.batch_size, rng,
                                                      sorted_keys):
                state, aux = step_fn(state, jnp.asarray(users), jnp.asarray(pos),
                                     jnp.asarray(neg))
                losses.append(aux["loss"]); gstep += 1; ep_steps += 1
                if gstep % 100 == 0:
                    writer.write("train", gstep, loss=float(aux["loss"]),
                                 bpr=float(aux["bpr"]), ssl=float(aux["ssl"]))
                if g.steps_per_epoch_max and ep_steps >= steps_per_epoch:
                    break
            if g.steps_per_epoch_max and ep_steps >= steps_per_epoch:
                break
        mean = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        writer.write("epoch", epoch, loss=mean)
        store.save(f"ep{epoch:03d}", state, step=gstep, metric=mean,
                   extra={"epoch": epoch})
    return state, model


def final_embeddings(params, graph: BipartiteGraph, num_layers: int = 2):
    """Post-hoc n-layer propagation of the trained layer-0 tables (the
    export/eval path, reference `compute_final_embeddings`,
    `v1_evaluate_lightgcl.py:147-179`).

    Uses the edge-chunked propagate: the naive gather materializes an
    (E, D) message array that OOMs HBM at the H&M graph (54.3M edges ->
    27.8 GB; the training path streams through the blocked Pallas kernel
    and never sees this shape)."""
    from recsys_tpu.ops.graph import propagate_chunked

    x0 = jnp.concatenate([jnp.asarray(params["user_emb"]),
                          jnp.asarray(params["item_emb"])]).astype(jnp.float32)
    acc, x = x0, x0
    for _ in range(num_layers):
        x = propagate_chunked(x, graph.src, graph.dst, graph.weight,
                              graph.num_nodes)
        acc = acc + x
    out = acc / (num_layers + 1)
    return np.asarray(out[: graph.num_users]), np.asarray(out[graph.num_users:])


def export_gnn_artifacts(params, graph: BipartiteGraph, user_ids, item_ids,
                         out_prefix: str, num_layers: int = 2):
    """Save propagated user/item embeddings with id sidecars (graph indices
    are dense 0-based; NO pad row — meta records that)."""
    u, i = final_embeddings(params, graph, num_layers)
    save_array_with_ids(out_prefix + "_users", u, list(user_ids),
                        meta={"pad_row": None, "space": "gnn_dot"})
    save_array_with_ids(out_prefix + "_items", i, list(item_ids),
                        meta={"pad_row": None, "space": "gnn_dot"})
    return u, i


def gnn_propagation_check(params, graph: BipartiteGraph) -> dict:
    """The reference's before/after propagation sanity check as data
    (`v1_evaluate_lightgcl.py:404-445`): propagation must change stats."""
    before = np.concatenate([np.asarray(params["user_emb"]),
                             np.asarray(params["item_emb"])])
    u, i = final_embeddings(params, graph)
    after = np.concatenate([u, i])
    delta = float(np.abs(after - before).mean())
    return {"mean_abs_delta": delta, "ok": delta > 1e-7}


# -- magnitude -> cosine distillation --------------------------------------

def train_distill(cfg: Config, teacher_users: np.ndarray, teacher_items: np.ndarray,
                  workdir: str, writer: MetricWriter | None = None):
    """Distill the teacher's dot-product geometry into a cosine-only space."""
    d = cfg.distill
    model = MagnitudeEncoder(teacher_items.shape[1], d.hidden_dim, d.out_dim)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, teacher_items.shape[1])))["params"]
    tx = optax.adam(d.lr)
    state = TrainState.create(params, tx)
    tu = jnp.asarray(teacher_users, jnp.float32)
    ti = jnp.asarray(teacher_items, jnp.float32)

    def loss_fn(params, uu, ii):
        su, scale = model.apply({"params": params}, uu)
        si, _ = model.apply({"params": params}, ii)
        return distill_loss(su, si, scale, uu, ii)

    @jax.jit
    def step(state, uu, ii):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, uu, ii)
        return state.apply_gradients(grads), loss

    writer = writer or MetricWriter(f"{workdir}/metrics.jsonl", "distill")
    rng = np.random.default_rng(0)
    bs = min(d.batch_size, len(teacher_users), len(teacher_items))
    # teacher-top-k hard-pair mining (cfg.distill.hard_frac): without it
    # the item batch is uniform over the catalog, so at 105k items the
    # pairs that decide top-100 ordering are ~0.1% of the MSE mass and
    # the student never learns the tail — the fidelity-collapse mechanism
    n_hard = int(bs * min(max(d.hard_frac, 0.0), 1.0))
    if n_hard:
        mine_k = min(d.hard_k, ti.shape[0])

        @jax.jit
        def mine(uu):
            _, idx = jax.lax.top_k(uu @ ti.T, mine_k)
            return idx

    for epoch in range(1, d.epochs + 1):
        tot = 0.0
        for _ in range(max(d.steps_per_epoch, 1)):
            uu = tu[rng.integers(0, len(teacher_users), bs)]
            if n_hard:
                pool = np.unique(np.asarray(mine(uu)))
                rows = np.concatenate([
                    pool[rng.integers(0, len(pool), n_hard)],
                    rng.integers(0, len(teacher_items), bs - n_hard)])
                ii = ti[rows]
            else:
                ii = ti[rng.integers(0, len(teacher_items), bs)]
            state, loss = step(state, uu, ii)
            tot += float(loss)
        writer.write("epoch", epoch, loss=tot / max(d.steps_per_epoch, 1))
    return state, model


def distilled_vectors(state, model: MagnitudeEncoder, vecs: np.ndarray) -> np.ndarray:
    out, _ = model.apply({"params": state.params}, jnp.asarray(vecs, jnp.float32))
    return np.asarray(out)
