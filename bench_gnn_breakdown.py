"""Decompose the headline LightGCL step (bench.py) into its phases.

Times, in ONE session (so tunnel-speed variance cancels), chained
differentially (see bench.py timing notes):

  pass   — one block-SpMM propagation pass
  fwd    — full model forward (2 local passes + 2 SVD-view layers + means)
  loss   — loss_fn forward (fwd + BPR + 2x batch-SSL InfoNCE + reg)
  step   — value_and_grad + adam (what bench.py measures)

Derived: loss-math cost = loss - fwd; backward+opt cost = step - loss.
All large arrays ride as jit ARGUMENTS (closure constants break the
remote-compile transport — see ROADMAP env notes). Prints one JSON line.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from bench import BATCH, NUM_ITEMS, NUM_USERS, build_synthetic_graph

N_SHORT, N_LONG = 5, 25


def chain_time(fn, init_carry, args, materialize):
    """(T_long - T_short) / (N_long - N_short); carry chained through fn,
    big operands as jit args."""
    @jax.jit
    def chain(carry, a, steps):
        return jax.lax.fori_loop(0, steps, lambda i, c: fn(c, a), carry)

    _ = materialize(chain(init_carry, args, 1))     # compile + warmup
    t0 = time.perf_counter()
    _ = materialize(chain(init_carry, args, N_SHORT))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = materialize(chain(init_carry, args, N_LONG))
    t_long = time.perf_counter() - t0
    return (t_long - t_short) / (N_LONG - N_SHORT) * 1000


def main():
    from recsys_tpu.config import GNNConfig
    from recsys_tpu.models.lightgcl import (LightGCL, bpr_loss, reg_loss,
                                            ssl_loss)
    from recsys_tpu.train.gnn import make_gnn_step, select_propagation
    from recsys_tpu.train.state import TrainState

    rng = np.random.default_rng(0)
    graph, eu, ei = build_synthetic_graph(rng)
    cfg = GNNConfig()
    n = graph.num_nodes
    prop_fn, prop_args = select_propagation(cfg, graph, n)
    model = LightGCL(graph.num_users, graph.num_items, cfg, prop_fn=prop_fn)
    params = {
        "user_emb": jnp.asarray(rng.normal(0, 0.1, (NUM_USERS, cfg.emb_dim)),
                                jnp.float32),
        "item_emb": jnp.asarray(rng.normal(0, 0.1, (NUM_ITEMS, cfg.emb_dim)),
                                jnp.float32),
    }
    svd = (jnp.asarray(graph.svd_u), jnp.asarray(graph.svd_s),
           jnp.asarray(graph.svd_v))
    idx = rng.integers(0, len(eu), BATCH)
    users = jnp.asarray(eu[idx], jnp.int32)
    pos = jnp.asarray(ei[idx], jnp.int32)
    neg = jnp.asarray(rng.integers(0, NUM_ITEMS, BATCH), jnp.int32)

    x0 = jnp.asarray(rng.normal(0, 0.1, (n, cfg.emb_dim)), jnp.float32)
    results = {}

    results["pass"] = chain_time(lambda x, a: prop_fn(a, x), x0, prop_args,
                                 lambda y: np.asarray(y[0]))
    print(json.dumps({"phase": "pass", "ms": round(results["pass"], 2)}),
          flush=True)

    def fwd(c, a):
        p, pa, sv = a
        p = {k: v + c * 0.0 for k, v in p.items()}
        lu, li, gu, gi = model.apply({"params": p}, pa, *sv)
        return (jnp.sum(lu[0]) + jnp.sum(li[0]) + jnp.sum(gu[0])
                + jnp.sum(gi[0])) * 1e-20

    results["fwd"] = chain_time(fwd, jnp.float32(0.0),
                                (params, prop_args, svd), lambda y: float(y))
    print(json.dumps({"phase": "fwd", "ms": round(results["fwd"], 2)}),
          flush=True)

    def loss_fwd(c, a):
        p, pa, sv, u, pp, ng = a
        p = {k: v + c * 0.0 for k, v in p.items()}
        lu, li, gu, gi = model.apply({"params": p}, pa, *sv)
        l = bpr_loss(lu, li, u, pp, ng)
        l += cfg.lambda_ssl * (ssl_loss(lu, gu, u, cfg.temperature,
                                        cfg.logit_clamp)
                               + ssl_loss(li, gi, pp, cfg.temperature,
                                          cfg.logit_clamp))
        l += cfg.lambda_reg * reg_loss(p, u, pp, ng)
        return l * 1e-20

    results["loss"] = chain_time(
        loss_fwd, jnp.float32(0.0),
        (params, prop_args, svd, users, pos, neg), lambda y: float(y))
    print(json.dumps({"phase": "loss", "ms": round(results["loss"], 2)}),
          flush=True)

    state = TrainState.create(params, optax.adam(cfg.lr))
    step_fn = make_gnn_step(model, graph, cfg, prop_args)
    for _ in range(3):
        state, aux = step_fn(state, users, pos, neg)
    _ = float(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(N_LONG):
        state, aux = step_fn(state, users, pos, neg)
    _ = float(aux["loss"])
    t_long = time.perf_counter() - t0
    results["step"] = t_long / N_LONG * 1000

    results["loss_math"] = results["loss"] - results["fwd"]
    results["bwd_plus_opt"] = results["step"] - results["loss"]
    print(json.dumps({k: round(v, 2) for k, v in results.items()}),
          flush=True)


if __name__ == "__main__":
    main()
