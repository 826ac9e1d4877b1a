"""Pipeline CLI — the orchestration layer.

The reference drives its pipeline through Airflow DAGs calling FastAPI
endpoints (SURVEY.md §2.11: hourly ingest->vectorize loop, weekly retrain).
Here every stage is a plain CLI command over shared artifacts, and
``orchestrate`` reproduces the DAG contract (HTTP loop-until-drained +
scheduled retrain) against a running server. The stages:

  gen-data       synthetic persona world -> parquet (items/users/transactions)
  enrich         fake-LLM RE-feature enrichment stage (prompt contract in
                 llm_prompts/; deterministic rules, SURVEY.md §7.1)
  etl            splits + item/user/sequence features + validation targets
  train-item     stage-1 SimCSE                       -> checkpoints
  vectorize      materialize the (N+1,128) item matrix artifact
  train-user     stage-2 SASRec                       -> checkpoints + recall
  train-gnn      LightGCL                             -> graph embeddings
  distill        magnitude->cosine projector          -> distilled vectors
  train-reranker GBDT + DCN over two-tower features   -> AUC report
  eval           retrieval recall + ensemble sweeps   -> eval.json
  serve          HTTP server wired with the model vectorizer
  orchestrate    hourly/weekly scheduler loop against a server (--once)

The reference has *no* CLI at all (SURVEY.md §5 config); this one config
tree + stage set replaces its four config styles and hardcoded paths.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import pandas as pd

from recsys_tpu.config import Config, load_config


def _paths(cfg: Config) -> dict:
    root = cfg.data.root
    return {
        "root": root,
        "items": f"{root}/items.parquet",
        "users": f"{root}/users.parquet",
        "tx": f"{root}/transactions.parquet",
        "item_feats": f"{root}/features_item.parquet",
        "user_feats": f"{root}/features_user.parquet",
        "seqs": f"{root}/features_sequence.parquet",
        "targets": f"{root}/targets_val.json",
        "item_ckpts": f"{root}/ckpt_item",
        "user_ckpts": f"{root}/ckpt_user",
        "gnn_ckpts": f"{root}/ckpt_gnn",
        "item_matrix": f"{root}/item_matrix",
        "text_pretrain": f"{root}/text_pretrain.npz",
        "gnn_prefix": f"{root}/gnn",
        "distilled": f"{root}/gnn_distilled_items",
        "distilled_users": f"{root}/gnn_distilled_users",
        "eval": f"{root}/eval.json",
    }


def _load_world(cfg: Config):
    p = _paths(cfg)
    items = pd.read_parquet(p["items"])
    users = pd.read_parquet(p["users"])
    tx = pd.read_parquet(p["tx"])
    return items, users, tx


def _mesh(cfg: Config):
    from recsys_tpu.parallel.mesh import build_mesh
    return build_mesh(cfg.mesh)


def cmd_gen_data(cfg: Config, args) -> dict:
    from recsys_tpu.data.synthetic import generate_dataset
    p = _paths(cfg)
    os.makedirs(p["root"], exist_ok=True)
    items, users, tx = generate_dataset(cfg.data)
    items.to_parquet(p["items"])
    users.to_parquet(p["users"])
    tx.to_parquet(p["tx"])
    # learnability diagnostic: latent-cluster oracle vs popularity Recall@100
    # (sampled; tells whether the world has per-user structure worth training on)
    from recsys_tpu.data.synthetic import cluster_oracle_recall
    split_day = int(tx["day"].max()) - cfg.data.valid_days + 1
    oracle = cluster_oracle_recall(items, tx, split_day)
    return {"items": len(items), "users": len(users), "transactions": len(tx),
            "oracle": oracle}


def cmd_ingest_hm(cfg: Config, args) -> dict:
    """Real-data front door: the three H&M Kaggle CSVs -> the canonical
    parquet trio + a fitted STD vocab, so every later stage runs unchanged."""
    from recsys_tpu.data.hm_adapter import load_hm_dataset, vocab_from_items
    p = _paths(cfg)
    os.makedirs(p["root"], exist_ok=True)
    items, users, tx = load_hm_dataset(
        args.hm_dir, date_min=getattr(args, "date_min", None),
        date_max=getattr(args, "date_max", None))
    items.to_parquet(p["items"])
    users.to_parquet(p["users"])
    tx.to_parquet(p["tx"])
    vocab_from_items(items).to_json(f"{p['root']}/std_vocab.json")
    return {"items": len(items), "users": len(users), "transactions": len(tx),
            "vocab": f"{p['root']}/std_vocab.json"}


def cmd_enrich(cfg: Config, args) -> dict:
    """Re-run the LLM enrichment stage over the item master (idempotent)."""
    from recsys_tpu.data.synthetic import enrich_item
    p = _paths(cfg)
    items = pd.read_parquet(p["items"])
    enriched = [enrich_item(r)["reinforced_feature_value"]
                for r in items.to_dict("records")]
    items["reinforced_feature"] = enriched
    items.to_parquet(p["items"])
    return {"enriched": len(items)}


def cmd_etl(cfg: Config, args) -> dict:
    from recsys_tpu.data import etl
    p = _paths(cfg)
    items, users, tx = _load_world(cfg)
    train_tx, valid_tx, split_day = etl.time_split(tx, cfg.data.valid_days)
    item_feats = etl.make_item_features(train_tx, items, split_day)
    user_feats, _ = etl.make_user_features(train_tx, users, split_day)
    seqs = etl.make_sequences(train_tx, cfg.data.max_seq_len)
    targets = etl.make_validation_target(valid_tx)
    item_feats.to_parquet(p["item_feats"])
    user_feats.to_parquet(p["user_feats"])
    seqs.to_parquet(p["seqs"])
    with open(p["targets"], "w") as f:
        json.dump(targets, f)
    sanity = etl.final_sanity_check(seqs, targets)
    missing = etl.deep_inspect_missing_items(tx, items)
    return {"split_day": split_day, "sanity": sanity, "missing": missing}


def cmd_pretrain_text(cfg: Config, args) -> dict:
    """Corpus-pretrain the frozen text-embedding artifact (PPMI-SVD over
    the catalog's names + RE fields; data/text_pretrain.py). The analogue
    of 'download frozen BERT' in the reference — minus the download."""
    from recsys_tpu.data.dataset import tokenize_items
    from recsys_tpu.data.text_pretrain import pretrain_embeddings, save_text_pretrain
    from recsys_tpu.data.vocab import StdVocab
    p = _paths(cfg)
    items, _, _ = _load_world(cfg)
    tensors = tokenize_items(items, StdVocab(), cfg.vocab)
    emb = pretrain_embeddings(tensors, cfg.vocab.text_vocab_size,
                              dim=cfg.item_tower.pretrained_dim,
                              seed=cfg.data.seed)
    save_text_pretrain(p["text_pretrain"], emb)
    nz = int((np.abs(emb).sum(axis=1) > 0).sum())
    return {"artifact": p["text_pretrain"], "shape": list(emb.shape),
            "nonzero_rows": nz}


def cmd_train_item(cfg: Config, args) -> dict:
    from recsys_tpu.data.dataset import tokenize_items
    from recsys_tpu.data.vocab import StdVocab
    from recsys_tpu.train.simcse import train_simcse
    p = _paths(cfg)
    items, _, _ = _load_world(cfg)
    tensors = tokenize_items(items, StdVocab(), cfg.vocab)
    text_pretrain = None
    if cfg.item_tower.text_encoder == "pretrained":
        from recsys_tpu.data.text_pretrain import load_text_pretrain
        text_pretrain = load_text_pretrain(p["text_pretrain"])
    state = train_simcse(cfg, tensors, _mesh(cfg), p["item_ckpts"],
                         init_ckpt=getattr(args, "init_ckpt", None),
                         text_pretrain=text_pretrain)
    return {"steps": int(state.step), "ckpt_dir": p["item_ckpts"],
            "text_encoder": cfg.item_tower.text_encoder}


def cmd_vectorize(cfg: Config, args) -> dict:
    from recsys_tpu.data.dataset import tokenize_items
    from recsys_tpu.data.vocab import StdVocab
    from recsys_tpu.train.checkpoint import CheckpointStore
    from recsys_tpu.train.simcse import build_model, init_params, materialize_item_vectors
    import jax
    p = _paths(cfg)
    items, _, _ = _load_world(cfg)
    tensors = tokenize_items(items, StdVocab(), cfg.vocab)
    from recsys_tpu.data.vocab import StdVocab as SV
    model = build_model(cfg, SV().size, tensors["std"].shape[1])
    params = init_params(model, tensors, jax.random.PRNGKey(0))
    store = CheckpointStore(p["item_ckpts"], maximize=False)
    try:
        restored, entry = store.restore_best({"params": params})
        params = restored["params"]
    except FileNotFoundError:
        pass  # random-init fallback, reference behavior
    mat = materialize_item_vectors(cfg, params, tensors, _mesh(cfg), p["item_matrix"])
    return {"matrix": p["item_matrix"], "shape": list(mat.shape)}


def _best_epoch(history: list[dict]) -> dict:
    """Best epoch by Recall@100 (the reference's checkpoint-selection
    metric), falling back to the final epoch when it wasn't evaluated."""
    if not history:
        return {}
    if any("recall@100" in h for h in history):
        return max(history, key=lambda h: h.get("recall@100", 0.0))
    return history[-1]


def cmd_train_user(cfg: Config, args) -> dict:
    from recsys_tpu.train.checkpoint import load_array_with_ids, align_rows
    from recsys_tpu.train.sasrec import prepare_stage2, train_user_tower
    p = _paths(cfg)
    items, users, tx = _load_world(cfg)
    data = prepare_stage2(cfg, items, users, tx)
    pretrained = None
    try:
        mat, ids, _ = load_array_with_ids(p["item_matrix"])
        aligned, _ = align_rows(mat[1:], ids[1:], data["item_map"].ids, fill="random")
        pretrained = np.concatenate(
            [np.zeros((1, mat.shape[1]), np.float32), aligned])
    except FileNotFoundError:
        pass
    state, history, _ = train_user_tower(
        cfg, data, pretrained, _mesh(cfg), p["user_ckpts"],
        resume=getattr(args, "resume", False))
    return {"epochs": len(history), "best": _best_epoch(history),
            "final": history[-1] if history else {}}


def cmd_train_gnn(cfg: Config, args) -> dict:
    from recsys_tpu.train.gnn import (
        export_gnn_artifacts, gnn_propagation_check, graph_from_transactions,
        train_lightgcl)
    p = _paths(cfg)
    items, users, tx = _load_world(cfg)
    from recsys_tpu.data.etl import time_split
    train_tx, _, _ = time_split(tx, cfg.data.valid_days)
    user_ids = sorted(train_tx["user_id"].unique())
    item_ids = sorted(items["item_id"].astype(str))
    user_map = {u: r for r, u in enumerate(user_ids)}
    item_map = {i: r for r, i in enumerate(item_ids)}
    graph = graph_from_transactions(train_tx, user_map, item_map, cfg.gnn,
                                    cfg.data.seed)
    eu = np.array([user_map[u] for u in train_tx["user_id"]])
    ei = np.array([item_map[i] for i in train_tx["item_id"]])
    state, _ = train_lightgcl(cfg, graph, eu, ei, p["gnn_ckpts"],
                              resume=getattr(args, "resume", False),
                              fine_tune=getattr(args, "fine_tune", False))
    export_gnn_artifacts(state.params, graph, user_ids, item_ids, p["gnn_prefix"],
                         cfg.gnn.num_layers)
    return {"check": gnn_propagation_check(state.params, graph)}


def cmd_distill(cfg: Config, args) -> dict:
    from recsys_tpu.train.checkpoint import load_array_with_ids, save_array_with_ids
    from recsys_tpu.train.gnn import distilled_vectors, train_distill
    p = _paths(cfg)
    tu, uids, _ = load_array_with_ids(p["gnn_prefix"] + "_users")
    ti, ids, _ = load_array_with_ids(p["gnn_prefix"] + "_items")
    state, model = train_distill(cfg, tu, ti, p["gnn_ckpts"])
    out = distilled_vectors(state, model, ti)
    save_array_with_ids(p["distilled"], out, ids,
                        meta={"space": "gnn_cosine_distilled"})
    # BOTH sides pass through the student (the distill trains user-item
    # cos * exp(scale) against teacher dot — serving raw users against
    # distilled items is a pairing it never trained; that mismatch was
    # round 3's noise-floor GNN ensemble arm, VERDICT r3 weak #2)
    su = distilled_vectors(state, model, tu)
    save_array_with_ids(p["distilled_users"], su, uids,
                        meta={"space": "gnn_cosine_distilled"})
    from recsys_tpu.eval.gnn_eval import distill_fidelity
    fid = distill_fidelity(tu, ti, out, su)
    return {"distilled": p["distilled"], "shape": list(out.shape),
            "fidelity": fid}


def cmd_gnn_eval(cfg: Config, args) -> dict:
    """GNN standalone retrieval rows (raw dot — the reference's own
    protocol, `v1_evaluate_lightgcl.py:275-340`) + cosine/distilled
    variants + teacher-student distillation fidelity (VERDICT r3 item 4).
    Pure artifact consumer: needs gnn_{users,items} (train-gnn) and
    optionally gnn_distilled_{items,users} (distill)."""
    from recsys_tpu.eval.gnn_eval import distill_fidelity, standalone_rows
    from recsys_tpu.train.checkpoint import load_array_with_ids
    p = _paths(cfg)
    gu, gu_ids, _ = load_array_with_ids(p["gnn_prefix"] + "_users")
    gi, gi_ids, _ = load_array_with_ids(p["gnn_prefix"] + "_items")
    di = du = None
    try:
        di, _, _ = load_array_with_ids(p["distilled"])
        du, _, _ = load_array_with_ids(p["distilled_users"])
    except FileNotFoundError:
        pass
    with open(p["targets"]) as f:
        targets = json.load(f)
    out = standalone_rows(gu, list(gu_ids), gi, list(gi_ids), targets,
                          ks=cfg.user_train.eval_ks,
                          distilled_items=di, distilled_users=du)
    if di is not None:
        out["fidelity"] = distill_fidelity(gu, gi, di, du)
    with open(p["root"] + "/gnn_eval.json", "w") as f:
        json.dump(out, f, indent=1)
    return out


def cmd_ensemble_eval(cfg: Config, args) -> dict:
    """Fuse the two alive LEARNED retrievers at shape: the stage-2 tower
    (the ``eval_uvecs``/``eval_item_matrix`` sidecars `cmd_eval` persists)
    x the GNN (train-gnn artifacts, arm chosen by the measured
    gnn_eval.json rows), plus a three-arm variant that fuses the best
    two-arm list with the repurchase baseline. VERDICT r4 next-round
    item 4 — round 4 only ever fused hybrid x {gnn,repurchase,content};
    the architecturally interesting pairing (two learned retrievers with
    disjoint signal) was unmeasured. Reference analogue: the seq x GNN
    ensemble suite, `tower_code/mined_inference.py:797-1448`.

    Pure artifact consumer — no training, no tower forward: histories
    come from features_sequence.parquet, targets from targets_val.json.
    """
    from recsys_tpu.data.dataset import IdMap
    from recsys_tpu.data.etl import logq_from_item_features
    from recsys_tpu.eval.baselines import repurchase_topk
    from recsys_tpu.train import hybrid as H
    from recsys_tpu.train.checkpoint import load_array_with_ids
    import pandas as pd
    p = _paths(cfg)
    uvecs, uids, _ = load_array_with_ids(p["root"] + "/eval_uvecs")
    imat, iids, _ = load_array_with_ids(p["root"] + "/eval_item_matrix")
    item_map = IdMap([i for i in iids if i != "<pad>"])
    uids = [str(u) for u in uids]

    # -- GNN arm: eval-driven selection (same rule as cmd_train_hybrid) --
    gu, gu_ids, _ = load_array_with_ids(p["gnn_prefix"] + "_users")
    gi, gi_ids, _ = load_array_with_ids(p["gnn_prefix"] + "_items")
    gd = gd_ids = du = du_ids = None
    try:
        _gd, _gd_ids, _ = load_array_with_ids(p["distilled"])
        du, du_ids, _ = load_array_with_ids(p["distilled_users"])
        gd, gd_ids = _gd, _gd_ids  # set only when BOTH sides loaded — a
        # timeout between cmd_distill's two saves leaves items without
        # users, and a half-loaded pair must fall back to the raw arm
    except FileNotFoundError:
        pass
    arm = "distill_cos" if gd is not None else "gnn_dot"
    try:
        with open(p["root"] + "/gnn_eval.json") as f:
            ge = json.load(f)
        # only arms whose artifacts are actually loadable are candidates
        avail = ("gnn_dot", "gnn_cos") + (("distill_cos",)
                                          if gd is not None else ())
        ge_rows = {r: ge[r] for r in avail if r in ge}
        if ge_rows:
            key = next(k for k in ("recall@100", "recall@20")
                       if any(k in v for v in ge_rows.values()))
            arm = max(ge_rows, key=lambda r: ge_rows[r].get(key, 0.0))
    except (FileNotFoundError, json.JSONDecodeError, StopIteration):
        pass  # truncated sidecar / exotic eval_ks: keep the fallback arm
    if arm == "distill_cos":
        gnn_mat = H.align_gnn_to_catalog(gd, gd_ids, item_map)
        gu_aligned = H.align_gnn_users(du, du_ids, uids)
        normalize_arm = True
    else:
        gnn_mat = H.align_gnn_to_catalog(gi, gi_ids, item_map)
        gu_aligned = H.align_gnn_users(gu, gu_ids, uids)
        normalize_arm = (arm == "gnn_cos")
    if normalize_arm:
        gnn_mat = gnn_mat / np.clip(
            np.linalg.norm(gnn_mat, axis=-1, keepdims=True), 1e-12, None)
        gu_aligned = gu_aligned / np.clip(
            np.linalg.norm(gu_aligned, axis=-1, keepdims=True), 1e-12, None)

    # -- targets + histories from world artifacts ------------------------
    with open(p["targets"]) as f:
        targets = json.load(f)
    targets_idx = {u: {item_map.idx(i) for i in its} - {0}
                   for u, its in targets.items()}
    seqs = pd.read_parquet(f"{cfg.data.root}/features_sequence.parquet")
    seq_of = dict(zip(seqs["user_id"].astype(str), seqs["sequence"]))
    hists = [item_map.idx_array(seq_of.get(u, ())) for u in uids]
    feats = pd.read_parquet(f"{cfg.data.root}/features_item.parquet")
    logq = logq_from_item_features(feats, item_map.ids)

    # -- the three arms as (idx, scores) top-m models --------------------
    m = int(getattr(args, "pool", 0) or 1000)
    m = min(m, len(item_map))  # tiny catalogs: pool capped at catalog size
    mesh = _mesh(cfg)
    # stage-2 protocol: normalized items (cosine-on-catalog, the eval path)
    stage2 = H.topm_for_model(uvecs, imat, m, mesh=mesh, normalize_items=True)
    if gu_aligned.shape[1] != gnn_mat.shape[1]:
        raise SystemExit(f"gnn arm {arm}: user dim {gu_aligned.shape[1]} != "
                         f"item dim {gnn_mat.shape[1]}")
    gnn_model = H.topm_for_model(gu_aligned, gnn_mat, m, mesh=mesh,
                                 normalize_items=False)
    ks = cfg.user_train.eval_ks
    report = H.ensemble_report(stage2, gnn_model, uids, targets_idx, ks=ks)
    out = {"gnn_arm": arm, "m": m, "n_users": len(uids),
           "stage2_x_gnn": {k: (v if k.startswith("standalone") else
                                {"best_alpha": v["best_alpha"],
                                 "best": v["best"], "table": {
                                     str(a): r for a, r in v["table"].items()}})
                            for k, v in report.items()}}

    # -- three-arm: best fused list x repurchase -------------------------
    from recsys_tpu.eval.ensemble import count_mix_ensemble, rrf_ensemble, weighted_score_ensemble
    key = f"recall@{sorted(ks)[min(1, len(ks) - 1)]}"
    best_method = max(("count_mix", "weighted", "rrf"),
                      key=lambda mth: report[mth]["best"][key])
    ba = report[best_method]["best_alpha"]
    if best_method == "count_mix":
        fused = count_mix_ensemble(stage2[0], gnn_model[0], m, ba)
    elif best_method == "weighted":
        fused = weighted_score_ensemble(*stage2, *gnn_model, m, ba)
    else:
        fused = rrf_ensemble(stage2[0], gnn_model[0], m)
    rank_scores = -np.tile(np.arange(m, dtype=np.float32), (len(uids), 1))
    rep_idx = repurchase_topk(hists, logq, m)
    out["fused_x_repurchase"] = {
        "fused_from": {"method": best_method, "alpha": ba},
        **{k: (v if k.startswith("standalone") else
               {"best_alpha": v["best_alpha"], "best": v["best"]})
           for k, v in H.ensemble_report(
               (fused, rank_scores), (rep_idx, rank_scores),
               uids, targets_idx, ks=ks).items()}}
    # stage-2 x repurchase two-arm for the like-for-like comparison row
    out["stage2_x_repurchase"] = {
        k: (v if k.startswith("standalone") else
            {"best_alpha": v["best_alpha"], "best": v["best"]})
        for k, v in H.ensemble_report(
            stage2, (rep_idx, rank_scores), uids, targets_idx,
            ks=ks).items()}
    with open(p["root"] + "/ensemble_eval.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    return out


def cmd_train_reranker(cfg: Config, args) -> dict:
    from recsys_tpu.data.dataset import IdMap
    from recsys_tpu.data.etl import time_split
    from recsys_tpu.data.ranker_features import build_rank_features, import_interactions
    from recsys_tpu.train.checkpoint import load_array_with_ids
    from recsys_tpu.train.reranker import GBDTRanker, auc_score, train_dcn
    p = _paths(cfg)
    items, users, tx = _load_world(cfg)
    train_tx, valid_tx, _ = time_split(tx, cfg.data.valid_days)
    mat, ids, _ = load_array_with_ids(p["item_matrix"])
    item_map = IdMap(ids[1:])
    rng = np.random.default_rng(cfg.data.seed)
    # user vector = mean of purchased item vectors (two-tower stand-in when
    # the user tower hasn't been trained yet)
    uvecs = {}
    for uid, g in train_tx.groupby("user_id"):
        rows = [item_map.idx(i) for i in g["item_id"]]
        uvecs[uid] = mat[[r for r in rows if r > 0]].mean(0) if rows else mat[0]
    if cfg.reranker.negative_source == "candidates":
        from recsys_tpu.data.ranker_features import import_interactions_candidates

        uids, iidx, labels, groups = import_interactions_candidates(
            train_tx.tail(20000), uvecs, mat, item_map, rng,
            cfg.reranker.neg_per_pos, cfg.reranker.candidate_top_k)
    else:
        uids, iidx, labels, groups = import_interactions(
            train_tx.tail(20000), len(item_map), item_map, rng,
            cfg.reranker.neg_per_pos)
    ifeats = pd.read_parquet(p["item_feats"]).set_index("item_id")
    pop = np.zeros(len(mat), np.float32)
    price = np.zeros(len(mat), np.float32)
    for iid, r in zip(item_map.ids, range(1, len(mat))):
        if iid in ifeats.index:
            pop[r] = ifeats.loc[iid, "pop_1m_log"]
            price[r] = ifeats.loc[iid, "avg_item_price_log"]
    u_arr = np.stack([uvecs.get(u, mat[0]) for u in uids])
    i_arr = mat[iidx]
    um = np.zeros((len(uids), 3), np.float32)
    im = np.stack([pop[iidx], price[iidx]], axis=1)
    X = build_rank_features(u_arr, i_arr, um, im)
    y = labels
    # split on a group boundary so pairwise groups stay intact
    split = int(0.8 * len(y))
    if split < len(groups):
        split -= int(np.sum(groups[:split] == groups[split]))
    gbdt = GBDTRanker(iterations=getattr(args, "iterations", None) or 200).fit(
        X[:split], y[:split])
    gbdt_auc = gbdt.auc(X[split:], y[split:])
    _, _, predict = train_dcn(cfg, X[:split], y[:split], groups=groups[:split])
    dcn_auc = auc_score(y[split:], predict(X[split:]))
    gbdt.save(f"{p['root']}/reranker_gbdt.pkl")
    return {"gbdt_auc": round(gbdt_auc, 4), "dcn_auc": round(dcn_auc, 4),
            "negative_source": cfg.reranker.negative_source,
            "dcn_loss": cfg.reranker.loss,
            "examples": int(len(y))}


def cmd_eval(cfg: Config, args) -> dict:
    from recsys_tpu.train.checkpoint import CheckpointStore, load_array_with_ids, align_rows
    from recsys_tpu.train.sasrec import (
        evaluate_stage2, init_stage2_params, make_stage2_optimizer,
        make_stage2_step, prepare_stage2, _slice)
    from recsys_tpu.train.state import TrainState
    import jax
    p = _paths(cfg)
    items, users, tx = _load_world(cfg)
    data = prepare_stage2(cfg, items, users, tx)
    mat, ids, _ = load_array_with_ids(p["item_matrix"])
    aligned, _ = align_rows(mat[1:], ids[1:], data["item_map"].ids, fill="random")
    pretrained = np.concatenate([np.zeros((1, mat.shape[1]), np.float32), aligned])
    n = data["tensors"]["input_ids"].shape[0]
    bs = min(cfg.user_train.batch_size, max(n - n % 8, 8))
    sample = _slice(data["tensors"], np.arange(min(bs, n)))
    params, models = init_stage2_params(cfg, len(data["item_map"]) + 1,
                                        pretrained, jax.random.PRNGKey(0), sample)
    store = CheckpointStore(p["user_ckpts"], maximize=True)
    try:
        tmpl = TrainState.create(params, make_stage2_optimizer(
            cfg, params, max(n // bs, 1)))
        restored, _entry = store.restore_best(tmpl)
        params = restored.params
    except FileNotFoundError:
        pass  # random-init fallback, reference behavior
    _, uv_fn = make_stage2_step(cfg, models, data["side"], data["logq"])
    metrics = evaluate_stage2(cfg, params, uv_fn, data, _mesh(cfg), bs)
    from recsys_tpu.eval.baselines import baseline_report, blend_sweep
    from recsys_tpu.train.sasrec import collect_user_vectors
    from recsys_tpu.eval.recall import (bootstrap_mean_ci, paired_delta_ci,
                                        target_rows)
    tens = data["tensors"]
    ks = sorted(cfg.user_train.eval_ks)
    k_primary = ks[min(1, len(ks) - 1)]
    # ALL downstream eval work runs over target users only (metric-identical:
    # recall_at_ks drops target-less users from the denominator anyway). At
    # the H&M shape this matters enormously — 1.37M total vs ~218k target
    # users; the content-profile baseline alone over all users would be
    # ~18 TFLOPs of host matmul on 2 vCPUs, and the full-user host score
    # matrix is ~75 GB at 200k users x 47k items.
    rows = target_rows(tens["user_ids"], data["targets_idx"])
    sub = {"user_ids": [tens["user_ids"][r] for r in rows],
           "input_ids": tens["input_ids"][rows],
           "target_ids": tens["target_ids"][rows]}
    metrics["baselines"] = baseline_report(
        sub, data["logq"], data["targets_idx"],
        ks=cfg.user_train.eval_ks, item_matrix=pretrained,
        per_user_k=k_primary)
    base_pu = metrics["baselines"].pop("_per_user")
    uvecs, uids = collect_user_vectors(cfg, params, uv_fn, data, _mesh(cfg),
                                       bs, rows=rows)
    # persist the eval-user vectors + trained item matrix so post-hoc
    # analyses (rerank-eval, blend variants) rerun host-side without
    # re-touching the chip (sidecar carries the row ids)
    from recsys_tpu.train.checkpoint import save_array_with_ids
    save_array_with_ids(p["root"] + "/eval_uvecs", uvecs, list(uids))
    save_array_with_ids(p["root"] + "/eval_item_matrix",
                        np.asarray(params["item"]["item_matrix"]),
                        list(data["item_map"].ids))
    hist = np.concatenate([tens["input_ids"][rows],
                           tens["target_ids"][rows][:, -1:]], 1)
    blend = blend_sweep(uvecs, np.asarray(params["item"]["item_matrix"]),
                        data["logq"], hist, uids, data["targets_idx"],
                        ks=cfg.user_train.eval_ks, per_user_k=k_primary)
    blend_pu = blend.pop("_per_user")
    metrics["blend"] = {"best": blend["best"],
                        "best_metrics": blend["best_metrics"],
                        "model_only": blend["table"].get("a0.0_b0.0")}
    # paired bootstrap significance at the primary k: does the learned stack
    # beat the no-ML floors per-user, not just on the headline mean?
    # (VERDICT r1 weak #1: at 47k items the blend tied repurchase; a paired
    # CI makes "learned beats trivial" an auditable claim, not a point diff.)
    model_pu = blend_pu.get("model_only")  # only present when the swept
    # grid includes the a0.0_b0.0 combo — skip model rows otherwise
    if base_pu["uids"] == blend_pu["uids"]:
        rep, pop = base_pu["repurchase"], base_pu["popularity"]
        sig = {"k": k_primary,
               "blend_best": bootstrap_mean_ci(blend_pu["best"]),
               "repurchase": bootstrap_mean_ci(rep),
               "blend_vs_repurchase": paired_delta_ci(blend_pu["best"], rep)}
        if model_pu is not None:
            sig["model_only"] = bootstrap_mean_ci(model_pu)
            sig["model_vs_repurchase"] = paired_delta_ci(model_pu, rep)
            sig["model_vs_popularity"] = paired_delta_ci(model_pu, pop)
            if "content_profile" in base_pu:
                sig["model_vs_content_profile"] = paired_delta_ci(
                    model_pu, base_pu["content_profile"])
        metrics["significance"] = sig
    # season-aware blend ablation: swap the GLOBAL popularity prior for the
    # eval-window season's prior (etl.seasonal_logq) — the season-ablation
    # row (with/without) the serving path rides on
    from recsys_tpu.data.etl import seasonal_logq, time_split
    from recsys_tpu.data.synthetic import SEASONS, season_of_day
    train_tx, _, split_day = time_split(tx, cfg.data.valid_days)
    eval_season = str(np.asarray(SEASONS)[season_of_day(
        split_day, cfg.data.season_cycle_days)])
    slq = seasonal_logq(train_tx, data["item_map"].ids, eval_season)
    if slq is not None:
        sblend = blend_sweep(uvecs, np.asarray(params["item"]["item_matrix"]),
                             slq, hist, uids, data["targets_idx"],
                             ks=cfg.user_train.eval_ks)
        metrics["blend_seasonal"] = {
            "season": eval_season, "best": sblend["best"],
            "best_metrics": sblend["best_metrics"]}
    with open(p["eval"], "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


def cmd_train_hybrid(cfg: Config, args) -> dict:
    """Hybrid content+GNN tower over the exported artifacts, then the full
    ensemble report (sequence vs distilled-GNN retrieval: standalone +
    count-mix / weighted / RRF alpha sweeps)."""
    import jax
    from recsys_tpu.train.checkpoint import load_array_with_ids, align_rows
    from recsys_tpu.train import hybrid as H
    from recsys_tpu.train.sasrec import prepare_stage2, _slice
    p = _paths(cfg)
    items, users, tx = _load_world(cfg)
    data = prepare_stage2(cfg, items, users, tx)
    mat, ids, _ = load_array_with_ids(p["item_matrix"])
    aligned, _ = align_rows(mat[1:], ids[1:], data["item_map"].ids, fill="random")
    content = np.concatenate([np.zeros((1, mat.shape[1]), np.float32), aligned])
    gi, gi_ids, _ = load_array_with_ids(p["gnn_prefix"] + "_items")
    gnn_items = H.align_gnn_to_catalog(gi, gi_ids, data["item_map"])
    gu, gu_ids, _ = load_array_with_ids(p["gnn_prefix"] + "_users")
    uids = data["tensors"]["user_ids"]
    gnn_users = H.align_gnn_users(gu, gu_ids, uids)
    mesh = _mesh(cfg)
    state, history, (model, uv_fn, im_fn) = H.train_hybrid(
        cfg, data, content, gnn_items, gnn_users, mesh, p["root"] + "/ckpt_hybrid")
    # persist the adapted item matrix for the serving layer (the retrieval
    # matrix behind serve.mode=blend/rerank with hybrid vectors)
    from recsys_tpu.train.checkpoint import save_array_with_ids
    save_array_with_ids(p["root"] + "/hybrid_item_matrix",
                        np.asarray(jax.jit(im_fn)(state.params)),
                        list(data["item_map"].ids),
                        meta={"source": "train-hybrid best checkpoint"})

    if not cfg.user_train.hybrid_report:
        # recipe-comparison arm: epoch curve + best ckpt + item matrix
        # only (the full ensemble/blend report costs ~70 min of host
        # fuser time at shape)
        return {"hybrid_best": _best_epoch(history),
                "hybrid_final": history[-1] if history else {},
                "hybrid_history": history, "report": "skipped"}

    # ensemble report: hybrid retrieval vs distilled-GNN retrieval
    import jax.numpy as jnp
    tensors = data["tensors"]
    # ensemble scoring over target users only (recall drops the rest anyway)
    from recsys_tpu.eval.recall import target_rows
    rows = target_rows(uids, data["targets_idx"])
    n = len(rows)
    bs = min(cfg.user_train.batch_size, max(n - n % 8, 8))
    uvecs = []
    for s in range(0, n - n % bs, bs):
        idx = rows[s:s + bs]
        batch = {k: jnp.asarray(v[idx]) for k, v in tensors.items() if k != "user_ids"}
        uvecs.append(np.asarray(uv_fn(state.params, batch,
                                      jnp.asarray(gnn_users[idx]))))
    uvecs = np.concatenate(uvecs) if uvecs else np.zeros((0, 128), np.float32)
    user_ids = [uids[r] for r in rows[: len(uvecs)]]
    m = min(1000, len(data["item_map"]))
    seq_model = H.topm_for_model(uvecs, np.asarray(im_fn(state.params)), m,
                                 normalize_items=False)
    # GNN arm pairing, EVAL-DRIVEN when gnn-eval ran (gnn_eval.json):
    # pick the best-measured retrieval row among raw-dot (the reference's
    # protocol), raw-cosine, and distilled student x student. Rationale:
    # at the H&M shape the distill failed silently (fidelity 0.034) while
    # raw cosine retrieved 14.2%@100 — hard-wiring any one pairing ships
    # the wrong arm on some worlds (VERDICT r3 weak #2).
    du = du_ids = None
    gd = gd_ids = None
    try:
        gd, gd_ids, _ = load_array_with_ids(p["distilled"])
        du, du_ids, _ = load_array_with_ids(p["distilled_users"])
    except FileNotFoundError:
        pass
    arm = "distill_cos" if gd is not None else "gnn_dot"
    try:
        with open(p["root"] + "/gnn_eval.json") as f:
            ge = json.load(f)
        ge_rows = {r: ge[r] for r in ("gnn_dot", "gnn_cos", "distill_cos")
                   if r in ge}
        if ge_rows:
            key = next(k for k in ("recall@100", "recall@20")
                       if any(k in v for v in ge_rows.values()))
            arm = max(ge_rows, key=lambda r: ge_rows[r].get(key, 0.0))
    except FileNotFoundError:
        pass
    if arm == "distill_cos" and gd is not None:
        gnn_mat = H.align_gnn_to_catalog(gd, gd_ids, data["item_map"])
        gu_aligned = H.align_gnn_users(du, du_ids, user_ids)
        normalize_arm = True
    else:
        gnn_mat = gnn_items
        gu_aligned = H.align_gnn_users(gu, gu_ids, user_ids)
        normalize_arm = (arm == "gnn_cos")
    if normalize_arm:
        gnn_mat = gnn_mat / np.clip(
            np.linalg.norm(gnn_mat, axis=-1, keepdims=True), 1e-12, None)
        gu_aligned = gu_aligned / np.clip(
            np.linalg.norm(gu_aligned, axis=-1, keepdims=True), 1e-12, None)
    # score users against the GNN item space via their GNN embedding
    if gu_aligned.shape[1] != gnn_mat.shape[1]:
        gnn_model = seq_model  # degenerate fallback: dims mismatch
        arm = "degenerate_seq"
    else:
        gnn_model = H.topm_for_model(gu_aligned, gnn_mat, m, normalize_items=False)
    report = H.ensemble_report(seq_model, gnn_model, user_ids,
                               data["targets_idx"], ks=cfg.user_train.eval_ks)
    # fuse lists that are ALIVE at this shape (VERDICT r3 item 7): the
    # hybrid list x the repurchase list and x the content-profile list —
    # retrievers with real standalone recall on retail-shaped data, unlike
    # the round-3 GNN arm. Pseudo-scores are -rank (the fusers min-max
    # normalize over the union, so only the ordering matters).
    from recsys_tpu.eval.baselines import content_profile_topk, repurchase_topk
    rows_used0 = rows[: len(uvecs)]
    hist0 = np.concatenate([tensors["input_ids"][rows_used0],
                            tensors["target_ids"][rows_used0][:, -1:]], 1)
    m_alive = seq_model[0].shape[1]
    rank_scores = -np.tile(np.arange(m_alive, dtype=np.float32),
                           (len(user_ids), 1))
    rep_idx = repurchase_topk([hist0[r] for r in range(len(hist0))],
                              data["logq"], m_alive)
    report_alive = {
        "hybrid_x_repurchase": H.ensemble_report(
            seq_model, (rep_idx, rank_scores), user_ids,
            data["targets_idx"], ks=cfg.user_train.eval_ks)}
    cp_idx = content_profile_topk([hist0[r] for r in range(len(hist0))],
                                  content, m_alive)
    report_alive["hybrid_x_content"] = H.ensemble_report(
        seq_model, (cp_idx, rank_scores), user_ids,
        data["targets_idx"], ks=cfg.user_train.eval_ks)
    # serving blend over the hybrid vectors (popularity prior + seen bonus,
    # same sweep the stage-2 eval runs)
    from recsys_tpu.eval.baselines import blend_sweep, repurchase_topk
    from recsys_tpu.eval.recall import (bootstrap_mean_ci, paired_delta_ci,
                                        recall_per_user)
    rows_used = rows[: len(uvecs)]
    hist = np.concatenate([tensors["input_ids"][rows_used],
                           tensors["target_ids"][rows_used][:, -1:]], 1)
    ks = sorted(cfg.user_train.eval_ks)
    k_primary = ks[min(1, len(ks) - 1)]
    blend = blend_sweep(uvecs, np.asarray(im_fn(state.params)), data["logq"],
                        hist, user_ids, data["targets_idx"],
                        ks=cfg.user_train.eval_ks, per_user_k=k_primary)
    blend_pu = blend.pop("_per_user")
    out = {"hybrid_best": _best_epoch(history),
           "hybrid_final": history[-1] if history else {},
           "hybrid_history": history,  # per-epoch curve (recipe experiments)
           "blend": {"best": blend["best"],
                     "best_metrics": blend["best_metrics"]},
           "gnn_arm": arm,  # which GNN pairing the ensemble scored with
           "ensemble": {k: (v if k.startswith("standalone") else
                            {"best_alpha": v["best_alpha"], "best": v["best"]})
                        for k, v in report.items()},
           "ensemble_alive": {
               arm: {k: (v if k.startswith("standalone") else
                         {"best_alpha": v["best_alpha"], "best": v["best"]})
                     for k, v in rep.items()}
               for arm, rep in report_alive.items()}}
    # THE headline significance test: does the hybrid tower itself (not just
    # the popularity/seen blend) beat the repurchase floor per-user?
    rep_idx = repurchase_topk([hist[r] for r in range(len(hist))],
                              data["logq"], k_primary)
    rep_vals, rep_uids = recall_per_user(rep_idx, user_ids,
                                         data["targets_idx"], k_primary)
    hybrid_pu = blend_pu.get("model_only")  # absent if the grid omits a0.0_b0.0
    if rep_uids == blend_pu["uids"]:
        out["significance"] = {
            "k": k_primary,
            "blend_best": bootstrap_mean_ci(blend_pu["best"]),
            "repurchase": bootstrap_mean_ci(rep_vals),
            "blend_vs_repurchase": paired_delta_ci(blend_pu["best"],
                                                   rep_vals)}
        if hybrid_pu is not None:
            out["significance"]["hybrid"] = bootstrap_mean_ci(hybrid_pu)
            out["significance"]["hybrid_vs_repurchase"] = paired_delta_ci(
                hybrid_pu, rep_vals)
    with open(p["root"] + "/ensemble_report.json", "w") as f:
        json.dump(report, f, indent=1, default=str)
    return out


def cmd_rerank_eval(cfg: Config, args) -> dict:
    """Full-recall eval of the PRODUCTION ranking pipeline: candidate
    union (tower cosine / seen / popularity) -> pair features -> GBDT
    rerank -> Recall@k, with a leakage-safe inner-split training window
    (`eval/rerank_eval.py`). The learned-model answer to the repurchase
    heuristic a cosine retriever cannot encode (reference analogue: the
    CatBoost ranker it trains but never recall-evaluates,
    `tower_code/ranker_model_train.py`)."""
    import jax
    from recsys_tpu.config import _replace_tree
    from recsys_tpu.data.etl import time_split
    from recsys_tpu.eval import rerank_eval as R
    from recsys_tpu.eval.baselines import popularity_ranking, repurchase_topk
    from recsys_tpu.eval.recall import (bootstrap_mean_ci, paired_delta_ci,
                                        recall_at_ks, recall_per_user,
                                        target_rows)
    from recsys_tpu.train.checkpoint import (CheckpointStore,
                                             load_array_with_ids, align_rows)
    from recsys_tpu.train.reranker import GBDTRanker
    from recsys_tpu.train.sasrec import (collect_user_vectors,
                                         init_stage2_params,
                                         make_stage2_optimizer,
                                         make_stage2_step, prepare_stage2,
                                         _slice)
    from recsys_tpu.train.state import TrainState

    p = _paths(cfg)
    items, users, tx = _load_world(cfg)
    data = prepare_stage2(cfg, items, users, tx)
    item_map = data["item_map"]
    N1 = len(item_map) + 1
    ks = sorted(cfg.user_train.eval_ks)
    k_primary = ks[min(1, len(ks) - 1)]
    max_k = max(ks)

    tens = data["tensors"]
    n = tens["input_ids"].shape[0]
    bs = min(cfg.user_train.batch_size, max(n - n % 8, 8))
    vectors = getattr(args, "vectors", None) or "stage2"
    mat, mids, _ = load_array_with_ids(p["item_matrix"])
    aligned, _ = align_rows(mat[1:], mids[1:], item_map.ids, fill="random")
    pretrained = np.concatenate([np.zeros((1, mat.shape[1]), np.float32),
                                 aligned])
    if vectors == "hybrid":
        # pools from the HYBRID tower's vectors (its checkpoint + the GNN
        # artifacts must exist — i.e. after train-hybrid)
        import jax.numpy as jnp
        from recsys_tpu.train import hybrid as H
        gi, gi_ids, _ = load_array_with_ids(p["gnn_prefix"] + "_items")
        gnn_items = H.align_gnn_to_catalog(gi, gi_ids, item_map)
        gu, gu_ids, _ = load_array_with_ids(p["gnn_prefix"] + "_users")
        h_params, h_uv, h_im = H.restore_hybrid(
            cfg, data, pretrained, gnn_items, p["root"] + "/ckpt_hybrid")
        item_mat = np.asarray(jax.jit(h_im)(h_params))
        from recsys_tpu.train.checkpoint import save_array_with_ids
        save_array_with_ids(p["root"] + "/hybrid_item_matrix", item_mat,
                            list(item_map.ids),
                            meta={"source": "rerank-eval hybrid restore"})

        def collect_vecs(dat, rows_):
            tns = dat["tensors"]
            gus = H.align_gnn_users(gu, gu_ids, tns["user_ids"])
            n_ = len(rows_)
            bs_ = min(cfg.user_train.batch_size, max(n_ - n_ % 8, 8))
            vecs, origs = [], []
            for s in range(0, n_, bs_):
                idx = np.asarray(rows_[s:min(s + bs_, n_)])
                origs.append(len(idx))
                if origs[-1] < bs_:
                    idx = np.concatenate([idx, np.zeros(bs_ - origs[-1],
                                                        np.int64)])
                b = {k: jnp.asarray(v[idx]) for k, v in tns.items()
                     if k != "user_ids"}
                vecs.append(h_uv(h_params, b, jnp.asarray(gus[idx])))
            if not vecs:
                return np.zeros((0, cfg.user_tower.d_model), np.float32)
            return np.concatenate([np.asarray(v)[:o]
                                   for v, o in zip(vecs, origs)])
    else:
        # stage-2 tower restore (identical to cmd_eval)
        sample_b = _slice(tens, np.arange(min(bs, n)))
        params, models = init_stage2_params(cfg, N1, pretrained,
                                            jax.random.PRNGKey(0), sample_b)
        store = CheckpointStore(p["user_ckpts"], maximize=True)
        try:
            tmpl = TrainState.create(params, make_stage2_optimizer(
                cfg, params, max(n // bs, 1)))
            restored, _e = store.restore_best(tmpl)
            params = restored.params
        except FileNotFoundError:
            pass
        item_mat = np.asarray(params["item"]["item_matrix"])

        def collect_vecs(dat, rows_):
            _, uvf = make_stage2_step(cfg, models, dat["side"], dat["logq"])
            v, _u = collect_user_vectors(cfg, params, uvf, dat, _mesh(cfg),
                                         min(cfg.user_train.batch_size,
                                             max(len(rows_) - len(rows_) % 8,
                                                 8)), rows=np.asarray(rows_))
            return v

    rows = target_rows(tens["user_ids"], data["targets_idx"])
    uids = [tens["user_ids"][r] for r in rows]
    uvecs = None
    if vectors == "stage2":
        # reuse the vectors cmd_eval persisted when they match this eval set
        try:
            arr, aids, _ = load_array_with_ids(p["root"] + "/eval_uvecs")
            if list(aids) == [str(u) for u in uids]:
                uvecs = arr
        except FileNotFoundError:
            pass
    if uvecs is None:
        uvecs = collect_vecs(data, rows)

    pool_size = int(getattr(args, "pool", None) or 512)
    m_cos = min(int(getattr(args, "m_cos", None) or 300), N1 - 2)
    m_pop = min(int(getattr(args, "m_pop", None) or 100), N1 - 2)
    train_tx, _, split_day = time_split(tx, cfg.data.valid_days)
    price = np.zeros(N1, np.float32)
    ifeats = pd.read_parquet(p["item_feats"]).set_index("item_id")
    for iid, r in zip(item_map.ids, range(1, N1)):
        if iid in ifeats.index:
            price[r] = ifeats.loc[iid, "avg_item_price_log"]

    def side_of(window_tx, uid_list, logq, uv, now_day):
        """Pools + features + histories for one user set / time window."""
        uid_to_row = {u: r for r, u in enumerate(uid_list)}
        sub = window_tx[window_tx["user_id"].isin(uid_to_row)]
        urow = sub["user_id"].map(uid_to_row).to_numpy(np.int64)
        iidx = np.array([item_map.idx(i) for i in sub["item_id"]], np.int64)
        day = sub["day"].to_numpy(np.int64)
        order = np.lexsort((day, urow))
        urow, iidx, day = urow[order], iidx[order], day[order]
        hists = [np.empty(0, np.int64) for _ in uid_list]
        if len(urow):
            starts = np.flatnonzero(
                np.concatenate([[True], urow[1:] != urow[:-1]]))
            bounds = np.append(starts, len(urow))
            for j, s in enumerate(starts):
                hists[urow[s]] = iidx[s:bounds[j + 1]]
        keys, counts, last = R.pair_index(urow, iidx, day, N1)
        cos_idx = R.cosine_topm(uv, item_mat, m_cos)
        pop = popularity_ranking(logq, m_pop)
        pools, flags = R.build_pools(cos_idx, hists, pop, pool_size)
        hist_lens = np.array([len(h) for h in hists], np.int64)
        user_last = np.full(len(uid_list), -1, np.int64)
        if len(urow):
            np.maximum.at(user_last, urow, day)
        psum = np.zeros(len(uid_list), np.float64)
        if len(urow):
            np.add.at(psum, urow, price[iidx])
        user_price = (psum / np.maximum(hist_lens, 1)).astype(np.float32)
        feats = R.pool_features(pools, flags, uv, item_mat, logq, keys,
                                counts, last, now_day, N1, price,
                                hist_lens=hist_lens, user_last_day=user_last,
                                user_price=user_price)
        return pools, feats, hists

    # ---- inner split: train the ranker strictly inside the train window
    cfg2 = _replace_tree(cfg, {"data": {"valid_days": cfg.data.valid_days * 2}})
    data2 = prepare_stage2(cfg2, items, users, tx)
    split2 = data2["split_day"]
    lab_tx = tx[(tx["day"] >= split2) & (tx["day"] < split_day)]
    inner_targets: dict = {}
    for u, i in zip(lab_tx["user_id"], lab_tx["item_id"]):
        ii = item_map.idx(i)
        if ii > 0:
            inner_targets.setdefault(u, set()).add(ii)
    tens2 = data2["tensors"]
    row2_of = {u: r for r, u in enumerate(tens2["user_ids"])}
    cand = sorted(u for u in inner_targets if u in row2_of)
    n_sample = int(getattr(args, "sample", None) or 20000)
    rng = np.random.default_rng(cfg.data.seed)
    if len(cand) > n_sample:
        cand = [cand[j] for j in rng.choice(len(cand), n_sample, replace=False)]
    rows2 = np.array([row2_of[u] for u in cand], np.int64)
    uv2 = collect_vecs(data2, rows2)
    inner_tx = tx[tx["day"] < split2]
    pools2, feats2, _h2 = side_of(inner_tx, cand, data2["logq"], uv2, split2)
    y2 = np.zeros(pools2.shape, np.float32)
    for r, u in enumerate(cand):
        tgt = inner_targets[u]
        y2[r] = np.isin(pools2[r], list(tgt))
    # user-level 90/10 split: train the rankers on the first 90% of the
    # inner users, hold the rest out for AUC / importances (pairs from one
    # user never straddle the split)
    n_tr = max(int(0.9 * len(cand)), 1)

    def _flat(f, pl, yy):
        keep = pl.reshape(-1) != 0
        return (f.reshape(-1, f.shape[-1])[keep], yy.reshape(-1)[keep])

    X, y = _flat(feats2[:n_tr], pools2[:n_tr], y2[:n_tr])
    X_val, y_val = _flat(feats2[n_tr:], pools2[n_tr:], y2[n_tr:])
    ranker = GBDTRanker(iterations=int(getattr(args, "iterations", None)
                                       or 200)).fit(X, y)
    ranker.save(p["root"] + f"/rerank_gbdt_{vectors}.pkl")
    from recsys_tpu.train.reranker import auc_score, train_dcn
    feature_names = R.FEATURE_NAMES
    gbdt_auc = importances = None
    if len(X_val) and 0 < y_val.sum() < len(y_val):
        # cap the held-out slice for the permutation passes
        if len(X_val) > 200_000:
            sel = np.random.default_rng(0).choice(len(X_val), 200_000,
                                                  replace=False)
            X_val, y_val = X_val[sel], y_val[sel]
        gbdt_auc = round(auc_score(y_val, ranker.predict_proba(X_val)), 4)
        rngp = np.random.default_rng(1)
        importances = {}
        for j, nm in enumerate(feature_names):
            deltas = []
            for _ in range(3):
                Xp = X_val.copy()
                rngp.shuffle(Xp[:, j])
                deltas.append(gbdt_auc -
                              auc_score(y_val, ranker.predict_proba(Xp)))
            importances[nm] = round(float(np.mean(deltas)), 4)
    # neural arm (DCN-v2): same features, subsampled train rows + short
    # schedule (the arm answers "is the learned-ranker story GBDT-only?",
    # not "what is the best neural ranker")
    dcn_auc = dcn_scorer = None
    if len(X_val) and 0 < y_val.sum() < len(y_val):
        from recsys_tpu.config import _replace_tree as _rt
        sel = (np.random.default_rng(2).choice(len(X), 2_000_000,
                                               replace=False)
               if len(X) > 2_000_000 else np.arange(len(X)))
        cfg_dcn = _rt(cfg, {"reranker": {"epochs": 3, "loss": "bce"}})
        _, _, dcn_scorer = train_dcn(cfg_dcn, X[sel], y[sel])
        dcn_auc = round(auc_score(y_val, dcn_scorer(X_val)), 4)

    # ---- real validation week, deployment regime
    pools, feats, hists = side_of(train_tx, uids, data["logq"], uvecs,
                                  split_day)
    topk = R.rerank_topk(ranker, feats, pools, max_k)
    metrics = recall_at_ks(topk, uids, data["targets_idx"], ks)
    ceiling = recall_at_ks(pools, uids, data["targets_idx"], [pool_size])
    # repurchase over the SAME full histories the ranker's features see
    rep_idx = repurchase_topk(hists, data["logq"], k_primary)
    rep_vals, rep_uids = recall_per_user(rep_idx, uids, data["targets_idx"],
                                         k_primary)
    rr_vals, rr_uids = recall_per_user(topk, uids, data["targets_idx"],
                                       k_primary)
    out = {"reranked": metrics,
           "pool_ceiling": {f"recall@{pool_size}":
                            ceiling[f"recall@{pool_size}"]},
           # at k >= pool_size the "reranker" is just the candidate
           # generator — recall@k == pool ceiling by construction
           # (VERDICT r3 weak #3: label these rows, don't imply ranking)
           "pool_capped_ks": [k for k in ks if k >= pool_size],
           "gbdt_auc": gbdt_auc, "dcn_auc": dcn_auc,
           "gbdt_importances_auc_drop": importances,
           "pool_arms": {"m_cos": m_cos, "m_pop": m_pop},
           "train_users": len(cand), "holdout_users": len(cand) - n_tr,
           "pool_size": pool_size,
           "vectors": vectors, "inner_split_day": int(split2)}
    if dcn_scorer is not None:
        class _S:  # rerank_topk expects a .predict_proba
            predict_proba = staticmethod(dcn_scorer)
        out["reranked_dcn"] = recall_at_ks(
            R.rerank_topk(_S, feats, pools, max_k), uids,
            data["targets_idx"], ks)
    if rep_uids == rr_uids:
        out["significance"] = {
            "k": k_primary,
            "reranked": bootstrap_mean_ci(rr_vals),
            "repurchase_full_hist": bootstrap_mean_ci(rep_vals),
            "reranked_vs_repurchase": paired_delta_ci(rr_vals, rep_vals)}
    with open(p["root"] + f"/rerank_eval_{vectors}.json", "w") as f:
        json.dump(out, f, indent=1)
    return out


def cmd_serve(cfg: Config, args) -> dict:
    from recsys_tpu.serve.app import build_app_context, model_vectorizer
    from recsys_tpu.serve.server import make_server
    vec = None
    if getattr(args, "model_backed", False):
        import jax
        from recsys_tpu.data.dataset import tokenize_items
        from recsys_tpu.data.vocab import StdVocab
        from recsys_tpu.train.checkpoint import CheckpointStore
        from recsys_tpu.train.simcse import build_model, init_params
        p = _paths(cfg)
        items, _, _ = _load_world(cfg)
        tensors = tokenize_items(items, StdVocab(), cfg.vocab)
        model = build_model(cfg, StdVocab().size, tensors["std"].shape[1])
        params = init_params(model, tensors, jax.random.PRNGKey(0))
        try:
            restored, _ = CheckpointStore(p["item_ckpts"], maximize=False) \
                .restore_best({"params": params})
            params = restored["params"]
        except FileNotFoundError:
            pass
        vec = model_vectorizer(cfg, params)
    ctx = build_app_context(cfg, vec)
    # serving assets for the blend/rerank recipes (serve/recommend.py);
    # --vectors picks which campaign matrix/ranker backs them
    vectors = getattr(args, "vectors", None) or "stage2"
    try:
        from recsys_tpu.serve.recommend import load_recommend_assets
        ctx.rec_assets = load_recommend_assets(cfg, vectors)
        print(f"serving assets: {vectors} matrix"
              + (" + rerank GBDT" if ctx.rec_assets.ranker else ""))
    except FileNotFoundError:
        print("serving assets: none (blend/rerank modes fall back to cosine)")
    if getattr(args, "model_backed", False):
        # user-side symmetry: attach a trained tower as the user vectorizer
        # per serve.user_backend — hybrid tower (the measured-best backend)
        # when its checkpoint + GNN artifacts exist, else the stage-2
        # SASRec tower, else the history-mean fallback
        import jax
        from recsys_tpu.train.checkpoint import (CheckpointStore, align_rows,
                                                 load_array_with_ids)
        from recsys_tpu.train.sasrec import (
            _slice, init_stage2_params, make_stage2_optimizer, prepare_stage2)
        from recsys_tpu.train.state import TrainState

        items, users, tx = _load_world(cfg)
        data = prepare_stage2(cfg, items, users, tx)
        tensors = data["tensors"]
        n = tensors["input_ids"].shape[0]
        bs = min(cfg.user_train.batch_size, max(n - n % 8, 8))
        backend = cfg.serve.user_backend
        attached = None
        if backend in ("auto", "hybrid"):
            try:
                from recsys_tpu.serve.app import hybrid_user_vectorizer
                from recsys_tpu.train import hybrid as H

                mat, mids, _ = load_array_with_ids(p["item_matrix"])
                aligned, _ = align_rows(mat[1:], mids[1:],
                                        data["item_map"].ids, fill="random")
                content = np.concatenate(
                    [np.zeros((1, mat.shape[1]), np.float32), aligned])
                gi, gi_ids, _ = load_array_with_ids(p["gnn_prefix"] + "_items")
                gnn_items = H.align_gnn_to_catalog(gi, gi_ids, data["item_map"])
                gu, gu_ids, _ = load_array_with_ids(p["gnn_prefix"] + "_users")
                h_params, h_uv, _ = H.restore_hybrid(
                    cfg, data, content, gnn_items, p["root"] + "/ckpt_hybrid")
                gnn_user_of = {str(u): gu[r] for r, u in enumerate(gu_ids)}
                ctx.user_vectorize_fn = hybrid_user_vectorizer(
                    ctx, cfg, h_params, h_uv,
                    ["<pad>"] + list(data["item_map"].ids), gnn_user_of,
                    gnn_dim=gnn_items.shape[1])
                attached = "hybrid tower (best checkpoint)"
            except FileNotFoundError:
                if backend == "hybrid":
                    raise
        if attached is None and backend in ("auto", "stage2"):
            try:
                from recsys_tpu.serve.app import tower_user_vectorizer

                sample = _slice(tensors, np.arange(min(bs, n)))
                u_params, _ = init_stage2_params(
                    cfg, len(data["item_map"]) + 1, None,
                    jax.random.PRNGKey(0), sample)
                tmpl = TrainState.create(u_params, make_stage2_optimizer(
                    cfg, u_params, max(n // bs, 1)))
                restored, _e = CheckpointStore(p["user_ckpts"], maximize=True) \
                    .restore_best(tmpl)
                ctx.user_vectorize_fn = tower_user_vectorizer(
                    ctx, cfg, restored.params,
                    ["<pad>"] + list(data["item_map"].ids), data["side"])
                attached = "stage-2 tower (best checkpoint)"
            except FileNotFoundError:
                if backend == "stage2":
                    raise
        print(f"user vectorizer: {attached or 'history mean (fallback)'}")
    # store-backed training triggers (the /train/* endpoints)
    from recsys_tpu.serve.train_glue import make_item_trainer, make_user_trainer
    p = _paths(cfg)
    ctx.train_item_fn = make_item_trainer(cfg, ctx.store, _mesh(cfg), p["item_ckpts"])
    ctx.train_user_fn = make_user_trainer(cfg, ctx.store, _mesh(cfg), p["user_ckpts"])
    server = make_server(ctx, port=getattr(args, "port", None))
    print(f"serving on {server.server_address}")
    server.serve_forever()
    return {}


def cmd_orchestrate(cfg: Config, args) -> dict:
    """The Airflow-DAG contract against a running server: hourly
    ingest -> loop process-pending until drained (cap 100); weekly
    POST /train/start. ``--once`` runs a single hourly cycle."""
    import urllib.request

    base = getattr(args, "server", None) or \
        f"http://{cfg.serve.host}:{cfg.serve.port}"

    def call(method, path, payload=None):
        req = urllib.request.Request(
            base + path, method=method,
            data=None if payload is None else json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read())

    if getattr(args, "once", False):
        return _hourly_cycle(call)

    last_weekly = 0.0
    while True:  # pragma: no cover — long-running scheduler
        _, last_weekly = orchestrate_cycles(call, 1, last_weekly=last_weekly,
                                            log=True)
        time.sleep(3600)


def _hourly_cycle(call) -> dict:
    drained, loops = 0, 0
    while loops < 100:  # loop cap, reference `product_pipeline_dag.py:81-83`
        r = call("POST", "/ai-api/serving/vectors/process-pending", {})
        if r.get("processed_count", 0) == 0:
            break
        drained += r["processed_count"]
        loops += 1
    return {"vectorized": drained, "loops": loops}


def orchestrate_cycles(call, n_cycles: int, *, last_weekly: float = 0.0,
                       weekly_interval: float = 7 * 24 * 3600.0,
                       now_fn=time.time, log: bool = False):
    """n hourly DAG cycles + the weekly train trigger when due — the
    scheduler body factored so the WEEKLY branch is E2E-testable with an
    injected clock (reference weekly retrain DAG; r1 only covered hourly).
    Returns (records, last_weekly)."""
    records = []
    for _ in range(n_cycles):
        rec = {"hourly": _hourly_cycle(call), "t": now_fn()}
        if now_fn() - last_weekly > weekly_interval:
            rec["weekly"] = call("POST", "/ai-api/serving/train/start", {})
            last_weekly = now_fn()
        if log:
            print(json.dumps(rec))
        records.append(rec)
    return records, last_weekly


COMMANDS = {
    "gen-data": cmd_gen_data,
    "ingest-hm": cmd_ingest_hm,
    "enrich": cmd_enrich,
    "etl": cmd_etl,
    "pretrain-text": cmd_pretrain_text,
    "train-item": cmd_train_item,
    "vectorize": cmd_vectorize,
    "train-user": cmd_train_user,
    "train-gnn": cmd_train_gnn,
    "gnn-eval": cmd_gnn_eval,
    "ensemble-eval": cmd_ensemble_eval,
    "distill": cmd_distill,
    "train-reranker": cmd_train_reranker,
    "train-hybrid": cmd_train_hybrid,
    "eval": cmd_eval,
    "rerank-eval": cmd_rerank_eval,
    "serve": cmd_serve,
    "orchestrate": cmd_orchestrate,
}


def main(argv=None):
    parser = argparse.ArgumentParser("recsys_tpu pipeline")
    parser.add_argument("command", choices=sorted(COMMANDS))
    parser.add_argument("--config", default=None, help="JSON config overrides file")
    parser.add_argument("--set", action="append", default=[],
                        help="dotted overrides, e.g. --set data.num_items=500")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--fine-tune", action="store_true", dest="fine_tune")
    parser.add_argument("--once", action="store_true")
    parser.add_argument("--server", default=None)
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--model-backed", action="store_true", dest="model_backed")
    parser.add_argument("--init-ckpt", default=None, dest="init_ckpt")
    parser.add_argument("--sample", type=int, default=None,
                        help="rerank-eval: ranker training-user sample size")
    parser.add_argument("--m-cos", type=int, default=None, dest="m_cos",
                        help="rerank-eval: cosine arm size of the pool union")
    parser.add_argument("--m-pop", type=int, default=None, dest="m_pop",
                        help="rerank-eval: popularity arm size of the pool union")
    parser.add_argument("--pool", type=int, default=None,
                        help="rerank-eval: candidate pool size per user")
    parser.add_argument("--iterations", type=int, default=None,
                        help="GBDT boosting iterations (reranker stages)")
    parser.add_argument("--vectors", default=None, choices=["stage2", "hybrid"],
                        help="rerank-eval: which tower's vectors build the cosine pool")
    parser.add_argument("--hm-dir", default=None, dest="hm_dir",
                        help="directory with the H&M Kaggle CSVs (ingest-hm)")
    parser.add_argument("--date-min", default=None, dest="date_min")
    parser.add_argument("--date-max", default=None, dest="date_max")
    args = parser.parse_args(argv)

    overrides: dict = {}
    for kv in args.set:
        key, _, raw = kv.partition("=")
        node = overrides
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        try:
            node[parts[-1]] = json.loads(raw)
        except json.JSONDecodeError:
            node[parts[-1]] = raw
    cfg = load_config(args.config, overrides)
    result = COMMANDS[args.command](cfg, args)
    print(json.dumps({"command": args.command, **(result or {})}, default=str))
    return result


if __name__ == "__main__":
    main()
