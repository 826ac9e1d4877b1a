"""End-to-end pipeline CLI: every stage at tiny scale over one artifact dir,
plus the orchestrate --once DAG contract against a live server."""

import json
import os

import numpy as np
import pytest

from recsys_tpu.pipeline import cli


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("pipeline"))


def _run(workdir, command, *extra):
    argv = [command,
            "--set", f"data.root={workdir}",
            "--set", "data.num_items=80", "--set", "data.num_users=40",
            "--set", "data.days=40",
            "--set", "user_tower.max_len=10", "--set", "user_tower.num_layers=1",
            "--set", "user_train.batch_size=16", "--set", "user_train.epochs=1",
            "--set", "user_train.eval_ks=[5,20]",
            "--set", "user_train.steps_per_epoch_min=1",
            "--set", "simcse.batch_size=16", "--set", "simcse.epochs=1",
            "--set", "simcse.steps_per_epoch_min=1",
            "--set", "gnn.batch_size=256", "--set", "gnn.epochs=2",
            "--set", "gnn.emb_dim=16", "--set", "gnn.svd_rank=4",
            "--set", "distill.epochs=50", "--set", "distill.out_dim=16",
            "--set", "reranker.epochs=5",
            "--set", "vocab.max_field_tokens=8", "--set", "vocab.max_name_tokens=8",
            "--set", "item_tower.head_hidden=[128]",
            "--set", "item_tower.fusion_layers=1", "--set", "item_tower.text_layers=1",
            ] + list(extra)
    return cli.main(argv)


def test_full_pipeline_stages(workdir):
    r = _run(workdir, "gen-data")
    assert r["items"] == 80 and r["transactions"] > 300

    r = _run(workdir, "enrich")
    assert r["enriched"] == 80

    r = _run(workdir, "etl")
    assert r["sanity"]["pad_inside_sequence"] == 0
    assert r["missing"]["missing_tx"] == 0
    assert os.path.exists(f"{workdir}/features_item.parquet")

    r = _run(workdir, "train-item")
    assert r["steps"] > 0

    r = _run(workdir, "vectorize")
    assert r["shape"] == [81, 128]

    r = _run(workdir, "train-user")
    assert r["epochs"] == 1 and "recall@20" in r["final"]

    r = _run(workdir, "train-gnn")
    assert r["check"]["ok"]

    r = _run(workdir, "distill")
    assert r["shape"][1] == 16

    r = _run(workdir, "train-hybrid")
    assert "recall@20" in r["hybrid_final"]
    assert "rrf" in r["ensemble"] and "count_mix" in r["ensemble"]

    r = _run(workdir, "train-reranker")
    assert 0.0 <= r["gbdt_auc"] <= 1.0 and 0.0 <= r["dcn_auc"] <= 1.0

    r = _run(workdir, "eval")
    assert "recall@20" in r and np.isfinite(r["recall@20"])
    saved = json.load(open(f"{workdir}/eval.json"))
    assert saved["n_eval"] > 0
    # eval persists the user vectors + item matrix for post-hoc analyses
    assert os.path.exists(f"{workdir}/eval_uvecs.npy")

    r = _run(workdir, "rerank-eval", "--sample", "30", "--pool", "48",
             "--iterations", "20")
    assert "recall@20" in r["reranked"]
    # the pool must bound the reranked recall from above
    assert r["pool_ceiling"]["recall@48"] >= r["reranked"]["recall@20"] - 1e-9
    assert "reranked_vs_repurchase" in r.get("significance", {})


def test_orchestrate_once_against_server(workdir):
    from recsys_tpu.config import Config, ServeConfig
    from recsys_tpu.serve.app import build_app_context
    from recsys_tpu.serve.server import make_server, serve_forever_in_thread

    cfg = Config(serve=ServeConfig(db_path=":memory:", batch_size=4))
    ctx = build_app_context(cfg)
    ctx.store.ingest_products([
        {"product_id": f"x{i}", "product_name": f"p {i}",
         "feature_data": {"reinforced_feature": {"CAT": ["shirt"]}}}
        for i in range(10)])
    server = make_server(ctx, host="127.0.0.1", port=0)
    serve_forever_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        out = cli.main(["orchestrate", "--once", "--server", base])
        assert out["vectorized"] == 10 and out["loops"] == 3  # ceil(10/4)
    finally:
        server.shutdown()


def test_quality_regression_floors(tmp_path):
    """CI-scale learned-beats-trivial floor (VERDICT r2 item 5): on a small
    but structured world (latent clusters + seasonal drift, calibrated
    repeat), the hybrid tower must beat the popularity baseline by a clear
    margin and the pipeline's recall floors must hold. Pinned seed; floors
    set ~30% below measured values to absorb optimizer noise."""
    wd = str(tmp_path / "qreg")
    base = ["--set", f"data.root={wd}",
            "--set", "data.num_items=800", "--set", "data.num_users=500",
            "--set", "data.days=180", "--set", "data.seed=21",
            "--set", "data.repeat_prob=0.10",
            "--set", "user_tower.max_len=16", "--set", "user_tower.num_layers=1",
            "--set", "user_train.batch_size=64", "--set", "user_train.epochs=2",
            "--set", "user_train.eval_ks=[20,100]",
            "--set", "simcse.batch_size=64", "--set", "simcse.epochs=1",
            "--set", "gnn.batch_size=512", "--set", "gnn.epochs=2",
            "--set", "gnn.emb_dim=16", "--set", "gnn.svd_rank=4",
            "--set", "vocab.max_field_tokens=8", "--set", "vocab.max_name_tokens=8",
            "--set", "item_tower.head_hidden=[128]",
            "--set", "item_tower.fusion_layers=1",
            "--set", "item_tower.text_layers=1"]
    for stage in ("gen-data", "etl", "train-item", "vectorize",
                  "train-gnn", "distill"):
        cli.main([stage] + base)
    r = cli.main(["train-hybrid"] + base)
    hybrid100 = r["hybrid_best"]["recall@100"]
    ev = cli.main(["eval"] + base)
    pop100 = ev["baselines"]["popularity"]["recall@100"]
    # learned-over-trivial floors. Measured on this pinned world: hybrid
    # 35.9% vs popularity 29.1% (ratio 1.23) — note k=100 covers 12.5% of
    # an 800-item catalog, so popularity is structurally inflated at CI
    # scale; the relative floor is set at 1.1 (~12% headroom) and the
    # absolute floor at 0.30 (~16% headroom).
    assert hybrid100 > pop100 * 1.1, (hybrid100, pop100)
    assert hybrid100 > 0.30, hybrid100
    # season-aware blend must at least not break the sweep contract
    if "blend_seasonal" in ev:
        assert ev["blend_seasonal"]["best_metrics"]["recall@100"] > 0


def test_orchestrate_weekly_branch_against_server(workdir):
    """The WEEKLY train trigger, E2E with an injected clock: fires on the
    first due cycle, not again within the interval, again once overdue —
    against a live server whose /train/start actually starts a background
    item-tower train (reference weekly retrain DAG)."""
    from recsys_tpu.config import Config, ServeConfig
    from recsys_tpu.pipeline.cli import orchestrate_cycles
    from recsys_tpu.serve.app import build_app_context
    from recsys_tpu.serve.server import make_server, serve_forever_in_thread
    import json as _json
    import urllib.request

    cfg = Config(serve=ServeConfig(db_path=":memory:", batch_size=4))
    ctx = build_app_context(cfg)
    ctx.store.ingest_products([
        {"product_id": f"w{i}", "product_name": f"p {i}",
         "feature_data": {"reinforced_feature": {"CAT": ["shirt"]}}}
        for i in range(4)])
    server = make_server(ctx, host="127.0.0.1", port=0)
    serve_forever_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def call(method, path, payload=None):
        req = urllib.request.Request(
            base + path, method=method,
            data=None if payload is None else _json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            return _json.loads(resp.read())

    clock = {"t": 1_000_000.0}
    try:
        # cycle 1: weekly due (last_weekly=0). cycle 2: +1h, not due.
        recs, lw = orchestrate_cycles(
            call, 1, last_weekly=0.0, now_fn=lambda: clock["t"])
        assert "weekly" in recs[0] and lw == clock["t"]
        assert recs[0]["weekly"].get("started") or recs[0]["weekly"]
        clock["t"] += 3600
        recs, lw2 = orchestrate_cycles(
            call, 1, last_weekly=lw, now_fn=lambda: clock["t"])
        assert "weekly" not in recs[0] and lw2 == lw
        clock["t"] += 8 * 24 * 3600
        recs, lw3 = orchestrate_cycles(
            call, 1, last_weekly=lw2, now_fn=lambda: clock["t"])
        assert "weekly" in recs[0] and lw3 == clock["t"]
    finally:
        server.shutdown()
