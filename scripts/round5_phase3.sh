#!/bin/bash
# Round-5 phase 3 — opportunistic extras, run only if phases 1-2 landed
# with chip time to spare (priority order = marginal value):
#   1. deep-ranker A/B at shape (VERDICT r4 weak #4: the 20k-user /
#      200-iteration trainer defaults are unexamined) — same recipe
#      pools, 2x users + 2x boosting budget
#   2. stage-2 x GNN ensemble at the 2000-candidate pool (m sensitivity)
# Usage: round5_phase3.sh <deadline_epoch_seconds>
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=artifacts/quality_hm_v4
WD=$OUT/world
DEADLINE=${1:?deadline epoch seconds}
SETS="--set data.root=$WD --set data.num_items=105000 --set data.num_users=1370000 \
 --set data.days=365 --set data.repeat_prob=0.10 --set data.name_style_words=2"
RCP="--set data.root=$OUT/world_rcp --set data.num_items=105000 \
 --set data.num_users=1370000 --set data.days=365 --set data.repeat_prob=0.10 \
 --set data.name_style_words=2"
log() { echo "[$(date +%T)] $*" >> "$OUT/round5.log"; }

run() {
  local name=$1 tmo=$2; shift 2
  local sets=${RSETS:-$SETS}
  [ -s "$OUT/$name.json" ] && { log "skip $name"; return 0; }
  local left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -gt 300 ] || { log "no time for $name"; return 1; }
  [ "$tmo" -gt "$left" ] && tmo=$left
  log "start $name (timeout ${tmo}s)"
  if timeout "$tmo" python -m recsys_tpu.pipeline.cli "$@" $sets \
      2> >(tail -60 > "$OUT/$name.stderr") > "$OUT/$name.json.tmp"; then
    mv "$OUT/$name.json.tmp" "$OUT/$name.json"; log "done $name"
  else
    local rc=$?; rm -f "$OUT/$name.json.tmp"; log "FAILED $name (exit $rc)"
    return 1
  fi
}

# ---- wait for phase 2 to release the chip
for i in $(seq 1 1400); do
  grep -q "round5_phase2 done" "$OUT/round5.log" 2>/dev/null && break
  [ $(( DEADLINE - $(date +%s) )) -lt 600 ] && break
  sleep 15
done

# ---- -1. retries for stages the earlier phases lost to the PYTHONPATH
# bug (axon plugin lives on /root/.axon_site; overriding PYTHONPATH
# dropped it and jax died on 'Unable to initialize backend axon')
if [ ! -s "$OUT/distill_scale_sweep.json" ]; then
  log "start distill_scale_sweep (phase3)"
  if PYTHONPATH=.:/root/.axon_site timeout 5400 \
      python scripts/distill_scale_sweep.py "$WD" \
      "$OUT/distill_scale_sweep.json" \
      2> >(tail -40 > "$OUT/distill_scale_sweep.stderr") \
      > "$OUT/distill_scale_sweep.rows"; then
    log "done distill_scale_sweep"
  else
    log "FAILED distill_scale_sweep (phase3)"
  fi
fi
HARD=$(python - <<'EOF'
import json
try:
    rows = json.load(open("artifacts/quality_hm_v4/distill_scale_sweep.json"))["rows"]
    full = max(r["n_items"] for r in rows)
    fid = {r["arm"]: r.get("fidelity", 0.0)
           for r in rows if r["n_items"] == full}
    print("yes" if fid.get("hard", 0.0) > fid.get("default", 0.0) + 0.1 else "no")
except Exception:
    print("no")
EOF
)
log "hard-mining fixes fidelity at shape: $HARD"
if [ "$HARD" = yes ]; then
  run distill_r5_hard 3600 distill --set distill.hard_frac=0.5
  [ -s "$OUT/distill_r5_hard.json" ] && run gnn_eval_r5h 5400 gnn-eval
fi
if [ ! -s "$OUT/serve_bench_tpu.json" ]; then
  log "start serve_bench_tpu (phase3)"
  PYTHONPATH=.:/root/.axon_site timeout 2400 python scripts/serve_bench.py \
    "$WD" "$OUT/serve_bench_tpu.json" 256 512 \
    2> >(tail -40 > "$OUT/serve_bench_tpu.stderr") \
    && log "done serve_bench_tpu" || log "FAILED serve_bench_tpu (phase3)"
fi

# ---- 0. old-recipe hybrid EXTENDED (the decisive arm): the recipe run
# measured 20.29%@100 after 4 low-LR epochs vs r4's 21.98 after 2
# default-recipe epochs that were still rising +0.77pp/epoch when the
# campaign stopped them. Train the default recipe 6 epochs in its own
# isolated world and rerank over whichever hybrid checkpoint measures
# best.
CTRL=$OUT/world_ctrl
CSETS="--set data.root=$CTRL --set data.num_items=105000 \
 --set data.num_users=1370000 --set data.days=365 --set data.repeat_prob=0.10 \
 --set data.name_style_words=2"
mkdir -p "$CTRL"
for f in items.parquet users.parquet transactions.parquet \
         features_item.parquet features_sequence.parquet \
         features_user.parquet targets_val.json \
         item_matrix.npy item_matrix.ids.json \
         gnn_users.npy gnn_users.ids.json gnn_items.npy gnn_items.ids.json \
         gnn_distilled_items.npy gnn_distilled_items.ids.json \
         gnn_distilled_users.npy gnn_distilled_users.ids.json \
         gnn_eval.json; do
  [ -e "$CTRL/$f" ] || { [ -e "$WD/$f" ] && ln -s "$(pwd)/$WD/$f" "$CTRL/$f"; }
done
RSETS=$CSETS run hybrid_ctrl6 10800 train-hybrid \
  --set user_train.epochs=6 --set user_train.ckpt_every=1
if [ -s "$OUT/hybrid_ctrl6.json" ]; then
  RSETS=$CSETS run rerank_hybrid_ctrl6 10800 rerank-eval --vectors hybrid
fi

# ---- 1. deep-ranker A/B on the better hybrid world
BESTW=$OUT/world_rcp
BSETS=$RCP
if [ -s "$OUT/hybrid_ctrl6.json" ] && python - <<'EOF'
import json, sys
try:
    c = json.load(open("artifacts/quality_hm_v4/hybrid_ctrl6.json"))
    r = json.load(open("artifacts/quality_hm_v4/hybrid_recipe_shape.json"))
    sys.exit(0 if c["hybrid_best"]["recall@100"] > r["hybrid_best"]["recall@100"]
             else 1)
except Exception:
    sys.exit(1)
EOF
then BESTW=$CTRL; BSETS=$CSETS; fi
log "deep-ranker arm world: $BESTW"
if [ -s "$OUT/rerank_hybrid_rcp.json" ] || [ -s "$OUT/rerank_hybrid_ctrl6.json" ]; then
  RSETS=$BSETS run rerank_hybrid_deep 10800 rerank-eval --vectors hybrid \
    --sample 40000 --iterations 400
fi
run ensemble_eval_r5_m2000 7200 ensemble-eval --pool 2000
log "round5_phase3 done"
