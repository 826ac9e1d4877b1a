#!/bin/bash
# Round-5 chip campaign phase 2 (after round5_chip.sh), risk-ranked:
#   0. distill fidelity-vs-scale sweep (+conditional hard-recipe arm)
#   1. extended DEFAULT-recipe hybrid (6 epochs, report skipped) — the
#      live path to a new best system after the low-LR recipe measured
#      20.29%@100 at shape vs r4's still-rising 2-epoch 21.98% — then
#      rerank rows over both hybrid checkpoints (restore is now
#      params-only, so recipe flags don't matter)
#   2. stage-2 long-run extension ep25 -> ep40 (resume; curve exported)
#   3. eval_uvecs refresh + eval grid IF the extension improved best
#   4. stage-2-pools rerank row (the r4 orphan rerank.stderr stage)
#   5. pool sweeps (1024 / composition) on the BEST hybrid world
#   6. serving-mode bench on the chip with the trained ranker
# Usage: round5_phase2.sh <deadline_epoch_seconds>
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
CTRL=$OUT/world_ctrl
CSETS="--set data.root=$CTRL --set data.num_items=105000 \
 --set data.num_users=1370000 --set data.days=365 --set data.repeat_prob=0.10 \
 --set data.name_style_words=2"
log() { echo "[$(date +%T)] $*" >> "$OUT/round5.log"; }

run() {  # run <name> <timeout_s> <cmd...>   (uses $RSETS if set, else $SETS)
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

curve() {
  python - <<'EOF'
import json
rows = []
try:
    with open("artifacts/quality_hm_v4/world/ckpt_user/metrics.jsonl") as f:
        for line in f:
            r = json.loads(line)
            if r.get("kind") == "eval" or "recall@100" in r:
                rows.append(r)
except FileNotFoundError:
    pass
with open("artifacts/quality_hm_v4/user_curve.json", "w") as f:
    json.dump(rows, f, indent=1)
print(f"user_curve.json: {len(rows)} eval rows")
EOF
}

# ---- wait for round5_chip.sh to release the chip
for i in $(seq 1 1400); do
  grep -q "round5_chip done" "$OUT/round5.log" 2>/dev/null && break
  sleep 15
done

# ---- 0. distill fidelity-vs-scale sweep + conditional hard arm
if [ ! -s "$OUT/distill_scale_sweep.json" ]; then
  log "start distill_scale_sweep (phase2)"
  if PYTHONPATH=.:/root/.axon_site timeout 5400 python scripts/distill_scale_sweep.py "$WD" \
      "$OUT/distill_scale_sweep.json" \
      2> >(tail -40 > "$OUT/distill_scale_sweep.stderr") \
      > "$OUT/distill_scale_sweep.rows"; then
    log "done distill_scale_sweep"
  else
    log "FAILED distill_scale_sweep"
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
  if [ -s "$OUT/distill_r5_hard.json" ]; then
    run gnn_eval_r5h 5400 gnn-eval
  fi
fi

# ---- 1. extended default-recipe hybrid + rerank rows
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
  --set user_train.epochs=6 --set user_train.ckpt_every=1 \
  --set user_train.hybrid_report=false
if [ -s "$OUT/hybrid_ctrl6.json" ]; then
  RSETS=$CSETS run rerank_hybrid_ctrl6 10800 rerank-eval --vectors hybrid
fi
if [ -d "$OUT/world_rcp" ]; then
  RSETS=$RCP run rerank_hybrid_rcp 10800 rerank-eval --vectors hybrid
fi

# ---- 2. stage-2 extension (resume from ep025)
run user_ext 10800 train-user --resume --set user_train.epochs=40 \
  --set user_train.ckpt_every=5
curve >> "$OUT/round5.log"

# ---- 3. refresh eval vectors iff the best checkpoint moved
IMPROVED=$(python - <<'EOF'
import json
try:
    man = json.load(open("artifacts/quality_hm_v4/world/ckpt_user/manifest.json"))
    best = man.get("best", {}).get("metric") or 0.0
    print("yes" if best > 0.1542 + 0.002 else "no")
except Exception:
    print("no")
EOF
)
log "stage-2 extension improved best: $IMPROVED"
if [ "$IMPROVED" = yes ] && [ ! -s "$OUT/eval_r5.json" ]; then
  # stash-then-rebuild: a failed eval_r5 must not leave the world
  # without the sidecars later stages hard-require
  mv -f "$WD/eval_uvecs.npy" "$WD/eval_uvecs.npy.bak" 2>/dev/null || true
  mv -f "$WD/eval_uvecs.ids.json" "$WD/eval_uvecs.ids.json.bak" 2>/dev/null || true
  if run eval_r5 7200 eval; then
    rm -f "$WD/eval_uvecs.npy.bak" "$WD/eval_uvecs.ids.json.bak"
  else
    [ -e "$WD/eval_uvecs.npy" ] || {
      mv -f "$WD/eval_uvecs.npy.bak" "$WD/eval_uvecs.npy" 2>/dev/null
      mv -f "$WD/eval_uvecs.ids.json.bak" "$WD/eval_uvecs.ids.json" 2>/dev/null
      log "eval_r5 failed — restored ep25 eval_uvecs sidecars"
    }
  fi
fi

# ---- 4. stage-2-pools rerank row (fills the r4 orphan)
run rerank 10800 rerank-eval

# ---- 5. pool sweeps on the BEST hybrid world
BESTW=$OUT/world_rcp; BSETS=$RCP
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
log "pool sweeps on: $BESTW"
if [ -d "$BESTW" ]; then
  RSETS=$BSETS run rerank_hybrid_1024 10800 rerank-eval --vectors hybrid \
    --pool 1024 --m-cos 600 --m-pop 200
  RSETS=$BSETS run rerank_hybrid_cos450 10800 rerank-eval --vectors hybrid \
    --pool 512 --m-cos 450 --m-pop 50
fi

# ---- 6. serving bench on the chip (ranker from step 4 if it landed)
if [ ! -s "$OUT/serve_bench_tpu.json" ]; then
  log "start serve_bench_tpu"
  PYTHONPATH=.:/root/.axon_site timeout 2400 python scripts/serve_bench.py "$WD" \
    "$OUT/serve_bench_tpu.json" 256 512 \
    2> >(tail -40 > "$OUT/serve_bench_tpu.stderr") \
    && log "done serve_bench_tpu" || log "FAILED serve_bench_tpu"
fi

log "round5_phase2 done"
