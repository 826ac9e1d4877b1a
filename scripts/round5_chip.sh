#!/bin/bash
# Round-5 chip campaign, risk-ranked per VERDICT r4 "next round":
#   0. wait for the backgrounded train-gnn rebuild (gnn_r5.json)
#   1. gnn-eval — raw retrieval rows (arm selection for everything below)
#   2. distill fidelity-vs-scale sweep (weak #1: WHY 0.90 -> 0.034) —
#      its full-scale verdict picks the campaign distill recipe
#   3. distill (hard-mining iff the sweep says it fixes fidelity) +
#      gnn-eval rerun with distilled rows
#   4. the WINNING hybrid recipe at shape (item 1 — the single
#      highest-leverage chip time in the tree) via hybrid_recipe_shape.sh
#   5. rerank over the recipe checkpoint's pools (item 1 second half)
#   6. ensemble-eval: stage-2 x GNN fusion at shape (item 4)
# Later phases (stage-2 extension, pool sweeps, serve bench) run from
# round5_phase2.sh once this finishes inside the deadline.
# Usage: round5_chip.sh <deadline_epoch_seconds>
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=artifacts/quality_hm_v4
WD=$OUT/world
DEADLINE=${1:?deadline epoch seconds}
SETS="--set data.root=$WD --set data.num_items=105000 --set data.num_users=1370000 \
 --set data.days=365 --set data.repeat_prob=0.10 --set data.name_style_words=2"
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

# ---- 0. wait for the backgrounded train-gnn
for i in $(seq 1 720); do
  [ -s "$OUT/gnn_r5.json" ] && break
  sleep 15
done
[ -s "$OUT/gnn_r5.json" ] || { log "train-gnn never finished"; exit 1; }
log "gnn artifacts ready"

# ---- 1. raw GNN retrieval rows
run gnn_eval_r5 5400 gnn-eval

# ---- 2. fidelity-vs-scale sweep
if [ ! -s "$OUT/distill_scale_sweep.json" ]; then
  log "start distill_scale_sweep"
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
    print("0.5" if fid.get("hard", 0.0) > fid.get("default", 0.0) + 0.1 else "0.0")
except Exception:
    print("0.0")
EOF
)
log "campaign distill recipe: hard_frac=$HARD"

# ---- 3. campaign distill + distilled gnn-eval rows
run distill_r5 3600 distill --set distill.hard_frac="$HARD"
if [ -s "$OUT/distill_r5.json" ] && [ ! -s "$OUT/gnn_eval_r5d.json" ]; then
  rm -f "$WD/gnn_eval.json"
  run gnn_eval_r5d 5400 gnn-eval
fi

# ---- 4. the winning hybrid recipe at the H&M shape
if [ ! -s "$OUT/hybrid_recipe_shape.json" ]; then
  log "start hybrid_recipe_shape"
  if bash scripts/hybrid_recipe_shape.sh >> "$OUT/round5.log" 2>&1; then
    log "done hybrid_recipe_shape"
  else
    log "FAILED hybrid_recipe_shape"
  fi
fi

# ---- 5. rerank over the recipe checkpoint (isolated world_rcp)
if [ -s "$OUT/hybrid_recipe_shape.json" ]; then
  RSETS="--set data.root=$OUT/world_rcp --set data.num_items=105000 \
   --set data.num_users=1370000 --set data.days=365 \
   --set data.repeat_prob=0.10 --set data.name_style_words=2" \
    run rerank_hybrid_rcp 10800 rerank-eval --vectors hybrid
fi

# ---- 6. stage-2 x GNN fusion at shape
run ensemble_eval_r5 7200 ensemble-eval

log "round5_chip done"
