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

if [ -d "$OUT/world_rcp" ] && [ -s "$OUT/rerank_hybrid_rcp.json" ]; then
  RSETS=$RCP run rerank_hybrid_rcp_deep 10800 rerank-eval --vectors hybrid \
    --sample 40000 --iterations 400
fi
run ensemble_eval_r5_m2000 7200 ensemble-eval --pool 2000
log "round5_phase3 done"
