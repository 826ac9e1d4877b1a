#!/bin/bash
# Round-4 campaign phase 3 — rebuild-and-finish after the inter-session
# machine wipe (only git-tracked files survived; the v4 world, stage-1
# checkpoints and item matrix are regenerated seed-deterministically by
# scripts/quality_hm_v4_data.sh / this script before the remaining
# stages run). Remaining stages, risk-ranked:
#   1. stage-1 item tower + vectorize (prereq for everything below;
#      phase-1's committed item.json/vectorize.json recorded the same
#      config, so the rerun is a reproduction, not a new measurement)
#   2. training-free baselines (CPU, runs alongside the chip stages) —
#      the content-profile row at shape, VERDICT r3 item 2's missing half
#   3. the 25-epoch stage-2 long run (VERDICT r3 item 3) with a hard
#      wall-clock deadline: per-epoch eval rows land in metrics.jsonl,
#      so a deadline kill still yields the committed epoch curve.
# Usage: quality_hm_v4_phase3.sh <deadline_epoch_seconds>
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=artifacts/quality_hm_v4
WD=$OUT/world
DEADLINE=${1:?deadline epoch seconds}
SETS="--set data.root=$WD --set data.num_items=105000 --set data.num_users=1370000 \
 --set data.days=365 --set data.repeat_prob=0.10 --set data.name_style_words=2"
log() { echo "[$(date +%T)] $*" >> "$OUT/phase3.log"; }

# ---- wait for the data phase (gen-data + etl) to finish
for i in $(seq 1 720); do
  [ -s "$OUT/etl_rerun.json" ] && break
  grep -q FAILED "$OUT/regen.log" 2>/dev/null && { log "data phase FAILED"; exit 1; }
  sleep 10
done
[ -s "$OUT/etl_rerun.json" ] || { log "data phase never finished"; exit 1; }
# determinism check: the regenerated world must match the committed one
python - <<'EOF' >> "$OUT/phase3.log"
import json
old = json.load(open("artifacts/quality_hm_v4/gen.json"))
new = json.load(open("artifacts/quality_hm_v4/gen_rerun.json"))
same = all(old[k] == new[k] for k in ("items", "users", "transactions"))
print(f"world determinism: {'MATCH' if same else 'MISMATCH'} "
      f"(tx {old['transactions']} vs {new['transactions']})")
EOF

# ---- chip stages (serialized: one chip client at a time)
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -s "$OUT/$name.rerun.json" ] && { log "skip $name"; return 0; }
  log "start $name (timeout ${tmo}s)"
  if timeout "$tmo" python -m recsys_tpu.pipeline.cli "$@" $SETS \
      2> >(tail -60 > "$OUT/$name.stderr") > "$OUT/$name.rerun.json.tmp"; then
    mv "$OUT/$name.rerun.json.tmp" "$OUT/$name.rerun.json"; log "done $name"
  else
    rm -f "$OUT/$name.rerun.json.tmp"; log "FAILED $name"; return 1
  fi
}

run item 7200 train-item --set simcse.epochs=3 || exit 1
run vectorize 3600 vectorize || exit 1

# ---- CPU-side baselines (content-profile at shape) alongside the chip run
if [ ! -s "$OUT/baselines.json" ]; then
  ( JAX_PLATFORMS=cpu nice -n 10 timeout 10800 \
      python scripts/hm_baselines.py "$WD" \
      > "$OUT/baselines.json.tmp" 2> "$OUT/baselines.stderr" \
      && mv "$OUT/baselines.json.tmp" "$OUT/baselines.json" \
      && log "done baselines" || log "FAILED baselines" ) &
fi

# ---- stage-2 long run, bounded by the session deadline
TMO=$(( DEADLINE - $(date +%s) ))
[ "$TMO" -gt 600 ] || { log "no time left for stage-2"; exit 1; }
if [ -s "$OUT/user.rerun.json" ]; then  # re-entrant like every other stage
  log "skip user"; wait; log phase3-exit; exit 0
fi
# fresh-file sentinel for phase4 — a FILE, not a log line: phase3.log is
# git-committed, so grepping it matches stale round-4 lines after a wipe
# (code-review r5 finding)
date +%s > "$OUT/.user_stage_started"
log "start user (timeout ${TMO}s)"
if timeout "$TMO" python -m recsys_tpu.pipeline.cli train-user \
    --set user_train.epochs=25 --set user_train.ckpt_every=5 $SETS \
    2> >(tail -60 > "$OUT/user.stderr") > "$OUT/user.rerun.json.tmp"; then
  mv "$OUT/user.rerun.json.tmp" "$OUT/user.rerun.json"; log "done user"
else
  rc=$?; rm -f "$OUT/user.rerun.json.tmp"
  if [ "$rc" -eq 124 ]; then
    # only a timeout(1) kill is a planned deadline stop; anything else
    # (crash/OOM/tunnel wedge) must read as a real failure (ADVICE r4)
    log "user stage hit the deadline (curve is in metrics.jsonl)"
  else
    log "FAILED user (exit $rc)"; wait; exit 1
  fi
fi
wait
log phase3-exit
