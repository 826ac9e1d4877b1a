#!/bin/bash
# Round-5 session 2: regenerate the artifact JSONs the inter-session
# machine wipe destroyed before session 1 could commit them, cheapest
# first. Chain: gen -> etl -> train-item -> vectorize (regen proof via
# gen determinism diff), then serve_bench_tpu (the chip rows RESULTS.md
# promises), then train-gnn -> distill fidelity-vs-scale sweep
# (VERDICT r4 item 5's missing deliverable) as the deadline allows.
# Usage: round5_s2.sh <deadline_epoch_seconds>
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=artifacts/quality_hm_v4
WD=$OUT/world
DEADLINE=${1:?deadline epoch seconds}
SETS="--set data.root=$WD --set data.num_items=105000 --set data.num_users=1370000 \
 --set data.days=365 --set data.repeat_prob=0.10 --set data.name_style_words=2"
log() { echo "[$(date +%T)] $*" >> "$OUT/round5_s2.log"; }

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -s "$OUT/$name.json" ] && { log "skip $name"; return 0; }
  local left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -gt 60 ] || { log "no time for $name"; return 1; }
  [ "$tmo" -gt "$left" ] && tmo=$left
  log "start $name (timeout ${tmo}s)"
  if timeout "$tmo" python -m recsys_tpu.pipeline.cli "$@" $SETS \
      2> >(tail -60 > "$OUT/$name.stderr") > "$OUT/$name.json.tmp"; then
    mv "$OUT/$name.json.tmp" "$OUT/$name.json"; log "done $name"
  else
    local rc=$?; rm -f "$OUT/$name.json.tmp"
    if [ "$rc" -eq 124 ]; then log "DEADLINE $name"; else log "FAILED $name (exit $rc)"; fi
    return 1
  fi
}

export PYTHONPATH=.:/root/.axon_site

run gen_s2 1200 gen-data || exit 1
python - <<'EOF' >> "$OUT/round5_s2.log"
import json
a = json.load(open("artifacts/quality_hm_v4/gen.json"))
b = json.load(open("artifacts/quality_hm_v4/gen_s2.json"))
same = all(a.get(k) == b.get(k) for k in a if k not in ("elapsed_s",))
print(f"gen determinism vs committed r4 gen.json: {'MATCH' if same else 'MISMATCH'}")
EOF
run etl_s2 900 etl || exit 1
run item_s2 1500 train-item || exit 1
run vectorize_s2 900 vectorize || exit 1

# chip serving bench (the rows RESULTS.md promises as serve_bench_tpu.json)
if [ ! -s "$OUT/serve_bench_tpu.json" ]; then
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -gt 300 ]; then
    log "start serve_bench_tpu"
    if timeout $(( left < 900 ? left : 900 )) python scripts/serve_bench.py "$WD" \
        "$OUT/serve_bench_tpu.json" 256 512 \
        2> >(tail -40 > "$OUT/serve_bench_tpu.stderr"); then
      log "done serve_bench_tpu"
    else
      log "FAILED serve_bench_tpu"
    fi
  fi
fi

# GNN rebuild, then the fidelity-vs-scale sweep over its exports
run gnn_s2 3600 train-gnn && {
  if [ ! -s "$OUT/distill_scale_sweep.json" ]; then
    left=$(( DEADLINE - $(date +%s) ))
    if [ "$left" -gt 120 ]; then
      log "start distill_scale_sweep"
      if timeout "$left" python scripts/distill_scale_sweep.py "$WD" \
          "$OUT/distill_scale_sweep.json" \
          2> >(tail -40 > "$OUT/distill_scale_sweep.stderr") \
          > "$OUT/distill_scale_sweep.rows"; then
        log "done distill_scale_sweep"
      else
        log "FAILED/partial distill_scale_sweep"
      fi
    fi
  fi
}
log "round5_s2 chain done"
