#!/bin/bash
# Round-5 session-2 follow-on: runs once the relaunched train-gnn
# finishes. Order: distill fidelity-vs-scale sweep (VERDICT r4 item 5's
# missing deliverable) -> chip serving bench (the promised
# serve_bench_tpu.json) -> short stage-2 run whose per-epoch recall rows
# must reproduce the committed user_curve.json prefix (determinism
# evidence for every session-transcribed round-5 number).
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=artifacts/quality_hm_v4
WD=$OUT/world
SETS="--set data.root=$WD --set data.num_items=105000 --set data.num_users=1370000 \
 --set data.days=365 --set data.repeat_prob=0.10 --set data.name_style_words=2"
log() { echo "[$(date +%T)] $*" >> "$OUT/round5_s2.log"; }
export PYTHONPATH=.:/root/.axon_site

# wait for the gnn exports (written after training, before the stage JSON)
for i in $(seq 1 240); do
  [ -s "$OUT/gnn_s2.json" ] && break
  sleep 15
done
[ -s "$OUT/gnn_s2.json" ] || { log "gnn_s2 never finished; abort s2b"; exit 1; }
log "gnn_s2 ready; starting sweep"

if [ ! -s "$OUT/distill_scale_sweep.json" ] || \
   [ "$(python -c "import json;print(len(json.load(open('$OUT/distill_scale_sweep.json'))['rows']))" 2>/dev/null || echo 0)" -lt 8 ]; then
  timeout 3600 python scripts/distill_scale_sweep.py "$WD" \
      "$OUT/distill_scale_sweep.json" \
      2> >(tail -40 > "$OUT/distill_scale_sweep.stderr") \
      > "$OUT/distill_scale_sweep.rows" \
    && log "done distill_scale_sweep" || log "partial distill_scale_sweep"
fi

if [ ! -s "$OUT/serve_bench_tpu.json" ]; then
  log "start serve_bench_tpu"
  timeout 1500 python scripts/serve_bench.py "$WD" \
      "$OUT/serve_bench_tpu.json" 256 512 \
      2> >(tail -40 > "$OUT/serve_bench_tpu.stderr") \
    && log "done serve_bench_tpu" || log "FAILED serve_bench_tpu"
fi

# stage-2 determinism probe: 3 epochs; per-epoch rows land in
# ckpt_user/metrics.jsonl for comparison against committed user_curve.json
if [ ! -s "$OUT/user_s2probe.json" ]; then
  log "start user_s2probe (3 epochs)"
  timeout 2400 python -m recsys_tpu.pipeline.cli train-user $SETS \
      --set user_train.epochs=3 \
      2> >(tail -60 > "$OUT/user_s2probe.stderr") \
      > "$OUT/user_s2probe.json.tmp" \
    && mv "$OUT/user_s2probe.json.tmp" "$OUT/user_s2probe.json" \
    && log "done user_s2probe" || log "FAILED user_s2probe"
fi
log "round5_s2b chain done"
