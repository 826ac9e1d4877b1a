#!/bin/bash
# THE headline quality run (VERDICT r2 item 1): the real H&M data shape —
# 105k items / 1.37M users / 365 days (~31M transactions) — with the
# repurchase knob calibrated to H&M-realistic levels (repeat_prob=0.10 ->
# repurchase baseline ~25% Recall@100 at mid scale; the r1 default 0.25
# inflated it to ~40%, letting a no-ML baseline tie the stack).
# Full stack, reporting popularity / repurchase / content-profile / SASRec
# / GNN-standalone / hybrid / blends side by side.
# Data/ETL on host CPU; training stages on the TPU chip.
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=artifacts/quality_hm
WD=$OUT/world
mkdir -p "$WD"
SETS="--set data.root=$WD --set data.num_items=105000 --set data.num_users=1370000 \
 --set data.days=365 --set data.repeat_prob=0.10"
FAILED=""

run() {  # run <name> <timeout_s> <cmd...>
  # tmp-then-mv: the stage JSON only exists once the stage SUCCEEDED, so
  # the [ -s ... ] resume guards can't skip a failed/timed-out stage that
  # tee'd partial output (ADVICE r3)
  local name=$1 tmo=$2; shift 2
  if timeout "$tmo" python -m recsys_tpu.pipeline.cli "$@" $SETS \
      | tee "$OUT/$name.json.tmp"; then
    mv "$OUT/$name.json.tmp" "$OUT/$name.json"
  else
    rm -f "$OUT/$name.json.tmp"; FAILED="$FAILED $name"
  fi
}

[ -f "$WD/transactions.parquet" ] || \
  JAX_PLATFORMS=cpu python -m recsys_tpu.pipeline.cli gen-data $SETS \
    | tee "$OUT/gen.json" || exit 1
[ -f "$WD/targets_val.json" ] || \
  JAX_PLATFORMS=cpu python -m recsys_tpu.pipeline.cli etl $SETS \
    | tee "$OUT/etl.json" || exit 1
[ -s "$OUT/item.json" ] || run item 7200 train-item --set simcse.epochs=3
[ -z "$FAILED" ] || { echo "HM-SHAPE-FAILED:$FAILED"; exit 1; }
[ -s "$OUT/vectorize.json" ] || run vectorize 3600 vectorize
[ -z "$FAILED" ] || { echo "HM-SHAPE-FAILED:$FAILED"; exit 1; }
[ -s "$OUT/user.json" ] || run user 14400 train-user --set user_train.ckpt_every=5
# steps cap ~= the reference's own epoch length (1375 steps at 11.3M edges,
# v1_lightgcl.py:645); an uncapped epoch here is ~4k full-graph steps at
# ~4x the per-step propagation cost (57M vs 11.3M edges)
[ -s "$OUT/gnn.json" ] || run gnn 10800 train-gnn --set gnn.epochs=1 \
  --set gnn.steps_per_epoch_max=1500
[ -s "$OUT/distill.json" ] || run distill 3600 distill
[ -s "$OUT/hybrid.json" ] || run hybrid 10800 train-hybrid \
  --set user_train.epochs=2 --set user_train.ckpt_every=1
[ -s "$OUT/eval.json" ] || run eval 7200 eval
if [ -n "$FAILED" ]; then echo "HM-SHAPE-PARTIAL failed:$FAILED"; exit 1; fi
echo HM-SHAPE-DONE
