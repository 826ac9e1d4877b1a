#!/bin/bash
# 10x-reference-catalog run: 470k items / 500k users / 365 days — scale
# the reference (47k-item H&M catalog, single GPU) cannot touch. Full
# stack on one TPU chip; epochs trimmed to keep wall-clock ~2-3h.
set -u -o pipefail
cd "$(dirname "$0")/.."
OUT=artifacts/quality_xxl
WD=$OUT/world
mkdir -p "$WD"
SETS="--set data.root=$WD --set data.num_items=470000 --set data.num_users=500000 --set data.days=365"

JAX_PLATFORMS=cpu python -m recsys_tpu.pipeline.cli gen-data $SETS | tee "$OUT/gen.json" || exit 1
JAX_PLATFORMS=cpu python -m recsys_tpu.pipeline.cli etl $SETS | tee "$OUT/etl.json" || exit 1
timeout 7200 python -m recsys_tpu.pipeline.cli train-item $SETS \
  --set simcse.epochs=2 | tee "$OUT/item.json" || exit 1
timeout 3600 python -m recsys_tpu.pipeline.cli vectorize $SETS || exit 1
timeout 14400 python -m recsys_tpu.pipeline.cli train-user $SETS \
  --set user_train.epochs=8 --set user_train.ckpt_every=4 | tee "$OUT/user.json"
timeout 10800 python -m recsys_tpu.pipeline.cli train-gnn $SETS \
  --set gnn.epochs=3 | tee "$OUT/gnn.json"
timeout 3600 python -m recsys_tpu.pipeline.cli distill $SETS | tee "$OUT/distill.json"
timeout 14400 python -m recsys_tpu.pipeline.cli train-hybrid $SETS \
  --set user_train.epochs=4 --set user_train.ckpt_every=2 | tee "$OUT/hybrid.json"
timeout 3600 python -m recsys_tpu.pipeline.cli eval $SETS | tee "$OUT/eval.json"
echo XXL-DONE
