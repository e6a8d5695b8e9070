#!/bin/bash
# The whole pipeline + deploy + compact serving, end-to-end on the REAL TPU
# chip (CI covers it on the CPU mesh; this validates Mosaic compilation and
# on-chip numerics of the full training/serving CLI paths).
#
# Uses the one-shot orchestrator so the REAL layout is exercised: stage-2
# checkpoints in sub-model{i}, distill (gated) checkpoints in sub-dataset{i},
# the gated ensemble, and deploy from the ensemble checkpoint — the old
# per-stage script fused UN-distilled backbones (no gates on the TPU path).
set -e
cd /root/repo
OUT=/tmp/tpu_smoke
rm -rf $OUT && mkdir -p $OUT
# patch 4 (seq 66), 4 heads: with the geometry-TRUE analytic MACs budget the
# layer FLOPs must dominate the fixed embedding term or the stage-3 window is
# infeasible (same geometry as tests/test_pipeline_e2e.py)
TINY="--input-size 32 --patch-size 4 --embed-dim 32 --depth 2 --num-heads 4 --drop-path 0.0"
OPT="--batch-size 32 --eval-batch-size 64 --epochs 1 --warmup-epochs 0 --cooldown-epochs 0 --lr 2e-3 --no-scale-lr"
DATA="--dataset synthetic:8:256:32 --num_division 2"

echo "=== one-shot pipeline: split -> train_sub x2 -> shrink x2 -> distill x2 -> ensemble -> deploy"
python -m devit_tpu.cli pipeline $TINY $OPT $DATA \
  --model dedeit --no-repeated-aug --aa "" \
  --shrink-ratio 0.45 --ub 0.9 --population 4 --candidate-chunk 2 \
  --teacher-size 48 --deploy-num-classes 8 --neuron-multiple 8 \
  --output_dir $OUT

test -f $OUT/ensemble/checkpoint.msgpack
test -f $OUT/deploy/deploy_report.json

echo "=== compact serving eval (the bench path, from the deploy artifacts)"
python -m devit_tpu.cli ensemble $TINY $OPT $DATA --eval \
  --compact-path $OUT/deploy --teacher-size 48 \
  --ens-path $OUT/ensemble/checkpoint.msgpack --output_dir $OUT/ens_eval \
  --no-repeated-aug --aa ""

echo "=== TPU SMOKE: ALL STAGES OK"
