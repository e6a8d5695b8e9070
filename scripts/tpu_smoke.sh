#!/bin/bash
# All five pipeline stages + deploy + compact serving, end-to-end on the REAL
# TPU chip (CI covers them on the CPU mesh; this validates Mosaic compilation
# and on-chip numerics of the full training/serving CLI paths).
set -e
cd /root/repo
OUT=/tmp/tpu_smoke
rm -rf $OUT && mkdir -p $OUT
TINY="--input-size 32 --patch-size 8 --embed-dim 32 --depth 2 --num-heads 2 --drop-path 0.0"
OPT="--batch-size 32 --eval-batch-size 64 --epochs 1 --warmup-epochs 0 --cooldown-epochs 0 --lr 1e-3"
DATA="--dataset synthetic:8:256:32 --num_division 2"
MAN="--manifest $OUT/split/division2/manifest.json"

echo "=== stage 1: split"
python -m devit_tpu.cli split $DATA --output_dir $OUT/split

echo "=== stage 2: train_sub x2 (with RandAugment + mixup on device)"
python -m devit_tpu.cli train_sub $TINY $OPT $DATA $MAN \
  --start-division 0 --output_dir $OUT/sub-dataset0 --no-repeated-aug
python -m devit_tpu.cli train_sub $TINY $OPT $DATA $MAN \
  --start-division 1 --output_dir $OUT/sub-dataset1 --no-repeated-aug --aa ""

echo "=== stage 3: shrink"
python -m devit_tpu.cli shrink $TINY $OPT $DATA $MAN --model dedeit \
  --model-path $OUT/sub-dataset0/checkpoint.msgpack \
  --start-division 0 --output_dir $OUT/shrink0 \
  --population 4 --shrink-ratio 0.3 --ub 0.8 --candidate-chunk 2

echo "=== stage 4: distill (DEKD)"
python -m devit_tpu.cli distill $TINY $OPT $DATA $MAN \
  --model-path $OUT/sub-dataset0/checkpoint.msgpack \
  --policy-path $OUT/shrink0 \
  --start-division 0 --output_dir $OUT/distill0 \
  --gama 0.2 0.1 0.3 --no-repeated-aug --aa ""

echo "=== stage 5: ensemble"
python -m devit_tpu.cli ensemble $TINY $OPT $DATA $MAN --model dedeit \
  --sub-model-path $OUT --teacher-size 48 --distillation-type none \
  --output_dir $OUT/ensemble --no-repeated-aug --aa ""

echo "=== deploy + compact serving eval"
python -m devit_tpu.cli deploy $TINY $DATA $MAN \
  --sub-model-path $OUT --deploy-num-classes 4 \
  --neuron-multiple 8 --output_dir $OUT/deployed
python -m devit_tpu.cli ensemble $TINY $OPT $DATA $MAN --eval \
  --compact-path $OUT/deployed --teacher-size 48 \
  --ens-path $OUT/ensemble/checkpoint.msgpack --output_dir $OUT/ens_eval \
  --no-repeated-aug --aa ""

echo "=== TPU SMOKE: ALL STAGES OK"
