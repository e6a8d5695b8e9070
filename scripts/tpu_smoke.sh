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

echo "=== serving daemon on-chip (AOT-cached bucket programs + restart reload)"
SERVE="--compact-path $OUT/deploy --ens-path $OUT/ensemble/checkpoint.msgpack
  --input-size 32 --patch-size 4 --teacher-size 48 --buckets 1,4
  --host 127.0.0.1 --port 8731 --aot-cache on"
export DEVIT_AOT_CACHE=$OUT/aot
SPID=""
trap '[ -n "$SPID" ] && kill $SPID 2>/dev/null' EXIT  # never orphan the daemon
serve_once() {
  python -m devit_tpu.cli serve $SERVE > $OUT/serve_$1.log 2>&1 &
  SPID=$!
  up=0
  # generous budget: the tunnel's first device round-trip per process can
  # stall many minutes (CLAUDE.md round-5 root cause) and warmup pays it
  for i in $(seq 1 300); do
    sleep 5
    if curl -sf http://127.0.0.1:8731/healthz > /dev/null 2>&1; then up=1; break; fi
    kill -0 $SPID 2>/dev/null || { echo "serve daemon died:"; cat $OUT/serve_$1.log; exit 1; }
  done
  [ "$up" = 1 ] || { echo "serve daemon never became healthy:"; cat $OUT/serve_$1.log; exit 1; }
  python - <<'EOF'
import json, urllib.request
import numpy as np
img = np.random.default_rng(0).integers(0, 256, (2, 32, 32, 3), np.uint8)
req = urllib.request.Request(
    "http://127.0.0.1:8731/predict", data=img.tobytes(),
    headers={"X-Image-Shape": "2,32,32,3"})
out = json.loads(urllib.request.urlopen(req, timeout=300).read())
assert len(out["predictions"]) == 2, out
print("serve predict OK:", [p["topk"][0] for p in out["predictions"]])
EOF
  kill $SPID; wait $SPID 2>/dev/null || true
  SPID=""
}
serve_once cold
grep -q "aot_cache: compiled serve-fwd" $OUT/serve_cold.log
serve_once warm   # restart: bucket programs must load from the cache
grep -q "aot_cache: loaded serve-fwd" $OUT/serve_warm.log

echo "=== TPU SMOKE: ALL STAGES OK"
