#!/bin/bash
set -u
cd /root/repo
export SPNERF_ROOT=/root/repo/runs
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
out=docs/evidence/pose_auc_results.jsonl
for it in 30000 34000 38000 42000 46000; do
  echo "== pose AUC: demo_sp_${it} =="
  timeout 1200 python -m spnerf_tpu.eval.pose --config-path demo/configs/pose_demo.yaml \
    --set pretrained="demo_sp/demo_sp_${it}.ckpt" \
    --json-out "$out" || echo "FAILED it=$it"
done
echo "POSE SWEEP2 DONE"
