#!/bin/bash
# Round-5 extras: the VERDICT r4 items cut from the post-wipe recovery
# orchestrator (tools/r5b_orchestrate.sh) to protect the matched-scale
# pose chain. Run AFTER the main chain's pose_b stage; it pauses r5b by
# holding /tmp/r5_cpu_busy (r5b's probe waits on that flag between
# stages) so the chip is never contended.
#
#   ha_* / ha_report   HA throughput + int8-vs-bf16 label agreement with
#                      deterministic keys (VERDICT r4 #3, first half)
#   serving_eval       int8 serving end-task requalify through the
#                      HPatches protocol (VERDICT r4 #3, second half;
#                      needs a demo_sp_ctl checkpoint)
#   sphere_sparse +    occupancy skipping on a genuinely sparse scene
#   bench_nerf_sparse  (VERDICT r4 #6: win >=1.5x or record the negative)
#
# Usage: nohup bash tools/r5c_extras.sh &
set -u
cd "$(dirname "$0")/.."
export SPNERF_ROOT=/root/repo/runs
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
LOG=runs/logs/r5c_extras.log
mkdir -p runs/logs docs/evidence
exec >> "$LOG" 2>&1
echo "##### extras start $(date -u) pid $$"

PAUSE=/tmp/r5_cpu_busy
touch "$PAUSE"
trap 'rm -f "$PAUSE"' EXIT
# let any in-flight r5b stage drain before grabbing the chip
while [ -f /tmp/r5_busy ]; do
    echo "$(date -u +%H:%M:%S) waiting for r5b stage to drain"
    sleep 60
done

probe() {
    local n=0
    until timeout 120 python -c \
        "import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); (x @ x).block_until_ready(); print('PROBE_OK')" \
        >/dev/null 2>&1; do
        n=$((n + 1))
        echo "$(date -u +%H:%M:%S) probe #$n failed; retry in 120s"
        sleep 120
    done
}

stage() {
    local name=$1 attempts=$2 tmo=$3; shift 3
    local done_flag="runs/logs/r5c_${name}.done"
    if [ -f "$done_flag" ]; then
        echo "=== stage $name already done, skipping"
        return 0
    fi
    local a
    for a in $(seq 1 "$attempts"); do
        echo "=== $(date -u) stage $name attempt $a/$attempts: $*"
        probe
        local rc=0
        timeout "$tmo" "$@" || rc=$?
        if [ "$rc" -eq 0 ]; then
            touch "$done_flag"
            echo "=== $(date -u) stage $name OK"
            return 0
        fi
        echo "=== $(date -u) stage $name attempt $a failed (rc=$rc)"
        sleep 30
    done
    echo "=== stage $name GIVING UP after $attempts attempts"
    return 1
}

latest_iter() {
    ls "$SPNERF_ROOT/ckpts/$1/$1"_*.ckpt 2>/dev/null |
        sed -E 's/.*_([0-9]+)\.ckpt/\1/' | sort -n | tail -1
}
MP_CKPT="demo_mp/demo_mp_$(latest_iter demo_mp).ckpt"

# 1. HA probes over the stand-in COCO corpus (500 imgs via truncate)
HA_CMD="python -m spnerf_tpu.cli --config-path demo/configs/coco_export_demo.yaml \
    --task export_pseudo_labels --split training \
    --set pretrained=$MP_CKPT --set data.truncate=0.1"
stage ha_bf16 2 5400 bash -c "$HA_CMD --set data.experiment_name=ha_r5_bf16"
stage ha_int8 2 5400 bash -c "$HA_CMD --set data.experiment_name=ha_r5_int8 --set export.serving=int8 --set data.batch_size=32"
stage ha_report 2 600 bash -c '
  set -o pipefail
  R=$SPNERF_ROOT/outputs/outputs
  { python tools/ha_rate.py  "$R/ha_r5_bf16/training"  --label bf16_b32
    python tools/ha_rate.py  "$R/ha_r5_int8/training"  --label int8_b32
    python tools/label_iou.py "$R/ha_r5_bf16/training" "$R/ha_r5_int8/training" --label bf16_vs_int8_deterministic_keys
  } | tee docs/evidence/ha_r5_report.jsonl'

# 2. int8 serving end-task requalify (latest control checkpoint)
if [ -n "$(latest_iter demo_sp_ctl)" ]; then
    stage serving_eval 2 7200 bash -c '
      set -o pipefail
      it=$(ls "$SPNERF_ROOT"/ckpts/demo_sp_ctl/demo_sp_ctl_*.ckpt | sed -E "s/.*_([0-9]+)\.ckpt/\1/" | sort -n | tail -1)
      python benchmarks/eval_serving_demo.py --pretrained "demo_sp_ctl/demo_sp_ctl_${it}.ckpt" \
          --json-out docs/evidence/serving_requalify_r5.jsonl'
else
    echo "no demo_sp_ctl checkpoint yet; skipping serving_eval"
fi

# 3. occupancy skipping on a genuinely sparse scene
stage sphere_sparse 2 3600 bash -c 'set -o pipefail; python benchmarks/nerf_quality_sphere.py --radius 0.5 --save | tee -a docs/evidence/nerf_quality_r5.txt'
stage bench_nerf_sparse 2 3600 bash -c 'set -o pipefail; SPNERF_RENDER_FIELD=sphere_field_sparse.npz python bench_nerf.py | tee docs/evidence/bench_nerf_sparse_r5.json'

git add docs/evidence 2>/dev/null
git diff --cached --quiet || git commit -q -m "r5 extras: HA probes, serving requalify, sparse-scene occupancy captures

No-Verification-Needed: evidence capture files only" || true
echo "##### extras finished $(date -u)"
