#!/bin/bash
# Round-4 chip orchestrator: runs every on-chip leg serially, gated on a
# subprocess TPU probe (the tunneled worker has two outage modes: fast
# init failure and a hang where even `import jax` blocks — both are
# survived by probing in a child with a timeout). Every leg is
# resumable (train legs resume from the newest checkpoint; renders skip
# finished scenes; exports skip existing files), so retries are cheap.
#
# Usage: nohup bash tools/r4_orchestrate.sh &   (logs to runs/logs/)
set -u
cd "$(dirname "$0")/.."
export SPNERF_ROOT=/root/repo/runs
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
# direct `python demo/<script>.py` invocations need the repo on the path
# (run_demo.sh sets this itself; the bare stages don't)
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
LOG=runs/logs/r4_orch.log
mkdir -p runs/logs docs/evidence
exec >> "$LOG" 2>&1
# single-instance guard + kill handle (kill "$(cat runs/logs/r4_orch.pid)")
PIDFILE=runs/logs/r4_orch.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    echo "another orchestrator (pid $(cat "$PIDFILE")) is live; exiting"
    exit 1
fi
echo $$ > "$PIDFILE"
echo "##### orchestrator start $(date -u) pid $$"

# While a chip leg runs the host core is owned by the loader: other
# sessions check this flag before starting CPU-heavy work.
BUSY=/tmp/r4_busy
trap 'rm -f "$BUSY"' EXIT

probe() {
    local n=0
    while true; do
        # a sibling session doing heavy CPU work (test suite, data gen)
        # raises this flag: wait it out so bench/train captures aren't
        # polluted by host-core contention (1-core host)
        while [ -f /tmp/r4_cpu_busy ]; do
            echo "$(date -u +%H:%M:%S) waiting on /tmp/r4_cpu_busy"
            sleep 60
        done
        if timeout 120 python -c \
            "import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); (x @ x).block_until_ready(); print('PROBE_OK')" \
            >/dev/null 2>&1; then
            return 0
        fi
        n=$((n + 1))
        echo "$(date -u +%H:%M:%S) probe #$n failed; retry in 120s"
        sleep 120
    done
}

# stage <name> <attempts> <per_attempt_timeout_s> <cmd...>
stage() {
    local name=$1 attempts=$2 tmo=$3; shift 3
    local done_flag="runs/logs/r4_${name}.done"
    if [ -f "$done_flag" ]; then
        echo "=== stage $name already done, skipping"
        return 0
    fi
    local a
    for a in $(seq 1 "$attempts"); do
        echo "=== $(date -u) stage $name attempt $a/$attempts: $*"
        probe
        touch "$BUSY"
        local rc=0
        timeout "$tmo" "$@" || rc=$?
        rm -f "$BUSY"
        if [ "$rc" -eq 0 ]; then
            touch "$done_flag"
            echo "=== $(date -u) stage $name OK"
            return 0
        fi
        echo "=== $(date -u) stage $name attempt $a failed (rc=$rc)"
        sleep 60
    done
    echo "=== stage $name GIVING UP after $attempts attempts"
    return 1
}

# Sync the evidence doc's tables from whatever capture files exist and
# commit them — host-only and instant; run after every capture group so
# evidence is committed even if the tunnel dies mid-plan.
sync_evidence() {
    python tools/fill_perf_table.py || true
    # snapshot the run log INTO the repo (runs/ is gitignored and wiped
    # between rounds; committed evidence must live under docs/)
    cp -f "$LOG" docs/evidence/r4_orch_log.txt 2>/dev/null || true
    git add docs/evidence 2>/dev/null
    git diff --cached --quiet || git commit -q -m "r4 orchestrator: sync captured evidence

No-Verification-Needed: evidence capture files only" || true
}

# 0. the VM hosting this round was rebooted and runs/ (gitignored) was
#    wiped — every checkpoint and the stand-in corpora are gone. The
#    plan below bootstraps the full chain from scratch: quick perf
#    captures first (outage insurance), then data gen, then MagicPoint
#    -> HA export -> the NeRF-supervision chain (VERDICT #1 three
#    rounds running) -> the homography SP leg -> evals -> HA probes ->
#    NeRF renderer. Every stage is resumable (train legs checkpoint
#    every 2k iters; data gens skip existing files), so retries are
#    cheap and a partial round still yields scoreable rows.
stage bench 3 2700 bash -c 'set -o pipefail; python bench.py | tee docs/evidence/bench_r4_capture.json'
stage bench_train 3 3600 bash -c 'set -o pipefail; python bench_train.py | tee docs/evidence/bench_train_r4.jsonl'
sync_evidence

# 1. host-side data fabrication (CPU-only, seeds frozen -> bit-identical
#    corpora to rounds 2-3)
stage data      2 10800 python demo/make_standin_data.py
stage nerf_data 2 7200  python demo/make_nerf_scenes.py
sync_evidence

# 2. bootstrap detector: MagicPoint 25k (includes lazy synthetic-shapes
#    generation on the first attempt) then HA pseudo-labels for the SP leg
stage mp     8 10800 bash demo/run_demo.sh mp
stage export 4 7200  bash demo/run_demo.sh export
sync_evidence

# 3. the NeRF-supervision chain (VERDICT #1)
stage nerf      4 10800 python demo/run_nerf_leg.py
stage nerf_export 4 7200 bash demo/run_demo.sh nerf_export
stage nerf_sp   8 7200 bash demo/run_demo.sh nerf_sp
stage pose      3 7200 bash demo/run_demo.sh pose
sync_evidence

# 4. finish the homography demo leg + quality evals, then the NeRF
#    renderer measurement (VERDICT #3): train + save the sphere field
#    so bench_nerf measures the occupancy-skipping path (and the
#    >=39 dB quality gate is re-proven on chip)
stage sp        8 10800 bash demo/run_demo.sh sp
stage pose_final 3 7200 bash demo/run_demo.sh pose
stage eval      3 7200 bash demo/run_demo.sh eval
sync_evidence
stage sphere_field 3 3600 bash -c 'set -o pipefail; python benchmarks/nerf_quality_sphere.py --save | tee docs/evidence/nerf_quality_r4.txt'
stage bench_nerf 3 3600 bash -c 'set -o pipefail; python bench_nerf.py | tee docs/evidence/bench_nerf_r4.json'
stage stage_breakdown 3 3600 bash -c 'set -o pipefail; python benchmarks/stage_breakdown.py | tee docs/evidence/stage_breakdown_r4.txt'
sync_evidence

# 5. HA throughput + label-agreement probes: 500 stand-in images each
#    (truncate is a fraction of the 5k corpus). The mixed stack (int8
#    backbone + bf16 heads) is the round-4 candidate to close the int8
#    exact-IoU gap at det_thresh 0.001 (VERDICT #7).
HA_CMD='python -m spnerf_tpu.cli --config-path demo/configs/coco_export_demo.yaml --task export_pseudo_labels --split training --set data.truncate=0.1'
stage ha_bf16  3 7200 bash -c "$HA_CMD --set data.experiment_name=ha_r4_bf16"
stage ha_mixed 3 7200 bash -c "$HA_CMD --set data.experiment_name=ha_r4_mixed --set export.serving=mixed --set data.batch_size=32"
stage ha_int8  3 7200 bash -c "$HA_CMD --set data.experiment_name=ha_r4_int8 --set export.serving=int8 --set data.batch_size=32"
stage ha_bf16serv 3 7200 bash -c "$HA_CMD --set data.experiment_name=ha_r4_bf16serv --set export.serving=bf16 --set data.batch_size=16"
stage ha_report 2 600 bash -c '
  set -o pipefail
  R=$SPNERF_ROOT/outputs/outputs
  { python tools/ha_rate.py  "$R/ha_r4_bf16/training"  --label bf16_b16
    python tools/ha_rate.py  "$R/ha_r4_mixed/training" --label mixed_b32
    python tools/ha_rate.py  "$R/ha_r4_int8/training"  --label int8_b32
    python tools/ha_rate.py  "$R/ha_r4_bf16serv/training" --label bf16serv_b16
    python tools/label_iou.py "$R/ha_r4_bf16/training" "$R/ha_r4_mixed/training" --label bf16_vs_mixed
    python tools/label_iou.py "$R/ha_r4_bf16/training" "$R/ha_r4_int8/training"  --label bf16_vs_int8
    python tools/label_iou.py "$R/ha_r4_bf16/training" "$R/ha_r4_bf16serv/training" --label bf16_vs_bf16serv
  } | tee docs/evidence/ha_r4_report.jsonl'

sync_evidence

echo "##### orchestrator finished $(date -u)"
