#!/bin/bash
# Round-5 RECOVERY orchestrator. A second mid-round VM wipe (19:27 UTC)
# destroyed runs/ — all checkpoints, fabricated data and done flags —
# with ~3h of round left, so this is the matched-data-scale experiment
# (VERDICT r4 #1) re-planned to fit the remaining chip budget:
#
#   MagicPoint base     15k -> 8k iters, no in-train validation
#   fabricated scenes   10  -> 5 scenes x 60 rendered views (300-view
#                       corpus; still 2.1x the round-4 144 and, the
#                       point of the experiment, IDENTICAL for both
#                       supervision arms)
#   supervision arms    12k -> 6k iters first pass (pose rows every
#                       2k), then extended in 2k steps while wall-clock
#                       remains
#
# Same probe-gated/resumable machinery as tools/r4_orchestrate.sh;
# every stage is individually re-runnable and the pose leg is
# row-idempotent, so a third outage loses at most one stage.
#
# Usage: nohup bash tools/r5b_orchestrate.sh &   (logs to runs/logs/)
set -u
cd "$(dirname "$0")/.."
export SPNERF_ROOT=/root/repo/runs
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
export SPNERF_MP_TARGET=8000
export SPNERF_MP_VALIDATE=0
export SPNERF_N_SCENES=5
export SPNERF_N_TRAIN_VIEWS=60
export SPNERF_SP_TARGET=6000
LOG=runs/logs/r5b_orch.log
mkdir -p runs/logs docs/evidence
exec >> "$LOG" 2>&1
PIDFILE=runs/logs/r5b_orch.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    echo "another orchestrator (pid $(cat "$PIDFILE")) is live; exiting"
    exit 1
fi
echo $$ > "$PIDFILE"
echo "##### orchestrator start $(date -u) pid $$"

BUSY=/tmp/r5_busy
trap 'rm -f "$BUSY"' EXIT

probe() {
    local n=0
    while true; do
        while [ -f /tmp/r5_cpu_busy ]; do
            echo "$(date -u +%H:%M:%S) waiting on /tmp/r5_cpu_busy"
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

stage() {
    local name=$1 attempts=$2 tmo=$3; shift 3
    local done_flag="runs/logs/r5b_${name}.done"
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
        sleep 30
    done
    echo "=== stage $name GIVING UP after $attempts attempts"
    return 1
}

sync_evidence() {
    python tools/fill_perf_table.py || true
    python tools/fill_pose_table.py || true
    python tools/pose_stability.py || true
    cp -f "$LOG" docs/evidence/r5_orch_log.txt 2>/dev/null || true
    git add docs/evidence 2>/dev/null
    git diff --cached --quiet || git commit -q -m "r5 orchestrator: sync captured evidence

No-Verification-Needed: evidence capture files only" || true
}

# 0. host-side data fabrication (fast), then the one long base leg
stage data      2 3600 python demo/make_standin_data.py
stage nerf_data 2 3600 bash demo/run_demo.sh nerf_data
stage mp        6 5400 bash demo/run_demo.sh mp
sync_evidence

# 1. matched-scale two-arm chain: scene NeRFs (resumable per scene),
#    GT eval views, label exports for both arms, 6k-iter training legs,
#    pose sweeps after each arm so rows land incrementally
stage nerf        6 7200 bash demo/run_demo.sh nerf
stage gt_views    2 3600 python demo/render_gt_test_views.py --n-test-views 12
stage nerf_export 4 5400 bash demo/run_demo.sh nerf_export
stage link        2 600  bash demo/run_demo.sh link
stage ctl_export  3 3600 bash demo/run_demo.sh ctl_export
sync_evidence
stage nerf_sp 6 7200 bash demo/run_demo.sh nerf_sp
stage pose_a  3 5400 bash demo/run_demo.sh pose
sync_evidence
stage ctl_sp  6 7200 bash demo/run_demo.sh ctl_sp
stage pose_b  3 5400 bash demo/run_demo.sh pose
stage live_steps 2 600 python tools/live_steps.py
sync_evidence

# 2. NeRF-depth label fidelity vs GT depth (VERDICT r4 #4) + quality
stage label_fid 2 5400 python tools/label_fidelity.py
stage eval      2 5400 bash demo/run_demo.sh eval
sync_evidence

# 3. insurance perf captures (headline renderer numbers were captured
#    pre-wipe and are committed; re-capture cheaply so the round ends
#    with a fresh, reproducible bench set)
stage sphere_w32 3 3600 bash -c 'set -o pipefail; python benchmarks/nerf_quality_sphere.py --width 32 --save | tee -a docs/evidence/nerf_quality_r5.txt'
stage bench_nerf 3 3600 bash -c 'set -o pipefail; python bench_nerf.py | tee docs/evidence/bench_nerf_r5b.json'
stage bench_train 3 3600 bash -c 'set -o pipefail; python bench_train.py | tee docs/evidence/bench_train_r5.jsonl'
stage bench_final 3 2700 bash -c 'set -o pipefail; python bench.py | tee docs/evidence/bench_r5_capture.json'
sync_evidence

# 4. open-ended: extend both arms in 2k steps while wall-clock remains
#    (VERDICT r4 #9 — training depth), pose rows after each extension
for tgt in 8000 10000 12000 16000 20000; do
    stage "nerf_sp_$tgt" 2 7200 env SPNERF_SP_TARGET="$tgt" bash demo/run_demo.sh nerf_sp
    stage "ctl_sp_$tgt"  2 7200 env SPNERF_SP_TARGET="$tgt" bash demo/run_demo.sh ctl_sp
    stage "pose_$tgt"    2 5400 bash demo/run_demo.sh pose
    sync_evidence
done

echo "##### orchestrator finished $(date -u)"
