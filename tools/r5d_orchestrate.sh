#!/bin/bash
# Round-5 FINAL-HOUR orchestrator. A THIRD VM wipe (before 00:17 UTC
# Aug 20) again destroyed runs/ — checkpoints, fabricated data, done
# flags — leaving ~1h of round. The two-arm matched-corpus training
# experiment cannot fit (its SuperPoint train-step XLA compile alone
# took >53 min on this 1-core host, see r5_orch_log.txt), so this
# chain lands the highest-value evidence that IS feasible:
#
#   * NeRF-depth label fidelity vs GT depth (VERDICT r4 #4) — never
#     captured in any round; needs only MagicPoint (fast compile) +
#     scene NeRFs (~2 min/scene) + the export solver.
#   * NeRF-vs-GT novel-view test PSNR per scene (VERDICT r4 weak #5).
#
# Budget cuts vs r5b: MagicPoint 8k -> 5k iters, scenes 5 -> 3.
# Wipe insurance: the MagicPoint checkpoint is COMMITTED into
# demo/pretrained/ as soon as it lands, so a fourth wipe cannot zero
# the base detector again.
#
# Usage: nohup bash tools/r5d_orchestrate.sh &   (logs to runs/logs/)
set -u
cd "$(dirname "$0")/.."
export SPNERF_ROOT=/root/repo/runs
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
export SPNERF_MP_TARGET=5000
export SPNERF_MP_VALIDATE=0
export SPNERF_N_SCENES=3
export SPNERF_N_TRAIN_VIEWS=60
LOG=runs/logs/r5d_orch.log
mkdir -p runs/logs docs/evidence
exec >> "$LOG" 2>&1
PIDFILE=runs/logs/r5d_orch.pid
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
        if timeout 180 python -c \
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
    local done_flag="runs/logs/r5d_${name}.done"
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
    cp -f "$LOG" docs/evidence/r5d_orch_log.txt 2>/dev/null || true
    git add docs/evidence demo/pretrained 2>/dev/null
    git diff --cached --quiet || git commit -q -m "r5d orchestrator: sync captured evidence

No-Verification-Needed: evidence capture files only" || true
}

commit_mp_ckpt() {
    local it
    it=$(ls runs/ckpts/demo_mp/demo_mp_*.ckpt 2>/dev/null |
         sed -E 's/.*_([0-9]+)\.ckpt/\1/' | sort -n | tail -1)
    [ -n "$it" ] || return 0
    mkdir -p demo/pretrained
    cp -f "runs/ckpts/demo_mp/demo_mp_${it}.ckpt" demo/pretrained/
    git add -f demo/pretrained/"demo_mp_${it}.ckpt"
    git diff --cached --quiet || git commit -q -m \
        "Wipe insurance: commit the ${it}-iter MagicPoint base checkpoint

No-Verification-Needed: binary artifact + evidence only"
}

# 1. MagicPoint base (the only training leg that compiles fast enough)
stage mp 4 5400 bash demo/run_demo.sh mp
commit_mp_ckpt
sync_evidence

# 2. fabricated scenes -> per-scene NeRF fields + rendered views
stage nerf_data 2 1800 bash demo/run_demo.sh nerf_data
stage nerf      4 5400 bash demo/run_demo.sh nerf
stage gt_views  2 2400 python demo/render_gt_test_views.py --n-test-views 12
stage test_psnr 2 1800 python tools/nerf_test_psnr.py
sync_evidence

# 3. NeRF label export (NeRF depth), then the fidelity comparison
#    against GT-raytraced depth (VERDICT r4 #4)
stage nerf_export 4 5400 bash demo/run_demo.sh nerf_export
stage label_fid   3 5400 python tools/label_fidelity.py --n-scenes 3
sync_evidence

echo "##### orchestrator finished $(date -u)"
