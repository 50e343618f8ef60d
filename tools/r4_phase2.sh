#!/bin/bash
# Round-4 phase 2: post-chain captures. Waits for the main orchestrator
# (tools/r4_orchestrate.sh) to finish, then runs the deferred perf
# sweeps on the then-idle chip:
#   1. renderer (block, s_chunk) sweep through bench_nerf's env knobs
#   2. serving batch-size sweep through bench.py's env knob
#   3. bench_train re-capture (the step now includes device photometric)
#   4. dryrun_multichip on a virtual 8-device CPU mesh (chip-free)
# Usage: nohup bash tools/r4_phase2.sh &   (logs to runs/logs/)
set -u
cd "$(dirname "$0")/.."
export SPNERF_ROOT=/root/repo/runs
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
LOG=runs/logs/r4_phase2.log
mkdir -p runs/logs docs/evidence
exec >> "$LOG" 2>&1
PIDFILE=runs/logs/r4_phase2.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    echo "another phase2 (pid $(cat "$PIDFILE")) is live; exiting"
    exit 1
fi
echo $$ > "$PIDFILE"
echo "##### phase2 start $(date -u) pid $$"

MAIN_PID=runs/logs/r4_orch.pid
while [ -f "$MAIN_PID" ] && kill -0 "$(cat "$MAIN_PID")" 2>/dev/null; do
    sleep 120
done
echo "$(date -u) main orchestrator finished; starting phase-2 captures"

probe() {
    local n=0
    while true; do
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
    local done_flag="runs/logs/r4p2_${name}.done"
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
        sleep 60
    done
    echo "=== stage $name GIVING UP after $attempts attempts"
    return 1
}

sync_evidence() {
    python tools/fill_perf_table.py || true
    cp -f "$LOG" docs/evidence/r4_phase2_log.txt 2>/dev/null || true
    git add docs/evidence 2>/dev/null
    git diff --cached --quiet || git commit -q -m "r4 phase2: sync captured evidence

No-Verification-Needed: evidence capture files only" || true
}

# 1. renderer sweep: block x s_chunk over the trained sphere field
stage render_sweep 2 5400 bash -c '
  set -o pipefail
  : > docs/evidence/render_sweep_r4.jsonl
  for combo in "512 8" "512 16" "256 8" "1024 8" "512 4" "256 16"; do
    set -- $combo
    echo "--- block=$1 s_chunk=$2"
    SPNERF_RENDER_BLOCK=$1 SPNERF_RENDER_CHUNK=$2 timeout 900 python bench_nerf.py \
      | tee -a docs/evidence/render_sweep_r4.jsonl || exit 1
  done'
sync_evidence

# 2. serving batch sweep (the driver bench runs the repo default; this
#    tells us whether the default should move)
stage batch_sweep 2 5400 bash -c '
  set -o pipefail
  : > docs/evidence/bench_batch_sweep_r4.jsonl
  for b in 64 96 128; do
    echo "--- batch=$b"
    SPNERF_BENCH_BATCH=$b timeout 1800 python bench.py \
      | tee -a docs/evidence/bench_batch_sweep_r4.jsonl || exit 1
  done'
sync_evidence

# 3. train-step re-capture: the jitted step now includes on-device
#    photometric (appends; the table reads the last line per metric)
stage bench_train2 2 3600 bash -c 'set -o pipefail; python bench_train.py | tee -a docs/evidence/bench_train_r4.jsonl'
sync_evidence

# 4. multichip dryrun on a virtual 8-device CPU mesh (validates the
#    sharded path incl. the new photometric stage; chip not needed)
stage dryrun 2 5400 bash -c '
  set -o pipefail
  JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" \
    | tee docs/evidence/multichip_local_r4.txt'
sync_evidence

echo "##### phase2 finished $(date -u)"
