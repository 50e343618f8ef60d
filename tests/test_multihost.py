"""Multi-host (2-process) jax.distributed execution test.

Executes parallel/distributed.py for real: two local processes, each
with 2 virtual CPU devices, form a 4-device global mesh via
``maybe_initialize_distributed`` (gloo collectives stand in for DCN) and
run (a) one data-parallel training step whose gradient psum crosses the
process boundary and (b) one homography-adaptation export shard each —
the multi-host COCO-scale export pattern named in SURVEY §5.

The reference has no distributed code at all (SURVEY §2 "Parallelism
census: none"); this pins the new framework's DCN path.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

# >=10s on the 1-core CPU host (r4 timing run); excluded from the
# quick pre-commit tier: pytest -m "not slow"
pytestmark = pytest.mark.slow

WORKER = Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    port = _free_port()
    out_dir = tmp_path / "mh"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
        })
        # each worker re-inits its own backend; drop any inherited
        # single-process device-count forcing from conftest
        env.pop("XLA_FLAGS", None)
        repo_root = str(WORKER.parent.parent)
        env["PYTHONPATH"] = repo_root + (
            ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(out_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    reports = []
    for pid in range(2):
        with open(out_dir / f"proc{pid}.json") as f:
            reports.append(json.load(f))
    assert all(r["process_count"] == 2 for r in reports)
    # the DP loss is a global psum — both processes must agree exactly
    assert reports[0]["loss"] == pytest.approx(reports[1]["loss"], abs=0.0)
    # HA export sharding: disjoint halves covering the batch
    names0, names1 = set(reports[0]["names"]), set(reports[1]["names"])
    assert names0.isdisjoint(names1)
    assert len(names0 | names1) == 4
    for name in names0 | names1:
        pts = np.load(out_dir / f"{name}.npy")
        assert pts.ndim == 2 and pts.shape[1] == 2
