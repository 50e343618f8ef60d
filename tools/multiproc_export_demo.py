"""Demo-scale 2-process HA export (VERDICT r4 #8).

Runs the homographic-adaptation pseudo-label export as TWO coordinated
``jax.distributed`` processes (gloo stand-in for DCN, CPU backend — the
round's single tunneled TPU chip cannot be shared between processes),
each exporting its contiguous block of the stand-in COCO corpus via
``data.shard=auto`` (spnerf_tpu/data/coco.py), into ONE shared
experiment directory. Then re-runs single-process into a second
directory and byte-compares the artifact sets: because per-image warp
keys are fold_in(seed, global_index) and shards are contiguous blocks
carrying their global offset, the merged multi-process artifacts must
be bit-identical to the single-process export.

Reference anchor: the reference's export solver is single-process
(engine_solvers/export.py:17-131); multi-host sharding is a capability
the reference does not have (SURVEY §5 distributed-backend plan).

Writes one JSON line per run + the equality verdict to --json-out.

Usage:
    python tools/multiproc_export_demo.py \
        [--truncate 0.1] [--ha-num 8] [--json-out out.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
CFG = REPO / "demo/configs/coco_export_demo.yaml"


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def cli_cmd(exper: str, args, extra=()):
    mp_dir = Path(os.environ.get("SPNERF_ROOT", REPO / "runs"),
                  "ckpts", "demo_mp")
    its = sorted(int(p.stem.rsplit("_", 1)[1])
                 for p in mp_dir.glob("demo_mp_*.ckpt"))
    if not its:
        sys.exit("no demo_mp checkpoint; run the mp demo leg first")
    return [
        sys.executable, "-m", "spnerf_tpu.cli", "--config-path", str(CFG),
        "--task", "export_pseudo_labels", "--split", "training",
        "--set", f"pretrained=demo_mp/demo_mp_{its[-1]}.ckpt",
        "--set", f"data.truncate={args.truncate}",
        "--set", "data.preprocessing.resize=[120,160]",
        "--set", f"homography_adaptation.num={args.ha_num}",
        "--set", f"homography_adaptation.chunk={min(args.ha_num, 4)}",
        "--set", f"data.experiment_name={exper}",
        *extra,
    ]


def base_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(REPO) + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    return env


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--truncate", type=float, default=0.1)
    ap.add_argument("--ha-num", type=int, default=8)
    ap.add_argument("--json-out", default="docs/evidence/multiproc_export_r5.jsonl")
    args = ap.parse_args()

    rows = []

    # --- 2-process coordinated export, shared experiment dir ----------
    port = free_port()
    t0 = time.time()
    procs = []
    for pid in range(2):
        env = base_env()
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            # both workers share ONE host core here, so shard-finish
            # skew can exceed jax's 300s default shutdown barrier
            "JAX_SHUTDOWN_TIMEOUT_SECONDS": "3600",
        })
        procs.append(subprocess.Popen(
            cli_cmd("mp2_shard", args, ("--set", "data.shard=auto")),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    for p in procs:
        out, _ = p.communicate(timeout=5400)
        if p.returncode != 0:
            sys.exit(f"2-proc worker failed rc={p.returncode}:\n{out[-3000:]}")
    t_multi = time.time() - t0

    # --- single-process reference run ---------------------------------
    t0 = time.time()
    r = subprocess.run(cli_cmd("mp2_single", args), env=base_env(),
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=5400)
    if r.returncode != 0:
        sys.exit(f"single-proc run failed rc={r.returncode}:\n"
                 f"{r.stdout[-3000:]}")
    t_single = time.time() - t0

    # --- byte-compare the artifact sets --------------------------------
    root = Path(os.environ.get("SPNERF_ROOT", REPO / "runs"),
                "outputs", "outputs")
    multi = {p.name: p for p in (root / "mp2_shard/training").glob("*.npy")}
    single = {p.name: p for p in (root / "mp2_single/training").glob("*.npy")}
    same_names = set(multi) == set(single)
    n_equal = sum(
        1 for n in multi
        if n in single
        and np.array_equal(np.load(multi[n]), np.load(single[n])))
    ok = same_names and n_equal == len(single) and len(single) > 0

    for label, secs in (("2proc_shard", t_multi), ("1proc", t_single)):
        rows.append({"metric": "multiproc_ha_export", "mode": label,
                     "images": len(single), "ha_num": args.ha_num,
                     "img_per_sec": round(len(single) / secs, 3),
                     "seconds": round(secs, 1)})
    rows.append({"metric": "multiproc_ha_export_equality",
                 "merged_equals_single": bool(ok),
                 "n_images": len(single), "n_byte_equal": n_equal,
                 "note": "2 gloo-coordinated processes on 1 CPU core: "
                         "equality (not speedup) is the claim; "
                         "throughput scaling needs real hosts"})

    out = Path(args.json_out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("a") as f:
        for row in rows:
            print(json.dumps(row))
            f.write(json.dumps(row) + "\n")
    if not ok:
        sys.exit("MERGED ARTIFACTS DIFFER FROM SINGLE-PROCESS EXPORT")


if __name__ == "__main__":
    main()
