"""Extract live train-step throughput from the demo legs' metric logs.

VERDICT r4 #7: the on-device-photometric fix was motivated by measured
host costs but the LIVE steps/s of a real training leg was never
re-captured. This reads every ``perf/steps_per_sec`` sample from
``$SPNERF_ROOT/ckpts/<leg>/logs/metrics.jsonl`` and appends one summary
row per leg (median over the steady-state tail) to the evidence file,
next to the bench_train device ceilings.

Usage: python tools/live_steps.py [--json-out docs/evidence/train_live_r5.jsonl]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from spnerf_tpu.settings import CKPT_PATH


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out",
                    default="docs/evidence/train_live_r5.jsonl")
    args = ap.parse_args()

    rows = []
    for leg_dir in sorted(Path(CKPT_PATH).iterdir()):
        log = leg_dir / "logs" / "metrics.jsonl"
        if not log.exists():
            continue
        vals = []
        for line in log.read_text().splitlines():
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if r.get("tag") == "perf/steps_per_sec":
                vals.append(float(r["value"]))
        if len(vals) < 3:
            continue
        tail = vals[max(1, len(vals) // 4):]  # drop compile-skewed head
        rows.append({
            "metric": "train_live_steps_per_sec", "leg": leg_dir.name,
            "median": round(float(np.median(tail)), 2),
            "p10": round(float(np.percentile(tail, 10)), 2),
            "p90": round(float(np.percentile(tail, 90)), 2),
            "n_samples": len(vals),
        })

    for r in rows:
        print(json.dumps(r))
    if rows:
        with open(args.json_out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
