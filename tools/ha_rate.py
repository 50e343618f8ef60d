"""Steady-state HA export throughput from output-file mtimes.

The tunneled chip charges a large floor per host<->device transfer and
the first batches pay compile, so wall-clock of the whole task
under-reports the pipeline. Measuring by the span of output .npy
mtimes after a warmup prefix gives the steady-state rate the PERF doc
tracks (docs/PERF.md HA section).

Usage: python tools/ha_rate.py <output_dir> [--warmup-frac 0.2]
Prints one JSON line.
"""

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir")
    ap.add_argument("--warmup-frac", type=float, default=0.2)
    ap.add_argument("--label", default=None)
    args = ap.parse_args()

    files = sorted(Path(args.output_dir).glob("*.npy"),
                   key=lambda p: p.stat().st_mtime)
    if len(files) < 10:
        raise SystemExit(f"only {len(files)} outputs in {args.output_dir}")
    k = max(1, int(len(files) * args.warmup_frac))
    t0 = files[k - 1].stat().st_mtime
    t1 = files[-1].stat().st_mtime
    n = len(files) - k
    rate = n / (t1 - t0) if t1 > t0 else float("nan")
    print(json.dumps({
        "metric": "ha_export_imgs_per_sec",
        "label": args.label or Path(args.output_dir).name,
        "value": round(rate, 2),
        "unit": "imgs/sec",
        "n_total": len(files),
        "n_measured": n,
        "span_s": round(t1 - t0, 1),
    }))


if __name__ == "__main__":
    main()
