"""Pseudo-label agreement between two HA export runs.

Reports exact point-set IoU and the fraction of points within 2px of a
point in the reference set — the two round-3 parity numbers
(docs/PERF.md: int8 was 85.6% within-2px but 0.4 exact IoU at
det_thresh 0.001; the mixed-precision stack is meant to close this).

Usage: python tools/label_iou.py <ref_dir> <test_dir>
Prints one JSON line.
"""

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_dir")
    ap.add_argument("test_dir")
    ap.add_argument("--label", default=None)
    args = ap.parse_args()

    ref_files = {p.name: p for p in Path(args.ref_dir).glob("*.npy")}
    test_files = {p.name: p for p in Path(args.test_dir).glob("*.npy")}
    common = sorted(set(ref_files) & set(test_files))
    if not common:
        raise SystemExit("no common label files")

    ious, within2 = [], []
    for name in common:
        a = np.load(ref_files[name])   # (N, 2) int points
        b = np.load(test_files[name])
        sa = {tuple(p) for p in a.tolist()}
        sb = {tuple(p) for p in b.tolist()}
        union = len(sa | sb)
        ious.append(len(sa & sb) / union if union else 1.0)
        if len(b) and len(a):
            d = np.linalg.norm(
                b[:, None, :].astype(np.float32)
                - a[None, :, :].astype(np.float32), axis=-1)
            within2.append(float((d.min(axis=1) <= 2.0).mean()))
        else:
            within2.append(1.0 if len(a) == len(b) else 0.0)

    print(json.dumps({
        "metric": "ha_label_agreement",
        "label": args.label or f"{Path(args.ref_dir).name}"
                               f"_vs_{Path(args.test_dir).name}",
        "exact_iou": round(float(np.mean(ious)), 4),
        "within_2px": round(float(np.mean(within2)), 4),
        "n_images": len(common),
    }))


if __name__ == "__main__":
    main()
