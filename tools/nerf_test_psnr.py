"""Novel-view PSNR of the NeRF test renders against the GT raytraces.

demo/run_nerf_leg.py renders the test arc through the trained NeRF and
demo/render_gt_test_views.py ray-traces the SAME poses procedurally, so
per-index PSNR between the two is a true novel-view generalization
measure (the test arc is never seen in NeRF training). This is the
demo-leg analogue of the reference's reliance on NerfStudio render
quality (colmap/colmap.py:84-155) — here it is measured, not assumed.

Prints one JSON line per scene plus a summary line; exits 0 with a note
when the NeRF renders don't exist yet (the leg hasn't run).
"""

import json
from pathlib import Path

import cv2
import numpy as np

from spnerf_tpu.settings import DATA_PATH


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def main():
    gt_root = Path(DATA_PATH, "NeRF_gt")
    nerf_root = Path(DATA_PATH, "NeRF")
    scenes = sorted(p.name for p in gt_root.iterdir() if p.is_dir())
    all_vals = []
    for scene in scenes:
        gt_dir = gt_root / scene / "images" / "test"
        nerf_dir = nerf_root / scene / "images" / "test"
        if not nerf_dir.is_dir() or not gt_dir.is_dir():
            print(json.dumps({"metric": "nerf_test_psnr", "scene": scene,
                              "note": "renders missing, leg not run yet"}))
            continue
        vals = []
        for gt_path in sorted(gt_dir.glob("*.png"),
                              key=lambda p: int(p.stem)):
            nerf_path = nerf_dir / gt_path.name
            if not nerf_path.exists():
                continue
            gt = cv2.imread(str(gt_path), cv2.IMREAD_GRAYSCALE)
            nf = cv2.imread(str(nerf_path), cv2.IMREAD_GRAYSCALE)
            if nf is None or nf.shape != gt.shape:
                continue
            vals.append(psnr(gt, nf))
        if vals:
            print(json.dumps({
                "metric": "nerf_test_psnr", "scene": scene,
                "value": round(float(np.mean(vals)), 2), "unit": "dB",
                "min": round(float(np.min(vals)), 2),
                "n_views": len(vals)}))
            all_vals.extend(vals)
    if all_vals:
        print(json.dumps({
            "metric": "nerf_test_psnr", "scene": "ALL",
            "value": round(float(np.mean(all_vals)), 2), "unit": "dB",
            "min": round(float(np.min(all_vals)), 2),
            "n_views": len(all_vals)}))


if __name__ == "__main__":
    main()
