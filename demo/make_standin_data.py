"""Fabricate stand-in datasets for the on-chip bootstrap demo.

The bench environment has no network access, so the COCO/HPatches
stages of the reference pipeline (reference data/COCO.py:14,
data/HPatches.py:12) run on locally fabricated data:

- "COCO" stand-ins: multi-primitive composites from the synthetic-
  shapes drawing library (several primitives layered per canvas), at
  480x640, saved as grayscale jpgs in the real COCO directory layout.
- "HPatches" viewpoint scenes: held-out stand-in images warped by 5
  random in-pixel-coordinate homographies each, in the real HPatches
  layout (1.jpg..6.jpg + H_1_2..H_1_6 text matrices).

Usage: SPNERF_ROOT=... python demo/make_standin_data.py [--n-coco 5000]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

from spnerf_tpu.data import synthetic_draw as sd
from spnerf_tpu.data.rng import stable_seed as hash_str
from spnerf_tpu.settings import DATA_PATH

PRIMS = [
    sd.draw_lines, sd.draw_polygon, sd.draw_multiple_polygons,
    sd.draw_ellipses, sd.draw_star, sd.draw_checkerboard,
    sd.draw_stripes, sd.draw_cube,
]


def make_composite(rng, size=(480, 640)):
    img = sd.generate_background(size, rng)
    for fn in rng.choice(PRIMS, size=rng.integers(2, 5), replace=False):
        fn(img, rng)
    blur = int(rng.integers(0, 2)) * 2 + 1
    if blur > 1:
        img = cv2.GaussianBlur(img, (blur, blur), 0)
    return np.clip(img, 0, 255).astype(np.uint8)


def random_pixel_homography(rng, h, w, strength=0.15):
    """Random viewpoint homography in pixel coordinates: perspective +
    rotation + scale + translation jitter of the image corners."""
    corners = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
    jitter = rng.uniform(-strength, strength, (4, 2)).astype(np.float32)
    target = corners + jitter * np.array([w, h], np.float32)
    return cv2.getPerspectiveTransform(corners, target.astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-coco", type=int, default=5000)
    ap.add_argument("--n-hpatches", type=int, default=30)
    ap.add_argument("--strength", type=float, default=0.15,
                    help="viewpoint difficulty (FIXED benchmark "
                         "parameter — do not change between rounds)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    # Independent per-section streams: each image/scene is a pure
    # function of (seed, section, index), so growing one section never
    # reshuffles another — benchmark scenes stay fixed across corpus
    # rescales and rounds.
    def stream(section, index):
        return np.random.default_rng((args.seed, hash_str(section), index))

    coco_dir = Path(DATA_PATH, "COCO", "images", "training")
    coco_dir.mkdir(parents=True, exist_ok=True)
    for i in range(args.n_coco):
        out = coco_dir / f"demo_{i:05d}.jpg"
        if not out.exists():
            cv2.imwrite(str(out), make_composite(stream("coco_train", i)))
    print(f"wrote {args.n_coco} stand-in COCO images -> {coco_dir}")

    val_dir = Path(DATA_PATH, "COCO", "images", "validation")
    val_dir.mkdir(parents=True, exist_ok=True)
    for i in range(max(8, args.n_coco // 20)):
        out = val_dir / f"demo_{i:05d}.jpg"
        if not out.exists():
            cv2.imwrite(str(out), make_composite(stream("coco_val", i)))

    hp_root = Path(DATA_PATH, "HPatches")
    for s in range(args.n_hpatches):
        scene = hp_root / f"v_demo{s:02d}"
        if (scene / "H_1_6").exists():
            continue
        scene.mkdir(parents=True, exist_ok=True)
        rng = stream("hpatches", s)
        base = make_composite(rng)
        h, w = base.shape
        cv2.imwrite(str(scene / "1.jpg"), base)
        for i in range(2, 7):
            H = random_pixel_homography(rng, h, w, strength=args.strength)
            warped = cv2.warpPerspective(base, H, (w, h),
                                         flags=cv2.INTER_LINEAR)
            cv2.imwrite(str(scene / f"{i}.jpg"), warped)
            np.savetxt(str(scene / f"H_1_{i}"), H)
    print(f"wrote {args.n_hpatches} viewpoint scenes -> {hp_root}")


if __name__ == "__main__":
    main()
