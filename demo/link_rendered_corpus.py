"""Flatten the NeRF-rendered training views into a COCO-style corpus.

The matched-corpus homography control (VERDICT r4 #1/#4) must train on
EXACTLY the images the NeRF-supervised arm trains on, but through the
homography-pair protocol (HA pseudo-labels + warped-pair loss, like the
reference's superpoint_coco_train.yaml). The COCO dataset class reads
``DATA_PATH/<name>/images/<split>/*``, so this script symlinks every
rendered view under a flat, collision-free name:

    NeRF/<scene>/images/training/<i>.png
        -> COCO_nerf_views/images/training/<scene>_<i>.png

Idempotent; re-run after rendering more scenes.
"""

from __future__ import annotations

from pathlib import Path

from spnerf_tpu.settings import DATA_PATH


def main():
    src_root = Path(DATA_PATH, "NeRF")
    dst = Path(DATA_PATH, "COCO_nerf_views", "images", "training")
    dst.mkdir(parents=True, exist_ok=True)
    n = 0
    for scene_dir in sorted(src_root.iterdir()):
        img_dir = scene_dir / "images" / "training"
        if not img_dir.is_dir():
            continue
        for p in sorted(img_dir.glob("*.png"),
                        key=lambda q: int(q.stem)):
            link = dst / f"{scene_dir.name}_{int(p.stem):03d}.png"
            if not link.exists():
                link.symlink_to(p.resolve())
                n += 1
    total = len(list(dst.glob("*.png")))
    print(f"linked {n} new views ({total} total) -> {dst}")
    if total == 0:
        raise SystemExit("no rendered views found - run run_nerf_leg.py")


if __name__ == "__main__":
    main()
