"""Render the GT pose-evaluation split for the fabricated NeRF scenes.

The pose-AUC protocol (reference pose_evaluation.py:264-356) evaluates
on *real* images whose relative poses come from COLMAP. The fabricated
demo scenes give us something strictly better: the scene geometry is
procedural, so the evaluation views can be ray-traced EXACTLY (same
renderer that produced the NeRF training views, demo/make_nerf_scenes.py)
with exact intrinsics/extrinsics — no NeRF reconstruction artifacts
confounding the detector/descriptor comparison. The NeRF renders remain
what they are in the reference: the *supervision* signal (novel views +
depth for label fusion and the 3-D reprojection loss), not the eval set.

Outputs (idempotent; skips scenes already rendered):
    NeRF_gt/<scene>/images/test/<i>.png   GT test views (exact raytrace)
    NeRF_gt/<scene>/depth/test/<i>.npy    GT along-ray depth
    NeRF_gt/<scene>/poses_test.npy        (N, 4, 4) OpenCV cam-to-world
    DATA_PATH/gt_pose_pairs.txt           SuperGlue-format pose pairs

The test arc is the same one demo/run_nerf_leg.py renders through the
NeRF (radius 4.0, height -0.2, start 150 deg), so NeRF-vs-GT test PSNR
is directly measurable as a render-quality diagnostic.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

from demo.make_nerf_scenes import build_scene, render_scene
from demo.run_nerf_leg import arc_poses
from spnerf_tpu.data.rng import stable_seed
from spnerf_tpu.settings import DATA_PATH


def rebuild_rects(scene_index: int, seed: int = 0):
    """Re-fabricate a scene's rectangles: build_scene is the first
    consumer of the per-scene numpy rng stream in make_nerf_scenes.main,
    so a fresh generator with the same seed tuple reproduces the rect
    GEOMETRY exactly. The background component of each texture also
    consumes OpenCV's process-global RNG (cv2.randu in
    synthetic_draw.generate_background), so bit-exact textures
    additionally require calling this for every scene IN ORDER from a
    fresh process — main() does, and verifies the result against a
    committed training view before rendering anything."""
    rng = np.random.default_rng(
        (seed, stable_seed("nerf_scene"), scene_index))
    return build_scene(rng)


def verify_rebuild(root: Path, rects, K) -> None:
    """Assert the rebuilt scene reproduces committed training view 0
    bit-exactly (guards the cv2 global-RNG ordering dependence above)."""
    ref_path = root / "images" / "training" / "0.png"
    ref = cv2.imread(str(ref_path), cv2.IMREAD_GRAYSCALE)
    poses = np.load(root / "poses.npy")
    img, _ = render_scene(rects, K, poses[0], ref.shape)
    got = np.clip(img * 255, 0, 255).astype(np.uint8)
    if not np.array_equal(ref, got):
        raise RuntimeError(
            f"{root.name}: rebuilt scene does not reproduce {ref_path} "
            "(cv2 RNG state desync — rerun with all scenes rebuilt in "
            "order from a fresh process)")


def write_gt_pose_pairs(scenes, pairs_path: Path, min_gap: int = 2,
                        max_gap: int = 5):
    """Same pairing protocol as run_nerf_leg.write_pose_pairs (seed 7,
    gap 2-5 over the test arc) but over the GT split, with names
    relative to images_path='NeRF_gt'."""
    rng = np.random.default_rng(7)
    lines = []
    for scene in scenes:
        root = Path(DATA_PATH, "NeRF_gt", scene)
        K = np.load(root / "intrinsics.npy")
        k_flat = " ".join(f"{v:.6f}" for v in K.ravel())
        poses = np.load(root / "poses_test.npy")
        n = len(poses)
        for i in range(n - 1):
            gap = int(rng.integers(min_gap, max_gap + 1))
            j = min(i + gap, n - 1)
            if j == i:
                continue
            T_0to1 = np.linalg.inv(poses[j]) @ poses[i]
            t_flat = " ".join(f"{v:.8f}" for v in T_0to1.ravel())
            lines.append(
                f"{scene}/images/test/{i}.png {scene}/images/test/{j}.png "
                f"0 0 {k_flat} {k_flat} {t_flat}")
    pairs_path.parent.mkdir(parents=True, exist_ok=True)
    pairs_path.write_text("\n".join(lines) + "\n")
    return len(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-test-views", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    gt_root = Path(DATA_PATH, "NeRF_gt")
    scenes = sorted(p.name for p in gt_root.iterdir() if p.is_dir())
    if not scenes:
        raise SystemExit("no fabricated scenes - run make_nerf_scenes.py")

    for s, scene in enumerate(scenes):
        root = gt_root / scene
        # ALWAYS rebuild (even for finished scenes): build_scene advances
        # cv2's process-global RNG, and later scenes' textures depend on
        # that state — skipping a scene would silently desync the rest.
        rects = rebuild_rects(s, seed=args.seed)
        K = np.load(root / "intrinsics.npy")
        poses_path = root / "poses_test.npy"
        if poses_path.exists():
            print(f"{scene}: GT test split exists, skipping")
            continue
        verify_rebuild(root, rects, K)
        sample = next((root / "images" / "training").glob("*.png"))
        H, W = cv2.imread(str(sample), cv2.IMREAD_GRAYSCALE).shape
        # same arc run_nerf_leg renders through the NeRF
        test_poses = arc_poses(args.n_test_views, radius=4.0, height=-0.2,
                               start_deg=150.0)
        (root / "images" / "test").mkdir(parents=True, exist_ok=True)
        (root / "depth" / "test").mkdir(parents=True, exist_ok=True)
        for i in range(args.n_test_views):
            img, depth = render_scene(rects, K, test_poses[i], (H, W))
            cv2.imwrite(str(root / "images" / "test" / f"{i}.png"),
                        np.clip(img * 255, 0, 255).astype(np.uint8))
            np.save(root / "depth" / "test" / f"{i}.npy", depth)
        np.save(poses_path, test_poses.astype(np.float32))
        print(f"{scene}: {args.n_test_views} GT test views rendered")

    n = write_gt_pose_pairs(scenes, Path(DATA_PATH, "gt_pose_pairs.txt"))
    print(f"wrote {n} GT pose pairs")


if __name__ == "__main__":
    main()
