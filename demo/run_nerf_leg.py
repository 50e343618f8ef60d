"""NeRF-supervision demo leg: train the in-framework NeRF on each
fabricated scene, render the NeRF dataset (images + along-ray depth +
camera transforms), and write GT pose-evaluation pairs.

Pipeline position (reference parity):
    make_nerf_scenes.py      ~ real video + COLMAP (fabricated here)
    THIS SCRIPT              ~ NerfStudio train + render (in-framework,
                               tasks/nerf_task.py)
    export_NeRF_labels       ~ reference export.py:225-366
    superpoint_NeRF_train    ~ reference train.py:81-97 (nerf_desc)
    eval/pose.py             ~ reference pose_evaluation.py:264-356

Rendered splits per scene:
    training  - a 120 deg arc (the 7-15%% partner window then spans
                8-18 deg of baseline, like the reference's video walks)
    test      - a second arc at different height for pose evaluation

The pose pairs file is SuperGlue/ScanNet format (name0 name1 rot0 rot1
K0 K1 T_0to1) with EXACT intrinsics/extrinsics from the renderer.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from spnerf_tpu.models.nerf import NeRFConfig
from spnerf_tpu.settings import DATA_PATH
from spnerf_tpu.tasks.nerf_task import render_dataset, train_nerf_scene

ARC_DEG = 120.0


def arc_poses(n: int, radius: float, height: float, start_deg: float):
    """OpenCV cam-to-world poses along an orbit arc, looking at origin."""
    from spnerf_tpu.tasks.nerf_task import pose_orbit

    full = int(round(n * 360.0 / ARC_DEG))
    orbit = pose_orbit(full, radius=radius, height=height)
    k0 = int(round(start_deg / 360.0 * full))
    idx = [(k0 + i) % full for i in range(n)]
    return orbit[idx]


def write_pose_pairs(scenes, pairs_path: Path, n_test: int,
                     min_gap: int, max_gap: int):
    rng = np.random.default_rng(7)
    lines = []
    for scene in scenes:
        # EXACT renderer intrinsics: the same K the views were rendered
        # with, not a recomputed one (sizes must agree by construction)
        K = np.load(Path(DATA_PATH, "NeRF_gt", scene, "intrinsics.npy"))
        k_flat = " ".join(f"{v:.6f}" for v in K.ravel())
        poses = np.load(Path(DATA_PATH, "NeRF", scene, "poses_test.npy"))
        n = min(n_test, len(poses))
        for i in range(n - 1):
            gap = int(rng.integers(min_gap, max_gap + 1))
            # clamp instead of skip so small test splits still pair up
            j = min(i + gap, n - 1)
            if j == i:
                continue
            T0, T1 = poses[i], poses[j]
            T_0to1 = np.linalg.inv(T1) @ T0
            t_flat = " ".join(f"{v:.8f}" for v in T_0to1.ravel())
            lines.append(
                f"{scene}/images/test/{i}.png {scene}/images/test/{j}.png "
                f"0 0 {k_flat} {k_flat} {t_flat}")
    pairs_path.parent.mkdir(parents=True, exist_ok=True)
    pairs_path.write_text("\n".join(lines) + "\n")
    return len(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--ray-batch", type=int, default=4096)
    ap.add_argument("--n-train-views", type=int, default=36)
    ap.add_argument("--n-test-views", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    gt_root = Path(DATA_PATH, "NeRF_gt")
    scenes = sorted(p.name for p in gt_root.iterdir() if p.is_dir())
    if not scenes:
        raise SystemExit("no fabricated scenes - run make_nerf_scenes.py")
    # demo-sized field: the fabricated scenes are simple textured solids,
    # so a 4x128 field at 32+64 samples fits them well while cutting the
    # full default's (8x256, 64+128) FLOPs ~16x; bf16 matmuls run the
    # MXU at full rate (sigma/compositing stay f32). The full-size
    # default remains for tools/process_scene.py real-scene use.
    config = NeRFConfig(depth=4, width=128, skip_layer=2,
                        n_coarse=32, n_fine=64,
                        compute_dtype="bfloat16")
    report = {}
    for scene in scenes:
        out_root = Path(DATA_PATH, "NeRF", scene)
        if (out_root / "poses_test.npy").exists():
            print(f"{scene}: already rendered, skipping")
            continue
        root = gt_root / scene
        import cv2

        img_paths = sorted((root / "images" / "training").glob("*.png"),
                           key=lambda p: int(p.stem))
        images = np.stack([
            cv2.imread(str(p), cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
            for p in img_paths])
        images = np.repeat(images[..., None], 3, axis=-1)
        poses = np.load(root / "poses.npy")
        K = np.load(root / "intrinsics.npy")
        H, W = images.shape[1:3]

        t0 = time.time()
        model, params, history = train_nerf_scene(
            images, poses, K, config=config, num_iters=args.iters,
            ray_batch=args.ray_batch, seed=args.seed)
        t_train = time.time() - t0
        final = f"{history[-1]:.5f}" if history else "n/a"
        print(f"{scene}: NeRF trained {args.iters} it in {t_train:.0f}s, "
              f"final loss {final}", flush=True)

        # training split: 120 deg arc at fixed mid height
        train_poses = arc_poses(args.n_train_views, radius=4.0, height=0.3,
                                start_deg=0.0)
        test_poses = arc_poses(args.n_test_views, radius=4.0, height=-0.2,
                               start_deg=150.0)
        t0 = time.time()
        render_dataset(model, params, scene, train_poses, (H, W), K,
                       config=config, splits={"training": list(range(len(train_poses)))},
                       seed=args.seed)
        render_dataset(model, params, scene, test_poses, (H, W), K,
                       config=config, splits={"test": list(range(len(test_poses)))},
                       seed=args.seed + 1)
        t_render = time.time() - t0
        np.save(out_root / "poses_train.npy", train_poses)
        np.save(out_root / "poses_test.npy", test_poses)
        print(f"{scene}: rendered {args.n_train_views}+{args.n_test_views} "
              f"views in {t_render:.0f}s", flush=True)
        report[scene] = {"train_s": t_train, "render_s": t_render,
                         "final_loss": history[-1] if history else None}

    n_pairs = write_pose_pairs(
        scenes, Path(DATA_PATH, "nerf_pose_pairs.txt"),
        n_test=args.n_test_views, min_gap=2, max_gap=5)
    print(f"wrote {n_pairs} GT pose pairs")
    report_path = Path(DATA_PATH, "NeRF", "nerf_leg_report.json")
    report_path.parent.mkdir(parents=True, exist_ok=True)
    # merge: resumed runs only process un-rendered scenes, and must not
    # drop the earlier scenes' rows
    if report_path.exists():
        merged = json.loads(report_path.read_text())
        merged.update(report)
        report = merged
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
