"""Fabricated 3D multi-view scenes for the NeRF-supervision demo leg.

The reference's front end for its novel contribution is real video ->
COLMAP poses -> NerfStudio NeRF -> rendered novel views with depth
(colmap/colmap.py:84-155, README pipeline). This environment has no
network and no real video, so this script fabricates the equivalent
input: each scene is a set of textured rectangles floating in 3D,
ray-traced on host with EXACT camera geometry (OpenCV convention,
pixel-center +0.5 rays, fov-derived intrinsics identical to
data/nerf_dataset.camera_intrinsics) and exact along-ray depth.

Outputs per scene (under DATA_PATH/NeRF_gt/<scene>/):
    images/training/<i>.png        posed views for NeRF training
    poses.npy                      (N, 4, 4) OpenCV cam-to-world
    depth/training/<i>.npy         GT along-ray depth (diagnostics)

The downstream demo leg (demo/run_nerf_leg.py) trains the in-framework
NeRF on these, renders the NeRF dataset (images+depth+transforms) with
tasks/nerf_task.render_dataset, and runs export_NeRF_labels /
superpoint_NeRF_train / pose evaluation on top.

Scene difficulty parameters are FIXED benchmark constants — do not
change between rounds (results must stay comparable).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

from demo.make_standin_data import make_composite
from spnerf_tpu.data.nerf_dataset import camera_intrinsics
from spnerf_tpu.data.rng import stable_seed
from spnerf_tpu.settings import DATA_PATH
from spnerf_tpu.tasks.nerf_task import pose_orbit

BACKGROUND = 0.5      # constant miss shade (matches grey NeRF background)
MISS_DEPTH = 8.0      # along-ray depth recorded for rays hitting nothing
TEX = 256             # texture resolution


def _unit(v):
    return v / np.linalg.norm(v)


def build_scene(rng, n_rects: int = 7):
    """Textured rectangles around the origin, mostly facing outward so
    orbiting cameras (radius ~4) see texture nearly everywhere."""
    rects = []
    for k in range(n_rects):
        center = rng.uniform(-1.0, 1.0, 3) * np.array([1.1, 0.8, 1.1])
        # normal: away from origin with noise -> visible from the orbit
        n = _unit(center + rng.normal(0, 0.35, 3) + 1e-3)
        # in-plane basis with random roll
        a = np.array([0.0, 1.0, 0.0])
        if abs(np.dot(a, n)) > 0.9:
            a = np.array([1.0, 0.0, 0.0])
        e1 = _unit(np.cross(a, n))
        e2 = np.cross(n, e1)
        roll = rng.uniform(0, 2 * np.pi)
        e1, e2 = (np.cos(roll) * e1 + np.sin(roll) * e2,
                  -np.sin(roll) * e1 + np.cos(roll) * e2)
        hx, hy = rng.uniform(0.45, 0.95, 2)
        tex = make_composite(rng, size=(TEX, TEX)).astype(np.float32) / 255.0
        rects.append({
            "center": center, "e1": e1 * hx, "e2": e2 * hy,
            "normal": n, "tex": tex,
        })
    return rects


def render_scene(rects, K, c2w, shape):
    """Ray-trace one view: returns (grayscale float [0,1] (H, W),
    along-ray depth (H, W))."""
    H, W = shape
    ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5,
                         indexing="ij")
    pix = np.stack([xs.ravel(), ys.ravel(), np.ones(H * W)], axis=-1)
    dirs_cam = pix @ np.linalg.inv(K).T
    dirs = dirs_cam @ c2w[:3, :3].T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = c2w[:3, 3]

    best_t = np.full(H * W, np.inf)
    shade = np.full(H * W, BACKGROUND, np.float32)
    for r in rects:
        n = r["normal"]
        denom = dirs @ n
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.dot(r["center"] - origin, n) / denom
        p = origin + t[:, None] * dirs
        d = p - r["center"]
        a = d @ r["e1"] / np.dot(r["e1"], r["e1"])
        b = d @ r["e2"] / np.dot(r["e2"], r["e2"])
        hit = (np.abs(denom) > 1e-6) & (t > 0.1) & (t < best_t) \
            & (np.abs(a) <= 1) & (np.abs(b) <= 1)
        if not hit.any():
            continue
        u = (a[hit] + 1) * 0.5 * (TEX - 1)
        v = (b[hit] + 1) * 0.5 * (TEX - 1)
        u0, v0 = np.floor(u).astype(int), np.floor(v).astype(int)
        u1, v1 = np.minimum(u0 + 1, TEX - 1), np.minimum(v0 + 1, TEX - 1)
        fu, fv = u - u0, v - v0
        tex = r["tex"]
        val = (tex[v0, u0] * (1 - fu) * (1 - fv) + tex[v0, u1] * fu * (1 - fv)
               + tex[v1, u0] * (1 - fu) * fv + tex[v1, u1] * fu * fv)
        shade[hit] = val
        best_t[hit] = t[hit]

    depth = np.where(np.isfinite(best_t), best_t, MISS_DEPTH)
    return shade.reshape(H, W), depth.reshape(H, W).astype(np.float32)


def orbit_with_jitter(rng, n, radius=4.0):
    """pose_orbit with per-frame radius/height jitter, so NeRF training
    views are not degenerate (exact circle = poor parallax coverage)."""
    poses = []
    for i in range(n):
        base = pose_orbit(n, radius=radius + rng.uniform(-0.35, 0.35),
                          height=rng.uniform(-0.6, 0.9))[i]
        poses.append(base)
    return np.stack(poses).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-scenes", type=int, default=4)
    ap.add_argument("--n-views", type=int, default=48)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--fov", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    K = camera_intrinsics((args.height, args.width), args.fov)
    for s in range(args.n_scenes):
        scene = f"demo_scene{s:02d}"
        root = Path(DATA_PATH, "NeRF_gt", scene)
        if (root / "poses.npy").exists():
            print(f"{scene}: exists, skipping")
            continue
        rng = np.random.default_rng((args.seed, stable_seed("nerf_scene"), s))
        rects = build_scene(rng)
        poses = orbit_with_jitter(rng, args.n_views)
        (root / "images" / "training").mkdir(parents=True, exist_ok=True)
        (root / "depth" / "training").mkdir(parents=True, exist_ok=True)
        for i in range(args.n_views):
            img, depth = render_scene(rects, K, poses[i],
                                      (args.height, args.width))
            cv2.imwrite(str(root / "images" / "training" / f"{i}.png"),
                        np.clip(img * 255, 0, 255).astype(np.uint8))
            np.save(root / "depth" / "training" / f"{i}.npy", depth)
        np.save(root / "poses.npy", poses)
        np.save(root / "intrinsics.npy", K)
        print(f"{scene}: {args.n_views} views rendered")


if __name__ == "__main__":
    main()
