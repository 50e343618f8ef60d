"""NeRF-depth label fidelity against GT depth (VERDICT r4 #4).

The fabricated scenes are procedural, so the EXACT along-ray depth at
every NeRF-rendered training pose can be ray-traced on host. This tool
quantifies how much label error NeRF depth noise adds to the fused
multi-view labels (reference kp_utils.py:86-123 robust-depth semantics
— the reference never validated this):

1. for each scene, rebuild the rects (bit-exact, same caveats as
   demo/render_gt_test_views.py: all scenes rebuilt IN ORDER from a
   fresh process) and ray-trace GT depth at poses_train.npy;
2. write a shadow scene dir  NeRF/<scene>__gtdepth/  with symlinked
   images + camera_transforms and the GT depth;
3. run export_NeRF_labels on both dirs (same model/checkpoint/seed);
4. report exact point-set IoU and within-2px agreement per scene.

Usage (host prep is CPU, exports need the chip):
    python tools/label_fidelity.py [--n-scenes 4]
        [--json-out docs/evidence/label_fidelity_r5.jsonl]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demo.make_nerf_scenes import render_scene  # noqa: E402
from demo.render_gt_test_views import rebuild_rects  # noqa: E402
from spnerf_tpu.settings import DATA_PATH, EXPER_PATH  # noqa: E402

CONFIG = "demo/configs/nerf_export_demo.yaml"


def build_shadow(scene: str, rects) -> Path:
    src = Path(DATA_PATH, "NeRF", scene)
    shadow = Path(DATA_PATH, "NeRF", f"{scene}__gtdepth")
    K = np.load(Path(DATA_PATH, "NeRF_gt", scene, "intrinsics.npy"))
    poses = np.load(src / "poses_train.npy")
    (shadow / "depth" / "training").mkdir(parents=True, exist_ok=True)
    for sub in ("images", "camera_transforms"):
        link = shadow / sub
        if not link.exists():
            link.symlink_to((src / sub).resolve())
    sample = sorted((src / "images" / "training").glob("*.png"))[0]
    import cv2

    H, W = cv2.imread(str(sample), cv2.IMREAD_GRAYSCALE).shape
    for i, pose in enumerate(poses):
        out = shadow / "depth" / "training" / f"{i}.npy"
        if out.exists():
            continue
        _, depth = render_scene(rects, K, pose, (H, W))
        np.save(out, depth)
    np.save(shadow / "poses_train.npy", poses)
    return shadow


def latest_mp_ckpt() -> str | None:
    """Latest demo_mp checkpoint (same resolution rule as run_demo.sh
    mp_seed) so BOTH exports run the identical detector even when the
    wall-clock-cut MagicPoint leg stopped short of the config's 15k."""
    ckpts = sorted(Path(EXPER_PATH, "ckpts", "demo_mp").glob("demo_mp_*.ckpt"),
                   key=lambda p: int(p.stem.rsplit("_", 1)[1]))
    return f"demo_mp/{ckpts[-1].name}" if ckpts else None


def run_export(data_dir: str, experiment: str, pretrained: str) -> Path:
    out_dir = Path(EXPER_PATH, "outputs", experiment, "training")
    if not out_dir.is_dir() or not list(out_dir.glob("*.npy")):
        subprocess.run(
            [sys.executable, "-m", "spnerf_tpu.cli", "--config-path",
             CONFIG, "--task", "export_NeRF_labels",
             "--set", f"pretrained={pretrained}",
             "--set", f"data.data_dir={data_dir}",
             "--set", f"data.experiment_name={experiment}"],
            check=True)
    return out_dir


def agreement(ref_dir: Path, test_dir: Path):
    ious, within2 = [], []
    names = sorted(p.name for p in ref_dir.glob("*.npy"))
    for name in names:
        a = np.load(ref_dir / name)
        b = np.load(test_dir / name)
        sa = {tuple(p) for p in a.tolist()}
        sb = {tuple(p) for p in b.tolist()}
        union = len(sa | sb)
        ious.append(len(sa & sb) / union if union else 1.0)
        if len(a) and len(b):
            d = np.linalg.norm(a[:, None].astype(np.float64)
                               - b[None].astype(np.float64), axis=-1)
            within2.append(float(np.mean(d.min(axis=1) <= 2.0)))
    return float(np.mean(ious)), float(np.mean(within2)) if within2 else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-scenes", type=int, default=4)
    ap.add_argument("--json-out",
                    default="docs/evidence/label_fidelity_r5.jsonl")
    ap.add_argument("--pretrained", default=None,
                    help="checkpoint for BOTH exports (default: latest "
                         "demo_mp, matching run_demo.sh mp_seed)")
    args = ap.parse_args()
    pretrained = args.pretrained or latest_mp_ckpt()
    if pretrained is None:
        sys.exit("no demo_mp checkpoint found; train the mp leg first")

    gt_root = Path(DATA_PATH, "NeRF_gt")
    scenes = sorted(p.name for p in gt_root.iterdir() if p.is_dir())
    rows = []
    for s, scene in enumerate(scenes):
        # rebuild EVERY scene in order (cv2 global-RNG dependence), but
        # only export/compare the first n
        rects = rebuild_rects(s)
        if s >= args.n_scenes:
            continue
        if not Path(DATA_PATH, "NeRF", scene, "poses_train.npy").exists():
            print(f"{scene}: not rendered yet, skipping")
            continue
        build_shadow(scene, rects)
        ref = run_export(f"{scene}__gtdepth",
                         f"demo_export_NeRF_gtdepth/{scene}", pretrained)
        test = run_export(scene, f"demo_export_NeRF/{scene}", pretrained)
        iou, w2 = agreement(ref, test)
        row = {"metric": "nerf_depth_label_fidelity", "scene": scene,
               "pretrained": pretrained,
               "exact_iou": round(iou, 4),
               "within_2px": round(w2, 4) if w2 is not None else None,
               "ref": "gt_raytraced_depth", "test": "nerf_rendered_depth"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if rows:
        summary = {"metric": "nerf_depth_label_fidelity_summary",
                   "n_scenes": len(rows),
                   "mean_exact_iou": round(float(np.mean(
                       [r["exact_iou"] for r in rows])), 4),
                   "mean_within_2px": round(float(np.mean(
                       [r["within_2px"] for r in rows
                        if r["within_2px"] is not None])), 4)}
        print(json.dumps(summary), flush=True)
        rows.append(summary)
        with open(args.json_out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
