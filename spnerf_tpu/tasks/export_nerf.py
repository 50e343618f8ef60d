"""export_NeRF_labels task (reference engine.py:149-170 +
export.py:225-366).

Loads batches of frames per scene, runs ONE forward+NMS per frame, then
fuses every target frame's labels from a random 75% subset of the other
frames via batched depth reprojection (ops/nerf_label_fusion.py).
Artifacts: EXPER_PATH/outputs/<experiment>/<split>/<name>.npy, int
(N, 2) coords — identical layout to the HA export.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.data.loader import DataLoader
from spnerf_tpu.data.nerf_dataset import NeRFDataset
from spnerf_tpu.geometry.keypoints import top_k_keypoints
from spnerf_tpu.ops.nerf_label_fusion import fuse_nerf_labels
from spnerf_tpu.ops.nms import box_nms
from spnerf_tpu.settings import EXPER_PATH
from spnerf_tpu.tasks.export import make_prob_fn

MAX_DETECTIONS = 1024


def export_nerf_labels(config: dict, model, variables, seed: int = 0,
                       split: str = "training") -> Path:
    exper = config["data"]["experiment_name"]
    out_dir = Path(EXPER_PATH, "outputs", exper, split)
    out_dir.mkdir(parents=True, exist_ok=True)

    det_cfg = config["model"]["detector_head"]
    prob_fn = make_prob_fn(model, variables)

    @jax.jit
    def detect(images):
        """(F, H, W, 1) -> heatmaps + NMS'd padded point sets."""
        probs = prob_fn(images)
        nms = jax.vmap(
            lambda p: box_nms(p, size=det_cfg["nms"], iou=0.1,
                              min_prob=det_cfg["det_thresh"],
                              keep_top_k=det_cfg["top_k"])
        )(probs)
        pts, scores, valid = jax.vmap(
            lambda p: top_k_keypoints(p, MAX_DETECTIONS, det_cfg["det_thresh"])
        )(nms)
        return probs, pts, valid

    @jax.jit
    def fuse_and_nms(probs, pts, valid, depths, Ks, Rs, ts, target, selected):
        fused = fuse_nerf_labels(probs, pts, valid, depths, Ks, Rs, ts,
                                 target, selected)
        return box_nms(fused, size=det_cfg["nms"], iou=0.1,
                       min_prob=det_cfg["det_thresh"],
                       keep_top_k=det_cfg["top_k"])

    data_cfg = dict(config["data"])
    scenes = data_cfg.get("all_data_dirs") or [data_cfg.get("data_dir")]
    rng = np.random.default_rng(seed)

    for scene in scenes:
        scene_cfg = dict(data_cfg)
        scene_cfg["data_dir"] = scene
        scene_cfg["has_labels"] = False
        scene_cfg["warped_pair"] = False
        ds = NeRFDataset(scene_cfg, split)
        loader = DataLoader(ds, batch_size=data_cfg.get("batch_size", 8),
                            shuffle=False, drop_last=False)
        for batch in loader:
            names = list(batch["name"])
            if all((out_dir / f"{n}.npy").exists() for n in names):
                continue
            images = jnp.asarray(batch["image"])
            probs, pts, valid = detect(images)
            depths = jnp.asarray(batch["depth"])
            Ks = jnp.asarray(batch["intrinsics"])
            Rs = jnp.asarray(batch["rotation"])
            ts = jnp.asarray(batch["translation"])
            F = len(names)
            for j in range(F):
                save_path = out_dir / f"{names[j]}.npy"
                if save_path.exists():
                    continue
                others = [k for k in range(F) if k != j]
                chosen = rng.choice(
                    others, size=max(1, int(0.75 * len(others))), replace=False
                ) if others else []
                selected = np.zeros(F, bool)
                selected[list(chosen)] = True
                nms_prob = np.asarray(
                    fuse_and_nms(probs, pts, valid, depths, Ks, Rs, ts,
                                 jnp.asarray(j), jnp.asarray(selected))
                )
                pred = np.argwhere(nms_prob >= det_cfg["det_thresh"]).astype(np.int64)
                np.save(save_path, pred)
    return out_dir
