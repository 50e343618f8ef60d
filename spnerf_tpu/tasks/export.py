"""Export solvers: pseudo-labels (homographic adaptation) + HPatches
bundles.

Counterpart of reference engine_solvers/export.py:17-222, with the HA
fan-out running as one batched jitted program per image batch
(ops/homography_adaptation.py) instead of 100 sequential forwards.

Artifact layout preserved exactly (SURVEY §7 "filesystem artifact-relay
compatibility"):
- pseudo-labels: EXPER_PATH/outputs/<experiment>/<split>/<name>.npy with
  int (N, 2) (y, x) coords;
- repeatability: EXPER_PATH/repeatability/<experiment>/<name>.npz
  {image, warped_image, prob, warped_prob, homography};
- descriptors: EXPER_PATH/descriptors/<experiment>/<name>.npz
  {+ desc, warped_desc (H, W, 256)}.

Export is resumable: existing files are skipped (export.py:90-91).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.models.superpoint import SuperPoint, superpoint_inference
from spnerf_tpu.ops.detector_decode import decode_detector_logits
from spnerf_tpu.ops.homography_adaptation import HAConfig, homography_adaptation
from spnerf_tpu.ops.nms import box_nms
from spnerf_tpu.settings import EXPER_PATH


def _nms_threshold_points(prob_nms: np.ndarray, det_thresh: float) -> np.ndarray:
    """NMS'd heatmap -> int (N, 2) coords (host-side, data-dependent)."""
    return np.argwhere(prob_nms >= det_thresh).astype(np.int64)


def make_prob_fn(model: SuperPoint, variables):
    """(B, H, W, 1) -> (B, H, W) decoded probability heatmap, jittable."""

    def prob_fn(image):
        out = model.apply(variables, image, train=False)
        return decode_detector_logits(out["logits"], model.config.grid_size)

    return prob_fn


def export_pseudo_labels(
    config: dict,
    model: SuperPoint,
    variables,
    loader,
    split: str = "training",
    enable_ha: bool = True,
    seed: int = 0,
) -> Path:
    """Homographic-adaptation pseudo-label export (reference
    export.py:17-131)."""
    exper = config["data"]["experiment_name"]
    out_dir = Path(EXPER_PATH, "outputs", exper, split)
    out_dir.mkdir(parents=True, exist_ok=True)

    det_cfg = config["model"]["detector_head"]
    ha_cfg = HAConfig.from_dict(config.get("homography_adaptation", {}))
    prob_fn = make_prob_fn(model, variables)

    @jax.jit
    def plain_heatmap(image):
        return prob_fn(image)

    @partial(jax.jit, static_argnames=())
    def nms_heatmap(prob):
        return jax.vmap(
            lambda p: box_nms(
                p, size=det_cfg["nms"], iou=0.1,
                min_prob=det_cfg["det_thresh"],
                keep_top_k=det_cfg["top_k"],
            )
        )(prob)

    key = jax.random.PRNGKey(seed)
    for bi, batch in enumerate(loader):
        names = batch["name"]
        todo = [i for i, n in enumerate(names) if not (out_dir / f"{n}.npy").exists()]
        if not todo:
            continue
        image = jnp.asarray(batch["image"])
        if enable_ha:
            key, sub = jax.random.split(key)
            prob = homography_adaptation(prob_fn, image, sub, ha_cfg)
        else:
            prob = plain_heatmap(image)
        prob_nms = np.asarray(nms_heatmap(prob))
        for i in todo:
            pred = _nms_threshold_points(prob_nms[i], det_cfg["det_thresh"])
            np.save(out_dir / f"{names[i]}.npy", pred)
    return out_dir


def export_hpatches(
    config: dict,
    model: SuperPoint,
    variables,
    loader,
    with_descriptors: bool = False,
) -> Path:
    """HPatches repeatability / descriptor bundles (reference
    export.py:134-222)."""
    exper = config["data"]["experiment_name"]
    kind = "descriptors" if with_descriptors else "repeatability"
    out_dir = Path(EXPER_PATH, kind, exper)
    out_dir.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def infer(image):
        return superpoint_inference(model, variables, image)

    for bi, batch in enumerate(loader):
        names = batch.get("name", [str(bi)])
        out1 = infer(jnp.asarray(batch["image"]))
        out2 = infer(jnp.asarray(batch["warped_image"]))
        prob1 = np.asarray(out1["prob_heatmap_nms"])
        prob2 = np.asarray(out2["prob_heatmap_nms"])
        for i, name in enumerate(names):
            payload = {
                "image": np.asarray(batch["image"][i, ..., 0]),
                "warped_image": np.asarray(batch["warped_image"][i, ..., 0]),
                "prob": prob1[i],
                "warped_prob": prob2[i],
                "homography": np.asarray(batch["homography"][i]),
            }
            if with_descriptors:
                payload["desc"] = np.asarray(out1["desc"][i])
                payload["warped_desc"] = np.asarray(out2["desc"][i])
            np.savez_compressed(out_dir / f"{name}.npz", **payload)
    return out_dir
