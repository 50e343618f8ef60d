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


def make_prob_fn(model: SuperPoint, variables, fast: bool = False):
    """(B, H, W, 1) -> (B, H, W) decoded probability heatmap, jittable.

    ``fast=True`` folds BatchNorm into the convs and runs the forward in
    bf16 — the production export graph (HA export is the pipeline's
    throughput bottleneck: 100 forwards x ~118k COCO images per round,
    reference export.py:83-114). Decode stays f32.
    """
    if not fast:
        def prob_fn(image):
            out = model.apply(variables, image, train=False)
            return decode_detector_logits(out["logits"], model.config.grid_size)

        return prob_fn

    import dataclasses

    from spnerf_tpu.models.superpoint import fold_batch_norm

    folded = fold_batch_norm(variables)
    bf16_vars = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        folded,
    )
    infer_model = SuperPoint(
        dataclasses.replace(model.config, use_bn=False))

    def prob_fn(image):
        out = infer_model.apply(bf16_vars, image.astype(jnp.bfloat16),
                                train=False)
        return decode_detector_logits(out["logits"].astype(jnp.float32),
                                      model.config.grid_size)

    return prob_fn


def export_pseudo_labels(
    config: dict,
    model: SuperPoint,
    variables,
    loader,
    split: str = "training",
    enable_ha: bool = True,
    seed: int = 0,
    mesh=None,
    fast: bool = True,
) -> Path:
    """Homographic-adaptation pseudo-label export (reference
    export.py:17-131).

    ``fast`` runs the forward through the BN-folded bf16 graph (the
    export is inference-only; numerics match the trained model to bf16
    tolerance and the decoded heatmaps feed an aggregation + NMS that is
    insensitive at that scale). ``mesh`` shards each image batch over
    the mesh's "data" axis — HA export is embarrassingly data-parallel
    (every image is independent), and per-image HA keys are derived from
    the unpadded batch, so artifacts are bit-identical to the
    single-device run even when the last batch pads up to the mesh size.
    """
    exper = config["data"]["experiment_name"]
    out_dir = Path(EXPER_PATH, "outputs", exper, split)
    out_dir.mkdir(parents=True, exist_ok=True)

    det_cfg = config["model"]["detector_head"]
    ha_cfg = HAConfig.from_dict(config.get("homography_adaptation", {}))
    prob_fn = make_prob_fn(model, variables, fast=fast)

    n_shard = 1
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_shard = mesh.devices.size
        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))

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
        n_real = image.shape[0]
        pad = (-n_real) % n_shard
        key, sub = jax.random.split(key)
        # per-image keys from the UNPADDED batch: padding to a shardable
        # size must not reshuffle the homographies of real images, so
        # sharded exports stay bit-identical to single-device runs
        img_keys = jax.random.split(sub, n_real)
        if pad:  # pad to a shardable batch; padded rows are discarded
            image = jnp.concatenate(
                [image, jnp.repeat(image[-1:], pad, axis=0)], axis=0)
            img_keys = jnp.concatenate(
                [img_keys, jnp.repeat(img_keys[-1:], pad, axis=0)], axis=0)
        if batch_sharding is not None:
            image = jax.device_put(image, batch_sharding)
            img_keys = jax.device_put(img_keys, batch_sharding)
        if enable_ha:
            prob = homography_adaptation(prob_fn, image, img_keys, ha_cfg)
        else:
            prob = plain_heatmap(image)
        prob_nms = np.asarray(nms_heatmap(prob))[:n_real]
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
