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


def make_prob_fn(model: SuperPoint, variables, fast: bool = False,
                 serving=None):
    """(B, H, W, 1) -> (B, H, W) decoded probability heatmap, jittable.

    ``fast=True`` folds BatchNorm into the convs and runs the forward in
    bf16 — the production export graph (HA export is the pipeline's
    throughput bottleneck: 100 forwards x ~118k COCO images per round,
    reference export.py:83-114). Decode stays f32.

    ``serving`` (a built ``ops.serving.ServingSuperPoint``) routes the
    forward through the int8 Pallas conv stack instead — ~1.5x the
    bf16-folded XLA graph; task-level label parity is pinned by
    benchmarks/eval_serving_demo.py.
    """
    if serving is not None:
        def prob_fn(image):
            out = serving(image)
            return decode_detector_logits(out["logits"].astype(jnp.float32),
                                          model.config.grid_size)

        return prob_fn

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
    exp_cfg = config.get("export", {}) or {}
    ha_cfg = HAConfig.from_dict(config.get("homography_adaptation", {}))
    det_thresh = float(det_cfg["det_thresh"])
    top_k = int(det_cfg.get("top_k", 0) or 0)
    # device-side point extraction cap when top_k is unlimited: NMS'd
    # 240x320 heatmaps carry a few hundred survivors, so 4096 == "all"
    # in practice while keeping the D2H transfer ~50 KB instead of the
    # full heatmap (a ~60 ms/batch tunnel round-trip)
    k_cap = top_k if top_k > 0 else int(exp_cfg.get("topk_cap", 4096))

    serving = None
    serving_mode = exp_cfg.get("serving", False)
    if serving_mode:
        from spnerf_tpu.ops.serving import ServingSuperPoint
        # serving: True selects int8 (back-compat); a string selects the
        # stack explicitly — "int8", "mixed" (int8 backbone + bf16
        # heads: closes the near-threshold label gap) or "bf16"
        mode = serving_mode if isinstance(serving_mode, str) else "int8"
        # calibrate activation scales on the first real batch; close the
        # prefetch iterator so its daemon worker thread doesn't linger
        # blocked on a full queue
        cal_it = iter(loader)
        first = next(cal_it)
        if hasattr(cal_it, "close"):
            cal_it.close()
        calib = jnp.asarray(np.asarray(first["image"])[:8])
        serving = ServingSuperPoint.build(model.config, variables, calib,
                                          mode=mode)
    prob_fn = make_prob_fn(model, variables, fast=fast, serving=serving)

    n_shard = 1
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_shard = mesh.devices.size
        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
    # fixed device batch: every batch pads to one static shape so the
    # HA program compiles once (a trailing short batch would otherwise
    # recompile the whole fan-out)
    b_fixed = -(-int(config["data"].get("batch_size", 1)) // n_shard) * n_shard

    @jax.jit
    def ha_points(image_u8, img_keys):
        """uint8 batch -> (scores, ys, xs) top-k NMS'd detections.

        uint8 in (4x less H2D than f32 over the serving tunnel),
        fixed-size point lists out: the full-resolution heatmap never
        leaves the device.
        """
        image = image_u8.astype(jnp.float32) * (1.0 / 255.0)
        if enable_ha:
            prob = homography_adaptation(prob_fn, image, img_keys, ha_cfg)
        else:
            prob = prob_fn(image)
        pn = jax.vmap(
            lambda p: box_nms(
                p, size=det_cfg["nms"], iou=0.1,
                min_prob=det_thresh, keep_top_k=top_k,
            )
        )(prob)
        Bp, _, W = pn.shape
        scores, idx = jax.lax.top_k(pn.reshape(Bp, -1), k_cap)
        return scores, idx // W, idx % W

    def flush(pending):
        names_todo, res, _ = pending
        scores, ys, xs = (np.asarray(r) for r in res)
        for i, name in names_todo:
            keep = scores[i] >= det_thresh
            pred = np.stack([ys[i][keep], xs[i][keep]], axis=-1).astype(np.int64)
            np.save(out_dir / f"{name}.npy", pred)

    key = jax.random.PRNGKey(seed)
    pending = None  # 1-deep software pipeline: host IO overlaps device HA
    # global image cursor: keys are fold_in(key, index). A sharded
    # dataset (data.shard, multi-process export) starts the cursor at
    # its contiguous block's global offset so every image keeps the
    # same key it would get in a single-process run.
    img_seen = int(getattr(getattr(loader, "dataset", None),
                           "shard_offset", 0) or 0)
    for bi, batch in enumerate(loader):
        names = batch["name"]
        img = np.asarray(batch["image"])
        n_real = img.shape[0]
        todo = [(i, n) for i, n in enumerate(names)
                if not (out_dir / f"{n}.npy").exists()]
        idx0, img_seen = img_seen, img_seen + n_real
        if not todo:
            continue
        # per-image keys fold in the GLOBAL image index, so the warp
        # draws are a pure function of (seed, dataset order): exports
        # are bit-identical across batch sizes, sharding, padding and
        # resumes (a per-batch split chain made labels depend on
        # batch_size, which round 4 caught confounding the int8-vs-bf16
        # label-agreement comparison)
        img_keys = np.asarray(jax.vmap(jax.random.fold_in, (None, 0))(
            key, jnp.arange(idx0, idx0 + n_real)))
        pad = max(b_fixed, -(-n_real // n_shard) * n_shard) - n_real
        image_u8 = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
        if pad:  # padded rows are discarded on flush
            image_u8 = np.concatenate(
                [image_u8, np.repeat(image_u8[-1:], pad, axis=0)], axis=0)
            img_keys = np.concatenate(
                [img_keys, np.repeat(img_keys[-1:], pad, axis=0)], axis=0)
        if batch_sharding is not None:
            image_u8 = jax.device_put(image_u8, batch_sharding)
            img_keys = jax.device_put(jnp.asarray(img_keys), batch_sharding)
        else:
            img_keys = jnp.asarray(img_keys)
        res = ha_points(image_u8, img_keys)
        if pending is not None:
            flush(pending)  # previous batch: device work already done
        pending = (todo, res, n_real)
    if pending is not None:
        flush(pending)
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
