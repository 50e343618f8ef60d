"""Benchmark: SuperPoint inference throughput at 480x640 on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

Baseline target (BASELINE.md): >= 5,000 frames/sec/chip on TPU v5e.

Protocol: full production inference path in bf16 — VGG backbone +
detector/descriptor heads, fused decode (softmax -> dustbin ->
depth-to-space), fast NMS, top-K keypoint extraction and bicubic
descriptor sampling AT keypoints (the TPU-native equivalent of the
reference's dense x8 upsample; see ops/descriptor_sampling.py).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.geometry.keypoints import top_k_keypoints
from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
from spnerf_tpu.ops.descriptor_sampling import sample_descriptors
from spnerf_tpu.ops.detector_decode import decode_detector_logits
from spnerf_tpu.ops.nms import box_nms

H, W = 480, 640
BATCH = 16
TOP_K = 1000
BASELINE_FPS = 5000.0


def build_inference(model, variables):
    cfg = model.config
    bf16_vars = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )

    @jax.jit
    def infer(image):
        out = model.apply(bf16_vars, image.astype(jnp.bfloat16), train=False)
        prob = decode_detector_logits(out["logits"].astype(jnp.float32),
                                      cfg.grid_size)
        nms = jax.vmap(
            lambda p: box_nms(p, size=cfg.nms, iou=0.1,
                              min_prob=cfg.det_thresh, keep_top_k=0)
        )(prob)
        pts, scores, valid = jax.vmap(
            lambda p: top_k_keypoints(p, TOP_K, cfg.det_thresh)
        )(nms)
        desc = jax.vmap(
            lambda d, p: sample_descriptors(d, p, cfg.grid_size)
        )(out["desc_raw"].astype(jnp.float32), pts)
        return pts, scores, valid, desc

    return infer


def main():
    model, variables = init_superpoint(
        jax.random.PRNGKey(0),
        SuperPointConfig(model_name="superpoint", det_thresh=0.015),
        (1, H, W, 1),
    )
    infer = build_inference(model, variables)

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, H, W, 1))
    # warmup / compile
    jax.block_until_ready(infer(x))

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = infer(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = BATCH * n_iters / dt
    print(json.dumps({
        "metric": "superpoint_inference_480x640",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
