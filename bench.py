"""Benchmark: SuperPoint inference throughput at 480x640 on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

Baseline target (BASELINE.md): >= 5,000 frames/sec/chip on TPU v5e.

Protocol: full production inference in bf16 — BN-folded VGG backbone +
detector/descriptor heads (models/superpoint.fold_batch_norm), fused
decode (softmax -> dustbin -> depth-to-space), candidate-based NMS +
top-K (ops/fast_inference.detect_keypoints: one approx_max_k + pairwise
suppression instead of full-image windows and sorts), and bicubic
descriptor sampling AT keypoints as separable MXU matmuls
(sample_descriptors_matmul) — the TPU-native equivalent of the
reference's dense x8 upsample path.
"""

import json
import time

import jax
import jax.numpy as jnp

from spnerf_tpu.models.superpoint import (
    SuperPoint,
    SuperPointConfig,
    fold_batch_norm,
    init_superpoint,
)
from spnerf_tpu.ops.detector_decode import decode_detector_logits
from spnerf_tpu.ops.fast_inference import (
    detect_keypoints,
    sample_descriptors_matmul,
)

H, W = 480, 640
BATCH = 64
TOP_K = 1000
BASELINE_FPS = 5000.0


def build_inference(config: SuperPointConfig, variables):
    folded = fold_batch_norm(variables)
    infer_model = SuperPoint(
        SuperPointConfig(**{**config.__dict__, "use_bn": False})
    )
    bf16_vars = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        folded,
    )
    cfg = config

    @jax.jit
    def infer(image):
        out = infer_model.apply(bf16_vars, image.astype(jnp.bfloat16),
                                train=False)
        prob = decode_detector_logits(out["logits"].astype(jnp.float32),
                                      cfg.grid_size)
        pts, scores, valid = detect_keypoints(
            prob, min_prob=cfg.det_thresh, size=cfg.nms, top_k=TOP_K,
        )
        desc = jax.vmap(
            lambda d, p: sample_descriptors_matmul(d, p, cfg.grid_size)
        )(out["desc_raw"].astype(jnp.bfloat16), pts)
        return pts, scores, valid, desc

    return infer


def main():
    cfg = SuperPointConfig(model_name="superpoint", det_thresh=0.015)
    _, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, H, W, 1))
    infer = build_inference(cfg, variables)

    import numpy as np

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, H, W, 1))
    np.asarray(infer(x)[1])  # warmup / compile + materialize

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = infer(x)
    # force materialization: block_until_ready alone is unreliable on the
    # tunneled platform
    np.asarray(out[1])
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
