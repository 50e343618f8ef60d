"""Training-step benchmark: steps/sec for the two production training
workloads, with a per-stage breakdown (aug / forward / forward+backward /
full step incl. Adam + BN update).

The reference's dominant cost is training — 450k iterations
(reference configs/superpoint_coco_train.yaml:60-71, train.py:45-154) —
so steps/s here is the number that decides wall-clock for the headline
runs. Two protocols, mirroring the demo/production configs:

  - MagicPoint  b32 240x320: on-device homographic self-augmentation +
    detector loss (reference magicpoint_coco_train.yaml).
  - SuperPoint  b4 240x320: warped-pair mode, detector + blockwise
    Pallas descriptor loss (reference superpoint_coco_train.yaml).

Each stage is its own jitted program timed like bench.py (materialize
via np.asarray; block_until_ready alone is unreliable on the tunneled
platform). Prints ONE JSON line per protocol.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.geometry.homography import HomographyConfig
from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
from spnerf_tpu.train.loop import (
    StepConfig,
    create_train_state,
    magicpoint_loss_fn,
    superpoint_loss_fn,
    train_step,
    _prepare_pair,
)
from spnerf_tpu.ops.photometric_device import (
    PhotometricDeviceConfig,
    photometric_augment,
)
from spnerf_tpu.train.pipeline import prepare_detector_batch

H = int(os.environ.get("SPNERF_BENCH_TRAIN_H", "240"))
W = int(os.environ.get("SPNERF_BENCH_TRAIN_W", "320"))
N_KPTS = 256


def make_batch(key, batch_size: int, pair: bool):
    k1, k2 = jax.random.split(key)
    image = jax.random.uniform(k1, (batch_size, H, W, 1))
    kpts = jax.random.uniform(
        k2, (batch_size, N_KPTS, 2),
        minval=0.0, maxval=float(min(H, W) - 1))
    batch = {
        "image": image,
        "kpts": kpts.astype(jnp.float32),
        "kpts_mask": jnp.ones((batch_size, N_KPTS), bool),
    }
    return batch


def time_fn(fn, *args, iters=20, materialize=lambda out: out):
    out = fn(*args)  # compile + warmup
    np.asarray(jax.tree.leaves(materialize(out))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(materialize(out))[0])
    return (time.perf_counter() - t0) / iters


def bench_protocol(name: str, batch_size: int, pair: bool):
    cfg_model = SuperPointConfig(
        model_name="superpoint" if pair else "magicpoint",
        det_thresh=0.015)
    model, variables = init_superpoint(
        jax.random.PRNGKey(0), cfg_model, (1, H, W, 1))
    aug = HomographyConfig(patch_ratio=0.85, scaling_amplitude=0.2,
                           perspective_amplitude_x=0.2,
                           perspective_amplitude_y=0.2,
                           allow_artifacts=True)
    # on-device photometric is part of the production step now
    # (configs/*_train.yaml photometric.on_device); params mirror
    # magicpoint_syn.yaml / superpoint_coco_train.yaml
    photometric = (
        PhotometricDeviceConfig(
            contrast_strength_range=(0.5, 1.5),
            gaussian_stddev_range=(0.0, 10.0),
            speckle_prob_range=(0.0, 0.0035),
            motion_max_kernel_size=3,
            shade_transparency_range=(-0.5, 0.5),
            shade_kernel_size_range=(100, 150),
        )
        if pair
        else PhotometricDeviceConfig(
            brightness_max_abs_change=75.0,
            contrast_strength_range=(0.3, 1.8),
            gaussian_stddev_range=(0.0, 15.0),
            speckle_prob_range=(0.0, 0.0035),
            motion_max_kernel_size=7,
            shade_kernel_size_range=(50, 100),
        )
    )
    step_cfg = StepConfig(model=model, aug=aug, erosion=3, pair=pair,
                          pallas_desc=pair, photometric=photometric)
    state, tx = create_train_state(variables, 1e-3)
    batch = make_batch(jax.random.PRNGKey(1), batch_size, pair)
    key = jax.random.PRNGKey(2)

    # --- breakdown stages (independently jitted programs) ---
    if pair:
        prep = jax.jit(lambda k, b: _prepare_pair(b, k, step_cfg))

        def loss_of(params, bs, data, k):
            return superpoint_loss_fn(
                params, bs, step_cfg.model, data, k, step_cfg.grid_size,
                step_cfg.include_mask, step_cfg.desc_cfg, step_cfg.nerf_desc,
                True, step_cfg.pallas_desc)[0]
    else:
        prep = jax.jit(
            lambda k, b: prepare_detector_batch(k, b, step_cfg.aug,
                                                step_cfg.erosion))

        def loss_of(params, bs, data, k):
            return magicpoint_loss_fn(
                params, bs, step_cfg.model, data, k, step_cfg.grid_size,
                step_cfg.include_mask, True)[0]

    data = prep(key, batch)
    fwd = jax.jit(lambda p, b, d, k: loss_of(p, b, d, k))
    fwd_bwd = jax.jit(jax.grad(loss_of))

    photo = jax.jit(
        lambda k, x: photometric_augment(k, x, step_cfg.photometric))
    t_photo = time_fn(photo, key, batch["image"])
    t_aug = time_fn(prep, key, batch)
    t_fwd = time_fn(fwd, state.params, state.batch_stats, data, key)
    t_fb = time_fn(fwd_bwd, state.params, state.batch_stats, data, key)

    # --- the real fused step (donated state): time a linear chain ---
    n_iters = 20
    state, _ = train_step(state, batch, key, step_cfg, tx)  # compile
    np.asarray(state.iteration)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = train_step(state, batch, key, step_cfg, tx)
    np.asarray(state.iteration)
    t_step = (time.perf_counter() - t0) / n_iters

    print(json.dumps({
        "metric": f"train_step_{name}_b{batch_size}_{H}x{W}",
        "value": round(1.0 / t_step, 3),
        "unit": "steps/sec",
        "breakdown_ms": {
            "photo": round(t_photo * 1e3, 2),
            "aug": round(t_aug * 1e3, 2),
            "fwd": round(t_fwd * 1e3, 2),
            "fwd_bwd": round(t_fb * 1e3, 2),
            "full_step": round(t_step * 1e3, 2),
        },
        "imgs_per_sec": round(batch_size * (2 if pair else 1) / t_step, 2),
    }), flush=True)


def main():
    which = os.environ.get("SPNERF_BENCH_TRAIN", "both")
    if which in ("both", "magicpoint"):
        bench_protocol("magicpoint", 32, pair=False)
    if which in ("both", "superpoint"):
        bench_protocol("superpoint", 4, pair=True)


if __name__ == "__main__":
    main()
