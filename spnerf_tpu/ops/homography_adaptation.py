"""Homographic adaptation as one batched on-device program.

The reference runs a Python loop of 100 sequential single-image forward
passes per COCO image (export.py:83-114) — the pipeline's throughput
bottleneck (SURVEY §3.2). Here the whole fan-out is a jitted
``lax.scan`` over chunks of vmapped warps: sample all homographies with
jax.random, warp the batch, run ONE batched forward per chunk, unwarp
and aggregate sum/max/count on device in streaming fashion (no
(num, H, W) stack ever materializes).

Exact aggregation semantics preserved (export.py:42-114):
- mask  = erode(warp(ones, H)):   kills border artifacts in the warped
  frame before detection;
- count = erode(warp(ones, H^-1)): per-pixel visibility weight in the
  original frame;
- prob_proj = warp(model(warp(img, H)) * mask, H^-1) * count;
- counts include the identity view's ones; "sum" mode -> mean over
  visible views, "max" mode -> pixelwise max (identity view included).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from spnerf_tpu.geometry.homography import HomographyConfig, sample_homography
from spnerf_tpu.kernels.warp_pallas import warp_image_fused
from spnerf_tpu.ops.image_warp import (
    compute_valid_mask,
    warp_image_matmul,
)


@dataclasses.dataclass(frozen=True)
class HAConfig:
    num: int = 100
    aggregation: str = "sum"  # "sum" (-> mean) or "max"
    valid_border_margin: int = 3
    filter_counts: int = 0
    chunk: int = 10  # warps per scan step (static memory knob)
    # warp-interpolation precision: "bfloat16" (one MXU pass, ~1e-3
    # wobble on [0,1] maps — production default), "int8" (7-bit fixed
    # point, 2x MXU rate) or "float32" (exact parity/debug path)
    compute_dtype: str = "bfloat16"
    # "pallas": fused kernel (kernels/warp_pallas.py) — hat weights
    # never leave VMEM (flat memory in image size; the production
    # default). "matmul": XLA interpolation matmuls (same speed at
    # 240x320, 4x the HBM pressure at 480x640). float32 always uses
    # matmul (the Precision.HIGHEST parity path). Measured 240x320
    # HA bottleneck is the model forward (~54 of 65 ms/chunk step),
    # not the warps — see docs/PERF.md.
    warp_impl: str = "pallas"
    params: HomographyConfig = HomographyConfig()

    @classmethod
    def from_dict(cls, d: dict) -> "HAConfig":
        d = dict(d or {})
        params = HomographyConfig.from_dict(d.pop("params", {}))
        fields = {f.name for f in dataclasses.fields(cls)} - {"params"}
        return cls(params=params, **{k: v for k, v in d.items() if k in fields})


@partial(jax.jit, static_argnames=("prob_fn", "config"))
def homography_adaptation(
    prob_fn,
    image: jnp.ndarray,
    key: jax.Array,
    config: HAConfig,
) -> jnp.ndarray:
    """Aggregate detection probabilities over ``config.num`` random views.

    prob_fn: (B, H, W, 1) image -> (B, H, W) probability heatmap (already
    decoded). image: (B, H, W, 1). ``key`` is either a single PRNG key
    (split into per-image streams here) or a (B, 2) array of per-image
    keys — the latter lets callers derive keys from the *unpadded* batch
    so padded/sharded runs stay bit-identical to the plain run.
    Returns the aggregated (B, H, W) heatmap (before NMS/thresholding).
    """
    B, H, W, _ = image.shape
    cfg = config
    n_extra = cfg.num - 1
    chunk = min(cfg.chunk, max(n_extra, 1))
    n_chunks = -(-n_extra // chunk) if n_extra else 0
    pad_total = n_chunks * chunk  # >= n_extra; excess is masked out

    prob0 = prob_fn(image)  # identity view

    if n_extra == 0:
        return prob0

    # accept new-style typed PRNG keys (ndim 0 single / ndim 1 batch) by
    # normalising to raw uint32 key data, which the chunk reshapes below
    # rely on ((..., 2) trailing dim)
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    img_keys = jax.random.split(key, B) if key.ndim == 1 else key
    # (B, pad_total, 2): warp keys are a pure function of each image's
    # own stream, so batch padding cannot reshuffle them
    keys = jax.vmap(lambda k: jax.random.split(k, pad_total))(img_keys)
    keys = keys.transpose(1, 0, 2).reshape(n_chunks, chunk * B, 2)
    # per-warp validity (padding warps beyond num-1 contribute nothing)
    warp_alive = (jnp.arange(pad_total) < n_extra).astype(jnp.float32)
    warp_alive = warp_alive.reshape(n_chunks, chunk)

    img_tiled = jnp.tile(image, (chunk, 1, 1, 1))  # (chunk*B, H, W, 1)

    def chunk_step(carry, inp):
        sum_prob, sum_count, max_prob = carry
        ks, alive = inp  # (chunk*B, 2), (chunk,)
        Hs = jax.vmap(lambda k: sample_homography(k, (H, W), cfg.params))(ks)
        H_inv = jnp.linalg.inv(Hs)

        wdt = jnp.dtype(cfg.compute_dtype)
        if cfg.warp_impl == "pallas" and wdt != jnp.float32:
            warp = lambda img, H: warp_image_fused(img, H, compute_dtype=wdt)
        else:
            warp = lambda img, H: warp_image_matmul(img, H, compute_dtype=wdt)
        warped = warp(img_tiled, Hs)
        # analytic validity masks (no gathers): mask lives in the warped
        # frame (uses H), count in the original frame (uses H^-1)
        mask = compute_valid_mask((H, W), Hs, cfg.valid_border_margin)
        mask = mask.astype(jnp.float32)
        count = compute_valid_mask((H, W), H_inv, cfg.valid_border_margin)
        count = count.astype(jnp.float32)

        prob = prob_fn(warped) * mask  # (chunk*B, H, W)
        prob_proj = warp(prob[..., None], H_inv)[..., 0]
        prob_proj = prob_proj * count

        alive_b = jnp.repeat(alive, B)[:, None, None]
        prob_proj = prob_proj * alive_b
        count = count * alive_b

        pp = prob_proj.reshape(chunk, B, H, W)
        cc = count.reshape(chunk, B, H, W)
        sum_prob = sum_prob + pp.sum(0)
        sum_count = sum_count + cc.sum(0)
        # dead warps must not win the max: they contribute 0 in prob_proj,
        # which matches the reference's max over the stacked projections
        max_prob = jnp.maximum(max_prob, pp.max(0))
        return (sum_prob, sum_count, max_prob), None

    init = (prob0, jnp.ones_like(prob0), prob0)
    (sum_prob, sum_count, max_prob), _ = jax.lax.scan(
        chunk_step, init, (keys, warp_alive)
    )

    mean_prob = sum_prob / jnp.maximum(sum_count, 1e-6)
    if cfg.aggregation == "max":
        return max_prob
    return mean_prob
