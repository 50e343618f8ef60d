"""On-device photometric augmentation (jitted, batched).

Device counterpart of ``data/photometric.py`` (itself the counterpart of
reference data_utils/photometric_augmentation.py:7-118). The host
version costs ~3 ms/sample on the 1-core host — more than the entire
device train step at SuperPoint batch sizes — so when
``augmentation.photometric.on_device: true`` is set, the datasets ship
raw images and the six primitives run inside the jitted train step.

Semantics vs the host version:

- images are the loop's ``[0, 1]`` float domain; all parameters keep
  their reference 0-255 units and are rescaled internally, so configs
  are shared verbatim between host and device modes.
- parameter draws (brightness delta, noise std, ellipse geometry, ...)
  are independent per sample, exactly like the host version;
- the random *application order* of the primitives is drawn once per
  batch instead of once per sample (a per-sample order would make
  ``lax.switch`` execute every branch under ``vmap``; one order per
  step keeps exactly one branch live and the dataset-level order
  distribution identical);
- ``motion_blur`` / ``additive_shade`` blur with reflect-101 padding to
  match cv2's default border; the shade blur uses cv2's sigma-from-ksize
  rule (sigma = 0.3*((k-1)*0.5 - 1) + 0.8 for GaussianBlur(..., 0)).

Runtime-sized kernels are expressed as static max-width kernels whose
taps outside the drawn radius are masked to zero, keeping every shape
static for XLA.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

PRIMITIVES = (
    "random_brightness",
    "random_contrast",
    "additive_gaussian_noise",
    "additive_speckle_noise",
    "motion_blur",
    "additive_shade",
)


@dataclasses.dataclass(frozen=True)
class PhotometricDeviceConfig:
    """Hashable static config captured by the jitted step."""

    primitives: tuple[str, ...] = PRIMITIVES
    brightness_max_abs_change: float = 50.0
    contrast_strength_range: tuple[float, float] = (0.5, 1.5)
    gaussian_stddev_range: tuple[float, float] = (0.0, 10.0)
    speckle_prob_range: tuple[float, float] = (0.0, 0.005)
    motion_max_kernel_size: int = 3
    shade_nb_ellipses: int = 20
    shade_transparency_range: tuple[float, float] = (-0.5, 0.8)
    shade_kernel_size_range: tuple[int, int] = (100, 150)

    @classmethod
    def from_dict(cls, config: dict | None) -> "PhotometricDeviceConfig":
        """Build from an ``augmentation.photometric`` config block."""
        config = config or {}
        prims = config.get("primitives", "all")
        if prims == "all" or prims is None:
            prims = list(PRIMITIVES)
        prims = tuple(p for p in prims if p in PRIMITIVES)
        params = config.get("params", {}) or {}

        def rng2(name, key, default):
            v = params.get(name, {}).get(key, default)
            return (float(v[0]), float(v[1]))

        return cls(
            primitives=prims,
            brightness_max_abs_change=float(
                params.get("random_brightness", {}).get("max_abs_change", 50.0)
            ),
            contrast_strength_range=rng2(
                "random_contrast", "strength_range", (0.5, 1.5)
            ),
            gaussian_stddev_range=rng2(
                "additive_gaussian_noise", "stddev_range", (0.0, 10.0)
            ),
            speckle_prob_range=rng2(
                "additive_speckle_noise", "prob_range", (0.0, 0.005)
            ),
            motion_max_kernel_size=int(
                params.get("motion_blur", {}).get("max_kernel_size", 3)
            ),
            shade_nb_ellipses=int(
                params.get("additive_shade", {}).get("nb_ellipses", 20)
            ),
            shade_transparency_range=rng2(
                "additive_shade", "transparency_range", (-0.5, 0.8)
            ),
            shade_kernel_size_range=tuple(
                int(v)
                for v in params.get("additive_shade", {}).get(
                    "kernel_size_range", (100, 150)
                )
            ),
        )


# ----------------------------------------------------------------- helpers


def _per_sample_uniform(key, B, lo, hi):
    return jax.random.uniform(
        key, (B, 1, 1, 1), minval=lo, maxval=hi, dtype=jnp.float32
    )


def _depthwise_conv(images: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample 2D conv via the batch-as-channels depthwise trick.

    images: (B, H, W, 1) already padded; kernels: (B, kh, kw). One
    grouped conv applies each sample's own kernel — no vmap of B
    singleton convs.
    """
    B = images.shape[0]
    lhs = jnp.transpose(images[..., 0], (1, 2, 0))[None]  # (1, H, W, B)
    rhs = jnp.transpose(kernels, (1, 2, 0))[:, :, None, :]  # (kh, kw, 1, B)
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=B,
    )  # (1, H', W', B)
    return jnp.transpose(out[0], (2, 0, 1))[..., None]


def _reflect_pad(images: jnp.ndarray, rh: int, rw: int) -> jnp.ndarray:
    """reflect-101 (cv2 default border) padding on H and W."""
    return jnp.pad(images, ((0, 0), (rh, rh), (rw, rw), (0, 0)), mode="reflect")


# -------------------------------------------------------------- primitives
# Each takes/returns (B, H, W, 1) float32 in [0, 1].


def random_brightness(images, key, cfg: PhotometricDeviceConfig):
    m = cfg.brightness_max_abs_change / 255.0
    delta = _per_sample_uniform(key, images.shape[0], -m, m)
    return jnp.clip(images + delta, 0.0, 1.0)


def random_contrast(images, key, cfg: PhotometricDeviceConfig):
    lo, hi = cfg.contrast_strength_range
    s = _per_sample_uniform(key, images.shape[0], lo, hi)
    mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    return jnp.clip((images - mean) * s + mean, 0.0, 1.0)


def additive_gaussian_noise(images, key, cfg: PhotometricDeviceConfig):
    k_std, k_noise = jax.random.split(key)
    lo, hi = cfg.gaussian_stddev_range
    std = _per_sample_uniform(k_std, images.shape[0], lo / 255.0, hi / 255.0)
    noise = jax.random.normal(k_noise, images.shape, jnp.float32)
    return jnp.clip(images + std * noise, 0.0, 1.0)


def additive_speckle_noise(images, key, cfg: PhotometricDeviceConfig):
    k_p, k_u = jax.random.split(key)
    lo, hi = cfg.speckle_prob_range
    p = _per_sample_uniform(k_p, images.shape[0], lo, hi)
    u = jax.random.uniform(k_u, images.shape, dtype=jnp.float32)
    out = jnp.where(u < p, 0.0, images)
    return jnp.where(u > 1.0 - p, 1.0, out)


def motion_blur(images, key, cfg: PhotometricDeviceConfig):
    """Line-kernel blur: direction in {h, v, d1, d2}, odd length <= max.

    Host draw (data/photometric.py:50-68): ksize = 2*randint(0,
    (max+1)//2 + 1) + 1 capped to the next odd >= max; length-1 kernels
    are the identity (radius 0 leaves only the center tap).
    """
    B = images.shape[0]
    m = cfg.motion_max_kernel_size
    K = m if m % 2 else m + 1  # static kernel extent (odd)
    c = (K - 1) // 2
    k_size, k_dir = jax.random.split(key)
    draw = jax.random.randint(k_size, (B,), 0, (m + 1) // 2 + 1)
    radius = jnp.minimum(draw, c)[:, None, None]  # (B,1,1)
    direction = jax.random.randint(k_dir, (B,), 0, 4)[:, None, None]

    ii = jnp.arange(K, dtype=jnp.int32)[None, :, None] - c  # rows
    jj = jnp.arange(K, dtype=jnp.int32)[None, None, :] - c  # cols
    on_line = jnp.select(
        [direction == 0, direction == 1, direction == 2],
        [ii == 0, jj == 0, ii == jj],
        ii == -jj,
    )
    within = (jnp.abs(ii) <= radius) & (jnp.abs(jj) <= radius)
    kernels = (on_line & within).astype(jnp.float32)
    kernels = kernels / jnp.sum(kernels, axis=(1, 2), keepdims=True)
    return _depthwise_conv(_reflect_pad(images, c, c), kernels)


def additive_shade(images, key, cfg: PhotometricDeviceConfig):
    """Random blurred ellipse shadows (host version: cv2.ellipse fill +
    GaussianBlur, data/photometric.py:71-90). The ellipse mask is an
    analytic field evaluated over the pixel grid; the blur is a
    separable Gaussian with a runtime radius masked inside a static
    max-width kernel."""
    B, H, W, _ = images.shape
    n = cfg.shade_nb_ellipses
    k_ax, k_ay, k_x, k_y, k_ang, k_t, k_ks = jax.random.split(key, 7)
    min_dim = min(H, W) / 4.0

    ax = jnp.maximum(
        jax.random.uniform(k_ax, (B, n), minval=min_dim / 5, maxval=min_dim), 1.0
    )
    ay = jnp.maximum(
        jax.random.uniform(k_ay, (B, n), minval=min_dim / 5, maxval=min_dim), 1.0
    )
    max_rad = jnp.maximum(ax, ay)
    # host draws integer centers in [max_rad, dim - max_rad)
    cx = max_rad + jax.random.uniform(k_x, (B, n)) * jnp.maximum(
        W - 2 * max_rad, 1.0
    )
    cy = max_rad + jax.random.uniform(k_y, (B, n)) * jnp.maximum(
        H - 2 * max_rad, 1.0
    )
    angle = jax.random.uniform(k_ang, (B, n), minval=0.0, maxval=jnp.pi / 2)

    X = jnp.arange(W, dtype=jnp.float32)[None, None, None, :]  # (1,1,1,W)
    Y = jnp.arange(H, dtype=jnp.float32)[None, None, :, None]  # (1,1,H,1)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    dx = X - cx[..., None, None]
    dy = Y - cy[..., None, None]
    xr = dx * ca[..., None, None] + dy * sa[..., None, None]
    yr = -dx * sa[..., None, None] + dy * ca[..., None, None]
    inside = (xr / ax[..., None, None]) ** 2 + (yr / ay[..., None, None]) ** 2 <= 1.0
    mask = jnp.any(inside, axis=1).astype(jnp.float32)[..., None]  # (B,H,W,1)

    lo_t, hi_t = cfg.shade_transparency_range
    transparency = _per_sample_uniform(k_t, B, lo_t, hi_t)

    # Gaussian blur: runtime odd ksize in [lo, hi], sigma via cv2's rule
    lo_k, hi_k = cfg.shade_kernel_size_range
    Kmax = hi_k if hi_k % 2 else hi_k + 1
    c = (Kmax - 1) // 2
    ks = jax.random.randint(k_ks, (B,), lo_k, hi_k)
    ks = ks + (1 - ks % 2)  # next odd, like the host version
    sigma = 0.3 * ((ks.astype(jnp.float32) - 1.0) * 0.5 - 1.0) + 0.8
    taps = jnp.arange(Kmax, dtype=jnp.float32)[None, :] - c  # (1, Kmax)
    g = jnp.exp(-0.5 * (taps / sigma[:, None]) ** 2)
    g = jnp.where(jnp.abs(taps) <= ((ks - 1) // 2)[:, None].astype(jnp.float32), g, 0.0)
    g = g / jnp.sum(g, axis=1, keepdims=True)  # (B, Kmax)

    # reflect padding caps at dim-1: truncate (and renormalize) the
    # kernel per axis so tiny images (tests) stay valid
    def _axis_kernel(dim):
        r = min(c, dim - 1)
        gk = g[:, c - r : c + r + 1]
        return gk / jnp.sum(gk, axis=1, keepdims=True), r

    gw, rw = _axis_kernel(W)
    gh, rh = _axis_kernel(H)
    blurred = _depthwise_conv(_reflect_pad(mask, 0, rw), gw[:, None, :])
    blurred = _depthwise_conv(_reflect_pad(blurred, rh, 0), gh[:, :, None])
    return jnp.clip(images * (1.0 - transparency * blurred), 0.0, 1.0)


AUG_FNS = {
    "random_brightness": random_brightness,
    "random_contrast": random_contrast,
    "additive_gaussian_noise": additive_gaussian_noise,
    "additive_speckle_noise": additive_speckle_noise,
    "motion_blur": motion_blur,
    "additive_shade": additive_shade,
}


def photometric_augment(
    key: jax.Array, images: jnp.ndarray, cfg: PhotometricDeviceConfig
) -> jnp.ndarray:
    """Apply the configured primitives in a random order (one order per
    batch, independent parameter draws per sample).

    images: (B, H, W, 1) float in [0, 1].
    """
    n = len(cfg.primitives)
    if n == 0:
        return images
    k_order, k_apply = jax.random.split(key)
    order = jax.random.permutation(k_order, n)
    branches = [partial(AUG_FNS[p], cfg=cfg) for p in cfg.primitives]
    for pos in range(n):
        k = jax.random.fold_in(k_apply, pos)
        images = lax.switch(order[pos], branches, images, k)
    return images
