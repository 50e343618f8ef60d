"""Batched on-device homography warping, erosion and valid masks.

The reference warps images per-sample on CPU through kornia
(homographic_augmentation.py:116-124, export.py:51-66). Here warping is
a vmapped bilinear/nearest gather that runs inside jit on device, so
homographic augmentation and homographic-adaptation fan-out are part of
the compiled program.

Convention: ``warp_image(img, H)`` computes dst(p) = src(H^-1 @ p) for
pixel coords p = (x, y, 1) — same as kornia.warp_perspective with
align_corners=True, and consistent with ``geometry.warp_points`` which
maps source points to destination points via H.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def ellipse_kernel(size: int) -> np.ndarray:
    """cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size)) equivalent.

    Computed from the same ellipse rasterization rule cv2 uses (per-row
    half-width from the ellipse equation); verified against cv2 in tests.
    """
    r = size // 2
    c = size // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    kernel = np.zeros((size, size), np.float32)
    for i in range(size):
        dy = i - r
        if abs(dy) > r:
            continue
        dx = int(round(c * np.sqrt(max(0.0, 1.0 - dy * dy * inv_r2))))
        j1 = max(c - dx, 0)
        j2 = min(c + dx + 1, size)
        kernel[i, j1:j2] = 1.0
    return kernel


def binary_erosion(mask: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Erode a binary (B, H, W) mask by a structuring element.

    Border handling matches kornia.morphology.erosion (pixels outside the
    image do NOT erode the border): the input is padded with ones. Anchor
    at (kh // 2, kw // 2) like kornia/cv2.
    """
    kh, kw = kernel.shape
    ah, aw = kh // 2, kw // 2
    x = mask.astype(jnp.float32)[..., None]  # (B, H, W, 1)
    x = jnp.pad(
        x, ((0, 0), (ah, kh - 1 - ah), (aw, kw - 1 - aw), (0, 0)),
        constant_values=1.0,
    )
    k = jnp.asarray(kernel, jnp.float32)[..., None, None]  # (kh, kw, 1, 1)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[..., 0]
    return (out >= float(kernel.sum()) - 0.5).astype(mask.dtype)


def _bilinear_gather(image: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray):
    """Sample (H, W, C) image at float coords, zeros outside. sx/sy: (Ho, Wo)."""
    H, W = image.shape[0], image.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        val = image[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        return val * inside[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    tx = tx[..., None]
    ty = ty[..., None]
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def _nearest_gather(image: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray):
    H, W = image.shape[0], image.shape[1]
    xi = jnp.round(sx).astype(jnp.int32)
    yi = jnp.round(sy).astype(jnp.int32)
    val = image[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
    inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    return val * inside[..., None]


@functools.partial(jax.jit, static_argnames=("mode", "out_shape"))
def warp_image(
    image: jnp.ndarray,
    homography: jnp.ndarray,
    mode: str = "bilinear",
    out_shape: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Warp (B, H, W, C) images by (B, 3, 3) homographies.

    dst(x, y) = src(H^-1 @ (x, y, 1)). Zero padding outside the source.
    """
    B, H, W, C = image.shape
    Ho, Wo = out_shape if out_shape is not None else (H, W)
    H_inv = jnp.linalg.inv(homography)

    ys, xs = jnp.meshgrid(
        jnp.arange(Ho, dtype=jnp.float32),
        jnp.arange(Wo, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (Ho, Wo, 3)

    def warp_one(img, hinv):
        src = jnp.einsum("ij,hwj->hwi", hinv, grid,
                         precision=jax.lax.Precision.HIGHEST)
        sx = src[..., 0] / src[..., 2]
        sy = src[..., 1] / src[..., 2]
        if mode == "bilinear":
            return _bilinear_gather(img, sx, sy)
        return _nearest_gather(img, sx, sy)

    return jax.vmap(warp_one)(image, H_inv)


def compute_valid_mask(
    shape: tuple[int, int],
    homography: jnp.ndarray,
    erosion: int = 0,
) -> jnp.ndarray:
    """Warp an all-ones image and erode the border.

    Matches reference homographic_augmentation.py:109-125: nearest warp
    of ones, optional erosion by an ellipse kernel of size (2*erosion,
    2*erosion). homography: (B, 3, 3) -> mask (B, H, W) int32.
    """
    B = homography.shape[0]
    ones = jnp.ones((B, shape[0], shape[1], 1), jnp.float32)
    mask = warp_image(ones, homography, mode="nearest")[..., 0]
    if erosion > 0:
        mask = binary_erosion(mask, ellipse_kernel(erosion * 2))
    return mask.astype(jnp.int32)
