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
    """Sample (H, W, C) image at float coords, zeros outside. sx/sy: (Ho, Wo).

    Gathers run on the flattened (H*W, C) array with 1-D indices — XLA
    lowers flat gathers substantially better than 2-D advanced indexing.
    """
    H, W = image.shape[0], image.shape[1]
    flat = image.reshape(H * W, -1)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = (sx - x0)[..., None]
    ty = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        val = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, -1)
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        return val * inside[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def _nearest_gather(image: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray):
    H, W = image.shape[0], image.shape[1]
    flat = image.reshape(H * W, -1)
    xi = jnp.round(sx).astype(jnp.int32)
    yi = jnp.round(sy).astype(jnp.int32)
    idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
    val = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, -1)
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
    """Analytic valid mask + border erosion.

    Semantics of reference homographic_augmentation.py:109-125 (nearest
    warp of an all-ones image, then ellipse erosion), computed WITHOUT
    the gather: a destination pixel is valid iff its nearest source
    pixel H^-1 p rounds inside the image — pure arithmetic on the
    coordinate grid. homography: (B, 3, 3) -> mask (B, H, W) int32.
    """
    H, W = shape
    H_inv = jnp.linalg.inv(homography)
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (H, W, 3)
    src = jnp.einsum("bij,hwj->bhwi", H_inv, grid,
                     precision=jax.lax.Precision.HIGHEST)
    sx = src[..., 0] / src[..., 2]
    sy = src[..., 1] / src[..., 2]
    xi = jnp.round(sx)
    yi = jnp.round(sy)
    mask = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)).astype(jnp.float32)
    if erosion > 0:
        mask = binary_erosion(mask, ellipse_kernel(erosion * 2))
    return mask.astype(jnp.int32)


def warp_image_matmul(
    image: jnp.ndarray,
    homography: jnp.ndarray,
    out_shape: tuple[int, int] | None = None,
    row_tile: int = 16,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Bilinear homography warp as one-hot interpolation matmuls.

    Numerically identical to ``warp_image(mode='bilinear')`` but runs on
    the MXU instead of per-pixel gathers (~90M gathered elements/sec on
    TPU vs tens of TFLOPs of matmul): bilinear weights along x/y are the
    hat function relu(1 - |src - i|), so sampling is

        T[o, y]  = sum_x relu(1-|sx[o]-x|) * img[y, x]      (matmul)
        out[o]   = sum_y relu(1-|sy[o]-y|) * T[o, y]        (wide reduce)

    with o ranging over an output row tile (scanned). Zero padding
    outside the source matches the gather path. Cost: Hi*Wi*Ho*Wo MACs
    per image (~12 GFLOP at 240x320) — a bargain against gather latency
    for batched augmentation / homographic-adaptation fan-outs.

    Grayscale (C=1) only — the channel dim is folded into the matmul.

    ``compute_dtype=jnp.bfloat16`` runs the Hi-wide interpolation matmul
    with bf16 operands (f32 accumulation): one MXU pass instead of the
    multi-pass f32 emulation — ~6x faster on v5e, with ~3-decimal-digit
    weight precision (plenty for [0,1] images and probability maps; the
    default stays exact-f32 for the parity tests).

    ``compute_dtype=jnp.int8`` additionally quantizes BOTH matmul
    operands to 7-bit fixed point (x127, int32 accumulation, rescaled
    after): the int8 MXU runs at 2x the bf16 rate on v5e. Worst-case
    value error ~0.8%% of the [0, 1] range — invisible to HA pseudo-label
    aggregation (100-warp averages) and to the int8 serving detector,
    whose own input quantization discards the same bits. Inputs are
    clipped to [0, 1]; use bf16/f32 for signed or out-of-range data.
    """
    B, Hi, Wi, C = image.shape
    assert C == 1, "matmul warp is specialized for single-channel images"
    Ho, Wo = out_shape if out_shape is not None else (Hi, Wi)
    pad = (-Ho) % row_tile
    Ho_pad = Ho + pad
    n_tiles = Ho_pad // row_tile

    H_inv = jnp.linalg.inv(homography)
    img_t = image[..., 0].transpose(0, 2, 1)  # (B, Wi, Hi)
    if compute_dtype == jnp.int8:
        img_q = jnp.round(jnp.clip(img_t, 0.0, 1.0) * 127.0).astype(jnp.int8)

    xs = jnp.arange(Wo, dtype=jnp.float32)
    x_grid = jnp.arange(Wi, dtype=jnp.float32)
    y_grid = jnp.arange(Hi, dtype=jnp.float32)

    def tile_fn(tile_idx):
        ys = tile_idx * row_tile + jnp.arange(row_tile, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # (row_tile, Wo)
        grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
        src = jnp.einsum("bij,twj->btwi", H_inv, grid,
                         precision=jax.lax.Precision.HIGHEST)
        sx = src[..., 0] / src[..., 2]  # (B, row_tile, Wo)
        sy = src[..., 1] / src[..., 2]
        wx = jax.nn.relu(1.0 - jnp.abs(sx[..., None] - x_grid))  # (B,T,Wo,Wi)
        wy = jax.nn.relu(1.0 - jnp.abs(sy[..., None] - y_grid))  # (B,T,Wo,Hi)
        if compute_dtype == jnp.float32:
            # full-f32 matmul so interpolation weights aren't rounded
            t = jnp.matmul(wx.reshape(B, row_tile * Wo, Wi), img_t,
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        elif compute_dtype == jnp.int8:
            wq = jnp.round(wx.reshape(B, row_tile * Wo, Wi) * 127.0)
            t = jnp.matmul(wq.astype(jnp.int8), img_q,
                           preferred_element_type=jnp.int32)
            t = t.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
        else:
            t = jnp.matmul(
                wx.reshape(B, row_tile * Wo, Wi).astype(compute_dtype),
                img_t.astype(compute_dtype),
                preferred_element_type=jnp.float32)
        out = jnp.sum(wy.reshape(B, row_tile * Wo, Hi) * t, axis=-1)
        return out.reshape(B, row_tile, Wo)

    tiles = jax.lax.map(tile_fn, jnp.arange(n_tiles))
    out = tiles.transpose(1, 0, 2, 3).reshape(B, Ho_pad, Wo)[:, :Ho]
    return out[..., None]
