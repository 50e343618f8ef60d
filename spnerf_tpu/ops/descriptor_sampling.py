"""Descriptor sampling at keypoint locations.

The reference upsamples the raw (Hc, Wc, 256) descriptor map bicubically
x8 to full resolution and L2-normalizes the dense volume (heads.py:65-67)
— then downstream evaluation only ever reads it AT keypoints
(descriptor_evaluation.py:70-74, pose_evaluation.py:60-91). At 480x640
that dense volume is 300 MB/image in fp32: pure HBM-bandwidth waste.

TPU-first path: interpolate the raw descriptor map directly at the K
keypoint locations (bicubic, matching torch align_corners=False
semantics and the x8 upsample's phase geometry), then L2-normalize K
vectors instead of H*W. The dense path (ops/upsample.py) remains for
parity checks.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """4-tap cubic kernel weights at fractional positions t (torch a=-0.75)."""
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2 * t2 + t)                 # offset -1  (x = t + 1)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1       # offset 0   (x = t)
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t  # offset 1 (x = 1 - t)
    w3 = a * (-t3 + t2)                        # offset 2   (x = 2 - t)
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def sample_descriptors(
    desc_raw: jnp.ndarray,
    points: jnp.ndarray,
    grid_size: int = 8,
    method: str = "bicubic",
    normalize: bool = True,
) -> jnp.ndarray:
    """Interpolate (Hc, Wc, C) raw descriptors at (K, 2) (y, x) pixel
    coords of the full-resolution image.

    Equivalent (up to interpolation at identical sample positions) to
    reading the x8-bicubic-upsampled dense map at those pixels: pixel p
    maps to raw coordinate (p + 0.5) / grid_size - 0.5
    (align_corners=False geometry).
    """
    Hc, Wc, C = desc_raw.shape
    src = (points.astype(jnp.float32) + 0.5) / grid_size - 0.5  # (K, 2)
    base = jnp.floor(src)
    t = src - base  # fractional in [0, 1)
    by = base[:, 0].astype(jnp.int32)
    bx = base[:, 1].astype(jnp.int32)

    if method == "bilinear":
        def g(dy, dx):
            yy = jnp.clip(by + dy, 0, Hc - 1)
            xx = jnp.clip(bx + dx, 0, Wc - 1)
            return desc_raw[yy, xx]

        ty = t[:, 0:1]
        tx = t[:, 1:2]
        out = (
            g(0, 0) * (1 - ty) * (1 - tx)
            + g(0, 1) * (1 - ty) * tx
            + g(1, 0) * ty * (1 - tx)
            + g(1, 1) * ty * tx
        )
    else:
        wy = _cubic_weights(t[:, 0])  # (K, 4)
        wx = _cubic_weights(t[:, 1])
        out = 0.0
        for iy in range(4):
            yy = jnp.clip(by + iy - 1, 0, Hc - 1)
            row = 0.0
            for ix in range(4):
                xx = jnp.clip(bx + ix - 1, 0, Wc - 1)
                row = row + desc_raw[yy, xx] * wx[:, ix : ix + 1]
            out = out + row * wy[:, iy : iy + 1]

    if normalize:
        out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
    return out
