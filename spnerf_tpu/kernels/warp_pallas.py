"""Fused Pallas homography-warp kernel: hat weights built in VMEM.

``ops.image_warp.warp_image_matmul`` made the bilinear warp MXU-shaped
(two interpolation matmuls per image), but XLA materializes the
hat-weight tensors between the fused producer and the matmul: at HA
scale (chunk*B = 160 images x 240x320) that is ~25 GB of HBM traffic
per chunk step in bf16. This kernel keeps the weights in VMEM instead;
measured on chip both paths land within ~6% (23.2 vs 21.8 ms per 160
warps) — XLA's scanned-tile pipeline hides most of the HBM cost — but
the fused kernel's VMEM footprint is flat in Wo, making it the path
that scales to 480x640 where the weight tensors would be 4x larger.

The kernel fuses the whole warp per (image, row-tile) grid cell; for
each output row i of the tile (unrolled):

    sx_i, sy_i (1, Wo)   from H^-1 (SMEM scalars) on in-kernel iotas
    wxT_i (Wi, Wo)       = relu(1 - |sx_i - x|)    built in VMEM
    t_i   (Hi, Wo)       = img (Hi, Wi) @ wxT_i    one MXU dot
    out_i (1, Wo)        = sum_y relu(1 - |sy_i - y|) * t_i

Every tensor keeps output columns on the vector lanes, so no Mosaic
layout casts are needed, and HBM traffic per image drops to one
(Hi, Wi) image read (cached across row tiles by the constant index
map) plus the (Ho, Wo) output write — the weight tensors never exist
outside VMEM.

Numerics match ``warp_image_matmul``: identical hat-function weights,
f32 accumulation, zero padding outside the source (out-of-range sx/sy
zero all hat weights). compute_dtype bf16 rounds the wx operand like
the XLA bf16 path; int8 quantizes BOTH operands to 7-bit fixed point
(see image_warp docstring for the error budget).

Reference counterpart: the per-sample kornia CPU warps of
homographic_augmentation.py:116-124 / export.py:51-66.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hinv_ref, img_ref, out_ref, *, T, Wo, Wi, Hi, dtype):
    b = pl.program_id(0)
    t = pl.program_id(1)
    h = [hinv_ref[b, k] for k in range(9)]
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, Wo), 1).astype(jnp.float32)
    xg = jax.lax.broadcasted_iota(jnp.int32, (Wi, Wo), 0).astype(jnp.float32)
    yg = jax.lax.broadcasted_iota(jnp.int32, (Hi, Wo), 0).astype(jnp.float32)
    img = img_ref[0]
    for i in range(T):
        y = (t * T + i).astype(jnp.float32)
        denom = h[6] * xs + h[7] * y + h[8]
        sx = (h[0] * xs + h[1] * y + h[2]) / denom  # (1, Wo)
        sy = (h[3] * xs + h[4] * y + h[5]) / denom
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - xg))  # (Wi, Wo)
        if dtype == jnp.int8:
            wx = jnp.round(wx * 127.0).astype(jnp.int8)
            tm = jnp.dot(img, wx, preferred_element_type=jnp.int32)
            tm = tm.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
        else:
            tm = jnp.dot(img, wx.astype(dtype),
                         preferred_element_type=jnp.float32)  # (Hi, Wo)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - yg))
        out_ref[0, i, :] = jnp.sum(wy * tm, axis=0)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "row_tile",
                                             "interpret"))
def warp_image_fused(
    image: jnp.ndarray,
    homography: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    row_tile: int = 16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Warp (B, H, W, 1) images by (B, 3, 3) homographies on the MXU.

    dst(x, y) = src(H^-1 @ (x, y, 1)), bilinear, zero outside — the
    fused-kernel equivalent of ``warp_image_matmul`` (same output
    shape/dtype contract, same-shape output only).
    """
    B, Hi, Wi, C = image.shape
    assert C == 1, "fused warp is specialized for single-channel images"
    Ho, Wo = Hi, Wi
    pad = (-Ho) % row_tile
    n_tiles = (Ho + pad) // row_tile
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    cdt = jnp.dtype(compute_dtype)
    img = image[..., 0]  # (B, Hi, Wi)
    if cdt == jnp.int8:
        img = jnp.round(jnp.clip(img, 0.0, 1.0) * 127.0).astype(jnp.int8)
    else:
        img = img.astype(cdt)
    hinv = jnp.linalg.inv(homography).reshape(B, 9).astype(jnp.float32)

    kern = functools.partial(_kernel, T=row_tile, Wo=Wo, Wi=Wi, Hi=Hi,
                             dtype=cdt)
    out = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            # whole (B, 9) array in SMEM (tiny): per-block SMEM slices
            # are not Mosaic-legal, so the kernel indexes program_id(0)
            pl.BlockSpec((B, 9), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hi, Wi), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, row_tile, Wo), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho + pad, Wo), jnp.float32),
        interpret=interpret,
    )(hinv, img)
    return out[:, :Ho, :, None]
