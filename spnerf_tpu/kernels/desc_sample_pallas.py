"""Fused bicubic descriptor sampling: weights built in VMEM, one MXU dot.

The XLA path (ops/fast_inference.sample_descriptors_onehot) materializes
the combined (B, K, Hc*Wc) interpolation matrix in HBM before the
(K, Hc*Wc) @ (Hc*Wc, C) contraction — at batch 64 / K=1024 that is
~1.2 GB of HBM traffic for a matrix the matmul consumes immediately.
Measured on chip (benchmarks/micro_tail.py, b64 480x640): the W2 build
alone is 6.9 ms vs 2.5 ms for the matmul it feeds.

This kernel keeps the interpolation matrix in VMEM for its whole
lifetime. Per grid step (one image x one block of kb points):

1. cubic axis weights Wy (kb, Hc), Wx (kb, Wc) are computed on the VPU
   from the raw point coordinates (same Keys a=-0.75 geometry + border
   clamping as ops/fast_inference._axis_weight_matrix, itself the
   reference's dense bicubic x8 upsample sampled at keypoints,
   heads.py:65-67);
2. the combined matrix W2[k, h*Wc+w] = Wy[k,h] * Wx[k,w] is assembled
   as a LANE-AXIS CONCAT of the Hc per-row products (Wx * Wy[:, h:h+1])
   — static slices and lane concats only, no sublane<->lane reshape for
   Mosaic to relayout;
3. descriptors come from one (kb, Hc*Wc) @ (Hc*Wc, C) MXU dot against
   the whole descriptor map, resident in VMEM across the point blocks
   of the same image (2.4 MB bf16 at 60x80x256);
4. the L2 normalize runs on the f32 accumulator before the store.

HBM traffic per image drops from ~19 MB (write + read of W2) to the
2.4 MB descriptor map + points/outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cubic_weights(t, a: float = -0.75):
    """(kb, 1) fractional offsets -> four Keys tap weights, each (kb, 1)."""
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2 * t2 + t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w3 = a * (-t3 + t2)
    return (w0, w1, w2, w3)


def _axis_weights(coord, n: int, grid_size: int):
    """(kb, 1) pixel coords -> (kb, n) cubic row weights, border-clamped.

    Same result as ops/fast_inference._axis_weight_matrix but built from
    2-D broadcasts only (no (K, 4, n) one-hot tensor): each of the four
    taps contributes w_t where its clamped integer index equals the
    column, accumulated over taps so clipped border taps stack exactly
    like the XLA path's scatter-free one-hot sum.
    """
    kb = coord.shape[0]
    src = (coord + 0.5) / grid_size - 0.5
    base = jnp.floor(src)
    t = src - base
    taps = _cubic_weights(t)
    cols = jax.lax.broadcasted_iota(jnp.int32, (kb, n), 1)
    base_i = base.astype(jnp.int32)
    acc = jnp.zeros((kb, n), jnp.float32)
    for off, w in zip((-1, 0, 1, 2), taps):
        idx = jnp.clip(base_i + off, 0, n - 1)
        acc = acc + jnp.where(cols == idx, w, 0.0)
    return acc


def _sample_kernel(pts_ref, desc_ref, out_ref, *, Hc, Wc, grid_size,
                   normalize, compute_dtype):
    pts = pts_ref[0]  # (kb, 2) f32
    y = pts[:, 0:1]
    x = pts[:, 1:2]
    Wy = _axis_weights(y, Hc, grid_size)  # (kb, Hc)
    Wx = _axis_weights(x, Wc, grid_size)  # (kb, Wc)
    # W2 rows, one image row at a time: static lane slices + lane concat
    parts = [(Wx * Wy[:, h:h + 1]).astype(compute_dtype) for h in range(Hc)]
    W2 = jnp.concatenate(parts, axis=1)  # (kb, Hc*Wc)
    out = jnp.dot(W2, desc_ref[0].astype(compute_dtype),
                  preferred_element_type=jnp.float32)  # (kb, C)
    if normalize:
        out = out / (jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True))
                     + 1e-12)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("grid_size", "normalize",
                                             "block_k", "compute_dtype",
                                             "interpret"))
def sample_descriptors_fused(
    desc_raw: jnp.ndarray,
    points: jnp.ndarray,
    grid_size: int = 8,
    normalize: bool = True,
    block_k: int = 256,
    compute_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched fused sampling: (B, Hc, Wc, C), (B, K, 2) -> (B, K, C) f32.

    Drop-in for ``vmap(sample_descriptors_onehot)`` (same geometry, same
    bf16 contraction; accumulation order differs so values match to
    matmul rounding). K is padded to a multiple of ``block_k`` with
    clamped dummy points and sliced back.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Hc, Wc, C = desc_raw.shape
    K = points.shape[1]
    kb = min(block_k, max(8, K))
    Kp = -(-K // kb) * kb
    if Kp != K:
        points = jnp.pad(points, ((0, 0), (0, Kp - K), (0, 0)))
    desc_flat = desc_raw.reshape(B, Hc * Wc, C)  # layout-free view

    kernel = functools.partial(
        _sample_kernel, Hc=Hc, Wc=Wc, grid_size=grid_size,
        normalize=normalize, compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, Kp // kb),
        in_specs=[
            pl.BlockSpec((1, kb, 2), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, Hc * Wc, C), lambda b, j: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, kb, C), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Kp, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(points.astype(jnp.float32), desc_flat)
    return out[:, :K] if Kp != K else out
