"""Fused conv1+conv2+maxpool Pallas kernel for the VGG stack entry.

The two full-resolution layers dominate SuperPoint inference HBM
traffic: materializing conv1's 480x640x64 activations costs ~2.5 GB of
write+read per batch-64, conv2's output another 2.5 GB, and the 2x2
maxpool re-reads it all (reference VGG_Backbone.py:44-47 = blocks 1-2 +
pool). This kernel computes image -> conv1 -> ReLU -> conv2 -> ReLU ->
maxpool entirely in VMEM, writing only the pooled (B, H/2, W/2, 64)
int8 activations — an ~8x traffic reduction for the stack entry.

Why conv1 is hard on TPU: C_in=1 leaves 127/128 MXU contraction lanes
idle, and building im2col patches in XLA is strided-gather-bound. The
round-2 kernel computed conv1 on the VPU (12 broadcast-FMAs per
activation row) — correct, but it left the MXU idle and was ~25 ms of
the 35 ms conv12 budget at batch 64.

Round-3 formulation — conv1 as a *banded-Toeplitz MXU matmul*: the
transposed band slab A[w_pair, (u, r)] (image rows on lanes, the four
column-tap offsets u ∈ {-1, 0, 1, 2} packed along the lane axis by
``conv12_prepare``) is contracted against a host-precomputed banded
weight matrix W[(u, r), (g, half, c)] = k1[r - g, dx(u, half), c],
giving ALL hb+2 activation rows of a band as ONE MXU dot:

    acc[w_pair, (g, half, c)] = A[w_pair, (u, r)] @ W[(u, r), ·]

Each output lane tile g (128-aligned, so the slice is Mosaic-legal)
is then requantized and stored to the conv2 scratch — the VPU does
only requant + stores, and conv1 rides the MXU like everything else.
Conv1 weights are per-channel int8-quantized (the last f32 weights in
the serving stack), with the dequant scale folded into the requant
multiplier.

Host-side prep (``conv12_prepare``): quantize the image to int8
(pixels are [0,1]; scale 127 costs <0.5% of range), zero-pad, split W
columns by parity (tap columns 2j+u alternate parity in u), transpose,
and pre-window into per-band lane slabs so every in-kernel lane index
is static. All relayout work happens on the ~20 MB int8 image, not on
GB-scale activations.

conv2 then runs the established W-pair-packed MXU formulation (see
conv_stack_pallas.packed_conv3x3_pallas) on the VMEM-resident conv1
activations, with requantization and the 2x2 maxpool fused into the
epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spnerf_tpu.kernels.conv_stack_pallas import (
    _affine,
    _cast,
    _pool_packed,
    _requant,
    pack_weights_center,
    pack_weights_side,
)

# conv1 column-tap offsets u: output pixel pair (2j, 2j+1) reads image
# columns 2j+u for u in {-1, 0, 1, 2} — the lo pixel 2j uses u <= 1
# (kernel dx = u+1), the hi pixel 2j+1 uses u >= 0 (dx = u).
_COL_TAPS = (-1, 0, 1, 2)


def quantize_conv1_weights(k1: jnp.ndarray):
    """Per-channel symmetric int8 quantization of the (3, 3, 1, 64)
    conv1 kernel: returns (kq (3, 3, 64) int8, scale (64,) f32) with
    k1 ~= kq * scale."""
    k = jnp.asarray(k1, jnp.float32).reshape(3, 3, 64)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1)), 1e-12) / 127.0
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return kq, scale


def build_conv1_banded_weights(kq: jnp.ndarray, hb: int) -> jnp.ndarray:
    """int8 (3, 3, 64) conv1 kernel -> banded-Toeplitz weight matrix
    (4*(hb+4), (hb+2)*128) for the single in-kernel MXU dot.

    Row t*(hb+4) + l weights slab lane l of column-tap section t
    (u = _COL_TAPS[t]); output lane g*128 + half*64 + c is activation
    row g (conv1 row i*hb + g - 1), W-pair half (lo=pixel 2j,
    hi=pixel 2j+1), channel c. Nonzero iff l - g in {0, 1, 2}
    (= kernel row dy) and the tap column is valid for the half."""
    K = hb + 4
    G = hb + 2
    # static banded index structure (jit-safe: kq may be traced)
    lg = np.arange(K)[:, None] - np.arange(G)[None, :]   # (K, G) = l - g
    valid = (lg >= 0) & (lg <= 2)
    dy = np.clip(lg, 0, 2)                               # (K, G)
    halves = []
    for half in range(2):
        taps = []
        for u in _COL_TAPS:
            dx = u + 1 if half == 0 else u
            if 0 <= dx <= 2:
                tap = kq[dy, dx] * valid[..., None].astype(kq.dtype)
            else:
                tap = jnp.zeros((K, G, 64), kq.dtype)
            taps.append(tap)
        halves.append(jnp.stack(taps))                   # (4, K, G, 64)
    w = jnp.stack(halves, axis=3)                        # (4, K, G, 2, 64)
    return w.reshape(4 * K, G * 128)


def conv12_prepare(image: jnp.ndarray, hb: int):
    """(B, H, W, 1) float image in [0,1] -> banded int8 lane slab
    (B, nb, Wp, 4*(hb+4)).

    Band i, W-pair j, lane t*(hb+4) + l holds quantized image pixel
    (row i*hb + l - 2, column 2j + u_t) — the four column-tap sections
    are packed along the lane axis so conv1 is ONE (Wp, 4K) x (4K, N)
    MXU dot per band. Two halo rows above (conv2 needs conv1 row g-1,
    which needs image row g-2); out-of-image pixels are zero.
    """
    B, H, W, _ = image.shape
    nb = H // hb
    Wp = W // 2
    xq = jnp.clip(jnp.round(image[..., 0] * 127.0), -127, 127).astype(jnp.int8)
    # rows: -2..H+1 (top halo 2 deep); cols: -1..W
    xpad = jnp.pad(xq, ((0, 0), (2, 2), (1, 1)))
    # section t: image columns 2j + u_t  (xpad column index = image + 1)
    planes = [xpad[:, :, 1 + u::2][:, :, :Wp] for u in _COL_TAPS]
    x = jnp.stack(planes, axis=1)           # (B, 4, H+4, Wp)
    xt = x.transpose(0, 3, 1, 2)            # (B, Wp, 4, H+4)
    slab = jnp.stack(
        [xt[:, :, :, i * hb:i * hb + hb + 4] for i in range(nb)], axis=1)
    return slab.reshape(B, nb, Wp, 4 * (hb + 4))


def _kernel(a_ref, w1_ref, m1_ref, b1_ref, wc_ref, ws_ref,
            m2_ref, b2_ref, o_out, a1_scr, *,
            hb, Wp, nb, relu, out_dtype, pool):
    i = pl.program_id(1)
    # ---- conv1: one banded-Toeplitz MXU dot for the whole band ----
    a1_scr[:, 0:1] = jnp.zeros((hb + 2, 1, 128), jnp.int8)      # conv2 W halos
    a1_scr[:, Wp + 1:Wp + 2] = jnp.zeros((hb + 2, 1, 128), jnp.int8)
    acc = jnp.dot(a_ref[0, 0], w1_ref[...],
                  preferred_element_type=jnp.int32)  # (Wp, (hb+2)*128)
    for g in range(hb + 2):
        acc_g = acc[:, g * 128:(g + 1) * 128].astype(jnp.float32)
        row = _requant(acc_g, m1_ref[0], b1_ref[0], True, jnp.int8)
        # conv2's row halos beyond the image are zeros, not conv1(padding)
        if g == 0:
            row = jnp.where(i == 0, jnp.zeros_like(row), row)
        if g == hb + 1:
            row = jnp.where(i == nb - 1, jnp.zeros_like(row), row)
        a1_scr[g:g + 1, 1:1 + Wp] = row[None]

    # ---- conv2: W-pair-packed MXU dots over the VMEM activations ----
    C2 = 128
    half = jax.lax.broadcasted_iota(jnp.int32, (hb * Wp, C2), 1) < 64
    acc2 = jnp.zeros((hb * Wp, C2), jnp.int32)
    for dy in range(3):
        center = a1_scr[dy:dy + hb, 1:1 + Wp].reshape(hb * Wp, C2)
        left = a1_scr[dy:dy + hb, 0:Wp].reshape(hb * Wp, C2)
        right = a1_scr[dy:dy + hb, 2:2 + Wp].reshape(hb * Wp, C2)
        combined = jnp.where(half, right, left)
        acc2 += jnp.dot(center, wc_ref[dy], preferred_element_type=jnp.int32)
        acc2 += jnp.dot(combined, ws_ref[dy], preferred_element_type=jnp.int32)
    y = _affine(acc2.astype(jnp.float32), m2_ref[0], b2_ref[0], relu)
    y = y.reshape(hb, Wp, C2)
    if pool:  # pool the f32 values: max commutes with the monotone requant
        y = _pool_packed(y)
    o_out[0, 0] = _cast(y, out_dtype)


def conv12_fused(
    image: jnp.ndarray,
    k1: jnp.ndarray,
    mult1: jnp.ndarray,
    bias1: jnp.ndarray,
    w2: jnp.ndarray,
    mult2: jnp.ndarray,
    bias2: jnp.ndarray,
    *,
    relu: bool = True,
    out_dtype=jnp.int8,
    pool: bool = True,
    hb: int = 16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """image (B, H, W, 1) f32 -> pooled packed conv2 activations
    (B, H/2, W/4, 128) int8 (or unpooled (B, H, W/2, 128)).

    mult1/bias1: conv1 requantization over the *int8 image* accumulator
    — for BN-folded weights k1, conv bias b1 and conv1 output scale s1:
    ``mult1 = 1 / (127 * s1)``-style factors are the caller's job via
    ``serving``; here mult1/bias1 are applied as acc*mult1 + bias1.
    w2 (3, 3, 64, 64); mult2/bias2 per-channel conv2 requantization.
    """
    B, H, W, _ = image.shape
    if H % hb != 0:
        raise ValueError(
            f"conv12_fused: H={H} must be a multiple of the row band "
            f"hb={hb} (rows would be silently truncated otherwise)")
    if W % 2 != 0 or (pool and W % 4 != 0):
        raise ValueError(
            f"conv12_fused: W={W} must be even (W-pair packing)"
            + (" and divisible by 4 when pool=True" if pool else ""))
    Wp = W // 2
    nb = H // hb
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    slab_in = conv12_prepare(image, hb)
    kq1, s1w = quantize_conv1_weights(k1)
    w1 = build_conv1_banded_weights(kq1, hb)
    wc = jnp.stack([pack_weights_center(w2[dy]) for dy in range(3)])
    ws = jnp.stack([pack_weights_side(w2[dy]) for dy in range(3)])
    # fold the conv1 weight-dequant scale into the requant multiplier
    m1v = (jnp.asarray(mult1, jnp.float32) * s1w)
    m1 = jnp.concatenate([m1v, m1v]).reshape(1, 128)
    b1 = jnp.concatenate([bias1, bias1]).reshape(1, 128).astype(jnp.float32)
    m2 = jnp.concatenate([mult2, mult2]).reshape(1, 128).astype(jnp.float32)
    b2 = jnp.concatenate([bias2, bias2]).reshape(1, 128).astype(jnp.float32)

    ho, wo = (hb // 2, Wp // 2) if pool else (hb, Wp)
    kern = functools.partial(
        _kernel, hb=hb, Wp=Wp, nb=nb, relu=relu, out_dtype=out_dtype,
        pool=pool,
    )
    slab = pl.BlockSpec((1, 1, Wp, 4 * (hb + 4)), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[slab, full, full, full, full, full, full, full],
        out_specs=pl.BlockSpec((1, 1, ho, wo, 128),
                               lambda b, i: (b, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb, ho, wo, 128), out_dtype),
        scratch_shapes=[pltpu.VMEM((hb + 2, Wp + 2, 128), jnp.int8)],
        interpret=interpret,
    )(slab_in, w1, m1, b1, wc, ws, m2, b2)
    return out.reshape(B, nb * ho, wo, 128)
