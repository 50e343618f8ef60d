"""Fused mid-stack kernel for SuperPoint serving: W-pair-packed double
3x3 conv (blocks 3-4 and blocks 5-6 each collapse into ONE kernel).

After the conv12 entry kernel (blocks 1-2) and the fused tail (blocks
7-8 + heads), the serving stack still ran four separate kernels for the
mid blocks (reference VGG_Backbone.py:47-58: conv3/conv4 at half
resolution, conv5/conv6 at quarter resolution, 2x2 maxpools after
conv4/conv6). Each pair writes a multi-MB intermediate activation to
HBM only for the next kernel to read it straight back, and pays a
second kernel dispatch.

``double_packed_conv3x3_pallas`` chains two packed 3x3 convs (same
W-pair packing and 6-dense-dot tap scheme as
kernels/conv_stack_pallas.packed_conv3x3_pallas) inside one row-band
kernel: bands carry TWO halo rows per side, conv_a computes ``hb + 2``
rows into a VMEM scratch (requantized, never touching HBM), conv_b
consumes them for ``hb`` output rows, and the stack's 2x2 maxpool fuses
into the epilogue. The one extra conv_a row per band side is the
classic halo recompute — 2/hb redundant work (~7% at hb=30) traded for
an entire HBM round trip of the mid activation.

SAME-padding correctness at image borders: conv_a rows computed at
global rows -1 and H (from zero halo input) are NOT zero (bias + ReLU),
so the kernel explicitly zeroes those scratch rows on the first/last
band — conv_b must see true zero padding.

Numerics are bit-identical to the chained per-layer kernels: identical
f32 affine (requant) between the convs, identical pool-before-cast
epilogue (max commutes with the monotone cast).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spnerf_tpu.kernels.conv_stack_pallas import (
    _affine,
    _cast,
    _pool_packed,
    pack_weights_center,
    pack_weights_side,
)


def _pick_hb(H: int, Wp: int, Cm2: int, Co2: int, pool: bool,
             cap: int = 48) -> int:
    """Largest divisor of H (<= cap, even if pooling) whose two i32/f32
    accumulators each fit ~4 MB of VMEM."""
    budget = 4 * 1024 * 1024
    best = 1
    for hb in range(1, min(H, cap) + 1):
        if H % hb:
            continue
        if pool and hb % 2:
            continue
        if (hb + 2) * Wp * Cm2 * 4 > budget or hb * Wp * Co2 * 4 > budget:
            continue
        best = hb
    return best


def _band_inputs2(x: jnp.ndarray, hb: int):
    """x (B, H, W, C) -> (core, top2, bot2): each band's two halo rows
    above/below (zero rows outside the image)."""
    B, H, W, C = x.shape
    nb = H // hb
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
    top2 = jnp.stack([xp[:, i * hb:i * hb + 2] for i in range(nb)], 1)
    bot2 = jnp.stack(
        [xp[:, i * hb + hb + 2:i * hb + hb + 4] for i in range(nb)], 1)
    return x.reshape(B, nb, hb, W, C), top2, bot2


def _packed_taps(rows, wc_ref, ws_ref, r0, hcount, Wp, C2, Co2, acc_dtype):
    """Packed-conv accumulation over ``hcount`` rows starting at ``r0``
    of a W-pair-padded (R, Wp + 2, C2) row array -> (hcount*Wp, Co2)."""
    C = C2 // 2
    half = jax.lax.broadcasted_iota(jnp.int32, (hcount * Wp, C2), 1) < C
    acc = jnp.zeros((hcount * Wp, Co2), acc_dtype)
    for dy in range(3):
        center = rows[r0 + dy:r0 + dy + hcount, 1:1 + Wp, :].reshape(
            hcount * Wp, C2)
        left = rows[r0 + dy:r0 + dy + hcount, 0:Wp, :].reshape(
            hcount * Wp, C2)
        right = rows[r0 + dy:r0 + dy + hcount, 2:2 + Wp, :].reshape(
            hcount * Wp, C2)
        combined = jnp.where(half, right, left)
        acc += jnp.dot(center, wc_ref[dy], preferred_element_type=acc_dtype)
        acc += jnp.dot(combined, ws_ref[dy], preferred_element_type=acc_dtype)
    return acc


def _dblpk_kernel(core_ref, top2_ref, bot2_ref,
                  wca_ref, wsa_ref, ma_ref, ba_ref,
                  wcb_ref, wsb_ref, mb_ref, bb_ref,
                  o_ref, mid_scr, *, hb, Wp, C2, Cm2, Co2, nb,
                  relu_b, acc_dtype, out_dtype, pool):
    rows = jnp.concatenate(
        [top2_ref[0, 0], core_ref[0, 0], bot2_ref[0, 0]], axis=0
    )  # (hb + 4, Wp + 2, C2) — W pair-padded by the caller
    # conv_a: hb + 2 mid rows (band rows plus one halo row per side);
    # local mid row m corresponds to global row i*hb - 1 + m
    acc = _packed_taps(rows, wca_ref, wsa_ref, 0, hb + 2, Wp, C2, Cm2,
                       acc_dtype)
    ya = _affine(acc.astype(jnp.float32), ma_ref[0], ba_ref[0], True)
    # rows -1 and H lie outside the image: conv_b needs true zeros there,
    # not conv_a(zero input) = relu(bias)
    i = pl.program_id(1)
    flat = jax.lax.broadcasted_iota(jnp.int32, ya.shape, 0)
    outside = jnp.logical_or(
        jnp.logical_and(i == 0, flat < Wp),
        jnp.logical_and(i == nb - 1, flat >= (hb + 1) * Wp))
    ya = jnp.where(outside, 0.0, ya)
    # scratch W-pair borders are zero; interior holds the requantized mid
    mid_scr[:, 0:1] = jnp.zeros((hb + 2, 1, Cm2), mid_scr.dtype)
    mid_scr[:, Wp + 1:Wp + 2] = jnp.zeros((hb + 2, 1, Cm2), mid_scr.dtype)
    mid_scr[:, 1:1 + Wp] = _cast(ya, mid_scr.dtype).reshape(hb + 2, Wp, Cm2)
    # conv_b: hb output rows from mid rows t..t+2
    acc2 = _packed_taps(mid_scr, wcb_ref, wsb_ref, 0, hb, Wp, Cm2, Co2,
                        acc_dtype)
    yb = _affine(acc2.astype(jnp.float32), mb_ref[0], bb_ref[0], relu_b)
    yb = yb.reshape(hb, Wp, Co2)
    if pool:  # pool the f32 values: max commutes with the monotone requant
        yb = _pool_packed(yb)
    o_ref[0, 0] = _cast(yb, out_dtype)


def double_packed_conv3x3_pallas(
    xp: jnp.ndarray,
    w_a: jnp.ndarray,
    mult_a: jnp.ndarray,
    bias_a: jnp.ndarray,
    w_b: jnp.ndarray,
    mult_b: jnp.ndarray,
    bias_b: jnp.ndarray,
    *,
    relu: bool = True,
    out_dtype=jnp.int8,
    hb: int | None = None,
    pool: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Two chained 3x3 SAME convs on W-pair-packed activations in one
    kernel: ``conv_b(relu(conv_a(xp)))``, optional fused 2x2 maxpool.

    xp: (B, H, Wp, 2*Ca) packed pairs; w_a (3, 3, Ca, Cm); w_b
    (3, 3, Cm, Co). The conv_a activation is requantized with
    ``mult_a``/``bias_a`` (ReLU always on, as between VGG blocks) into a
    VMEM scratch of xp.dtype and never written to HBM. Returns packed
    (B, H, Wp, 2*Co), or (B, H/2, Wp/2, 2*Co) with ``pool=True``.
    """
    B, H, Wp, C2 = xp.shape
    Cm = w_a.shape[-1]
    Co = w_b.shape[-1]
    Cm2, Co2 = 2 * Cm, 2 * Co
    if w_b.shape[2] != Cm:
        raise ValueError(
            f"double_packed_conv3x3_pallas: w_b C_in {w_b.shape[2]} != "
            f"w_a C_out {Cm}")
    hb = hb or _pick_hb(H, Wp, Cm2, Co2, pool)
    if H % hb != 0 or (pool and (hb % 2 or Wp % 2)):
        raise ValueError(
            f"double_packed_conv3x3_pallas: H={H} not divisible by band "
            f"hb={hb}" + (f" (pool=True also needs even hb/Wp, Wp={Wp})"
                          if pool else ""))
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nb = H // hb
    wca = jnp.stack([pack_weights_center(w_a[dy]) for dy in range(3)])
    wsa = jnp.stack([pack_weights_side(w_a[dy]) for dy in range(3)])
    wcb = jnp.stack([pack_weights_center(w_b[dy]) for dy in range(3)])
    wsb = jnp.stack([pack_weights_side(w_b[dy]) for dy in range(3)])
    xw = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 0)))
    core, top2, bot2 = _band_inputs2(xw, hb)
    acc_dtype = jnp.int32 if xp.dtype == jnp.int8 else jnp.float32
    ma = jnp.concatenate([mult_a, mult_a]).reshape(1, Cm2).astype(jnp.float32)
    ba = jnp.concatenate([bias_a, bias_a]).reshape(1, Cm2).astype(jnp.float32)
    mb = jnp.concatenate([mult_b, mult_b]).reshape(1, Co2).astype(jnp.float32)
    bb = jnp.concatenate([bias_b, bias_b]).reshape(1, Co2).astype(jnp.float32)
    kern = functools.partial(
        _dblpk_kernel, hb=hb, Wp=Wp, C2=C2, Cm2=Cm2, Co2=Co2, nb=nb,
        relu_b=relu, acc_dtype=acc_dtype, out_dtype=out_dtype, pool=pool,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    ho, wo = (hb // 2, Wp // 2) if pool else (hb, Wp)
    out = pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, hb, Wp + 2, C2), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, Wp + 2, C2), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, Wp + 2, C2), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full, full, full, full, full, full, full,
        ],
        out_specs=pl.BlockSpec((1, 1, ho, wo, Co2),
                               lambda b, i: (b, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb, ho, wo, Co2), out_dtype),
        scratch_shapes=[pltpu.VMEM((hb + 2, Wp + 2, Cm2), xp.dtype)],
        interpret=interpret,
    )(core, top2, bot2, wca, wsa, ma, ba, wcb, wsb, mb, bb)
    return out.reshape(B, nb * ho, wo, Co2)
