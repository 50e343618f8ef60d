"""Fused tail kernels for SuperPoint serving: blocks 7-8 + heads.

At the stack tail (60x80 cells) the per-layer MXU work is tiny
(~0.7-1.4 GMAC per image per conv) while the round-2 pipeline paid a
full kernel dispatch + an HBM round trip of every intermediate
activation for each of the six tail layers (block7, block8, convPa,
convPb, convDa, convDb — reference VGG_Backbone.py:60-70, heads.py:6-68).
Measured round-2 cost: ~14 ms of the 44.5 ms batch-64 budget for ~0.6 ms
of int8 MXU speed-of-light compute.

Two kernels replace them, each processing ONE whole image per grid step
(the entire 60x80 tail fits VMEM comfortably):

* ``double_conv3x3_pallas`` — two chained 3x3 convs (block7 -> block8):
  the intermediate activation lives in a VMEM scratch with zeroed SAME
  borders and never touches HBM.

* ``head_pallas`` — one head: 3x3 conv (convPa/convDa) -> fused
  requantization -> 1x1 dot (convPb/convDb) -> optional masked softmax
  over the 65 logit lanes (reference heads.py:25-29), emitting either
  bf16 logits/descriptors or ready-to-rank cell probabilities with the
  dustbin dropped and lanes 64.. zeroed. Fusing the softmax removes the
  separate full-tensor softmax pass in front of ``approx_max_k``
  (ops/fast_inference.detect_from_probs_padded consumes the padded
  layout directly — no [..., :64] relayout either).

Both kernels fuse bias + ReLU + requantization exactly like
kernels/conv_stack_pallas.py (same ``mult``/``bias`` contracts), so the
serving graph's int8 numerics are bit-identical to the unfused chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spnerf_tpu.kernels.conv_stack_pallas import _affine, _cast


def _pick_hc(H: int, W: int, Cout: int, budget: int = 2 * 1024 * 1024) -> int:
    """Largest divisor of H whose f32/i32 accumulator fits ``budget``."""
    best = 1
    for hc in range(1, H + 1):
        if H % hc == 0 and hc * W * Cout * 4 <= budget:
            best = hc
    return best


def _tap_views(rows, W):
    """The three dx-shifted views of a border-padded (H+2, W+2, Cin)
    array, hoisted ONCE per conv. dx slices offset the SUBLANE axis
    (misaligned by 1), which Mosaic lowers to a sublane-rotate copy of
    the whole slab — doing it per (chunk, tap) made 9+ such copies per
    conv and held the 60x80 tail stages to ~27 TOP/s (half the rate of
    the large-conv stages). The dy/chunk slices left on the leading
    (untiled) axis are register selects, not copies."""
    return (rows[:, 0:W, :], rows[:, 1:W + 1, :], rows[:, 2:W + 2, :])


def _conv_chunk(taps, w_ref, r0, hc, W, Cin, Cout, acc_dtype):
    """9-tap accumulated dot over rows [r0, r0+hc) of the hoisted tap
    views -> (hc*W, Cout) accumulator."""
    acc = jnp.zeros((hc * W, Cout), acc_dtype)
    for dy in range(3):
        for dx in range(3):
            xs = taps[dx][r0 + dy:r0 + dy + hc]
            acc += jnp.dot(xs.reshape(hc * W, Cin), w_ref[dy * 3 + dx],
                           preferred_element_type=acc_dtype)
    return acc


def _dbl_kernel(x_ref, wa_ref, ma_ref, ba_ref, wb_ref, mb_ref, bb_ref,
                o_ref, a_scr, *, H, W, Cin, Cmid, Cout, hca, hcb,
                relu, acc_dtype, out_dtype):
    zrow = jnp.zeros((1, W + 2, Cin), x_ref.dtype)
    rows = jnp.concatenate([zrow, x_ref[0], zrow], axis=0)  # (H+2, W+2, Cin)
    taps = _tap_views(rows, W)
    # zero the scratch SAME borders once; chunk stores fill the interior
    a_scr[0:1] = jnp.zeros((1, W + 2, Cmid), a_scr.dtype)
    a_scr[H + 1:H + 2] = jnp.zeros((1, W + 2, Cmid), a_scr.dtype)
    a_scr[:, 0:1] = jnp.zeros((H + 2, 1, Cmid), a_scr.dtype)
    a_scr[:, W + 1:W + 2] = jnp.zeros((H + 2, 1, Cmid), a_scr.dtype)
    for r0 in range(0, H, hca):
        acc = _conv_chunk(taps, wa_ref, r0, hca, W, Cin, Cmid, acc_dtype)
        y = _affine(acc.astype(jnp.float32), ma_ref[0], ba_ref[0], True)
        a_scr[1 + r0:1 + r0 + hca, 1:1 + W] = _cast(y, a_scr.dtype).reshape(
            hca, W, Cmid)
    taps_b = _tap_views(a_scr[...], W)
    for r0 in range(0, H, hcb):
        acc = _conv_chunk(taps_b, wb_ref, r0, hcb, W, Cmid, Cout, acc_dtype)
        y = _affine(acc.astype(jnp.float32), mb_ref[0], bb_ref[0], relu)
        o_ref[0, r0:r0 + hcb] = _cast(y, out_dtype).reshape(hcb, W, Cout)


def double_conv3x3_pallas(
    x: jnp.ndarray,
    w_a: jnp.ndarray,
    mult_a: jnp.ndarray,
    bias_a: jnp.ndarray,
    w_b: jnp.ndarray,
    mult_b: jnp.ndarray,
    bias_b: jnp.ndarray,
    *,
    relu: bool = True,
    out_dtype=jnp.int8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Two chained 3x3 SAME convs (conv_b(relu(conv_a(x)))) in one kernel.

    x (B, H, W, Cin); w_a (3, 3, Cin, Cmid); w_b (3, 3, Cmid, Cout).
    The conv_a activation is requantized with ``mult_a``/``bias_a`` (ReLU
    always on, as between VGG blocks) into a VMEM scratch of x.dtype and
    never written to HBM. Whole-image blocks: intended for the 60x80
    tail (blocks 7-8); H*W*max(C)*4 must fit a few MB of VMEM.
    """
    B, H, W, Cin = x.shape
    Cmid = w_a.shape[-1]
    Cout = w_b.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    hca = _pick_hc(H, W, Cmid)
    hcb = _pick_hc(H, W, Cout)
    acc_dtype = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    xw = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    kern = functools.partial(
        _dbl_kernel, H=H, W=W, Cin=Cin, Cmid=Cmid, Cout=Cout,
        hca=hca, hcb=hcb, relu=relu, acc_dtype=acc_dtype,
        out_dtype=out_dtype,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W + 2, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full, full, full, full, full,
        ],
        out_specs=pl.BlockSpec((1, H, W, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, Cmid), x.dtype)],
        interpret=interpret,
    )(xw, w_a.reshape(9, Cin, Cmid),
      mult_a.reshape(1, Cmid).astype(jnp.float32),
      bias_a.reshape(1, Cmid).astype(jnp.float32),
      w_b.reshape(9, Cmid, Cout),
      mult_b.reshape(1, Cout).astype(jnp.float32),
      bias_b.reshape(1, Cout).astype(jnp.float32))


def _head_kernel(x_ref, w3_ref, m3_ref, b3_ref, w1_ref, m1_ref, b1_ref,
                 o_ref, *, H, W, Cin, Cmid, Cout, hc, softmax_lanes,
                 mid_dtype, acc_dtype, out_dtype):
    zrow = jnp.zeros((1, W + 2, Cin), x_ref.dtype)
    rows = jnp.concatenate([zrow, x_ref[0], zrow], axis=0)
    taps = _tap_views(rows, W)
    for r0 in range(0, H, hc):
        acc = _conv_chunk(taps, w3_ref, r0, hc, W, Cin, Cmid, acc_dtype)
        y = _affine(acc.astype(jnp.float32), m3_ref[0], b3_ref[0], True)
        mid = _cast(y, mid_dtype)
        acc1 = jnp.dot(mid, w1_ref[:],
                       preferred_element_type=acc_dtype)
        out = _affine(acc1.astype(jnp.float32), m1_ref[0], b1_ref[0], False)
        if softmax_lanes is not None:
            lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
            masked = jnp.where(lane < softmax_lanes, out, -jnp.inf)
            m = jnp.max(masked, axis=1, keepdims=True)
            e = jnp.exp(masked - m)          # pad lanes -> exp(-inf) = 0
            denom = jnp.sum(e, axis=1, keepdims=True)  # incl. dustbin
            out = jnp.where(lane < softmax_lanes - 1, e / denom, 0.0)
        o_ref[0, r0:r0 + hc] = _cast(out, out_dtype).reshape(hc, W, Cout)


def head_pallas(
    x: jnp.ndarray,
    w3: jnp.ndarray,
    mult3: jnp.ndarray,
    bias3: jnp.ndarray,
    w1: jnp.ndarray,
    mult1: jnp.ndarray,
    bias1: jnp.ndarray,
    *,
    softmax_lanes: int | None = None,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One SuperPoint head in one kernel: 3x3 conv -> requant -> 1x1 dot.

    x (B, H, W, Cin); w3 (3, 3, Cin, Cmid); w1 (Cmid, Cout) with Cout a
    lane multiple (ops/serving._head_wmb pads convPb's 65 logits to 128).
    ``mult3``/``bias3`` requantize the conv into x.dtype (the serving
    int8 chain); ``mult1``/``bias1`` dequantize the dot to float.

    softmax_lanes=N applies the reference's detector decode in-kernel:
    softmax over lanes [0, N) of the dot output (N = 65 = 64 cells +
    dustbin), drops the dustbin, and zeroes lanes >= N-1 — the result
    feeds ``detect_from_probs_padded`` with no extra passes. The
    softmax runs in f32; only the store rounds to ``out_dtype``.
    """
    B, H, W, Cin = x.shape
    Cmid = w3.shape[-1]
    Cout = w1.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    hc = _pick_hc(H, W, Cmid)
    acc_dtype = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    xw = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    kern = functools.partial(
        _head_kernel, H=H, W=W, Cin=Cin, Cmid=Cmid, Cout=Cout, hc=hc,
        softmax_lanes=softmax_lanes, mid_dtype=x.dtype,
        acc_dtype=acc_dtype, out_dtype=out_dtype,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W + 2, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full, full, full, full, full,
        ],
        out_specs=pl.BlockSpec((1, H, W, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), out_dtype),
        interpret=interpret,
    )(xw, w3.reshape(9, Cin, Cmid),
      mult3.reshape(1, Cmid).astype(jnp.float32),
      bias3.reshape(1, Cmid).astype(jnp.float32),
      w1,
      mult1.reshape(1, Cout).astype(jnp.float32),
      bias1.reshape(1, Cout).astype(jnp.float32))
