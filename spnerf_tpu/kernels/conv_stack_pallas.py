"""Pallas conv kernels for the SuperPoint VGG stack (TPU serving path).

The reference stack (VGG_Backbone.py:40-70) is 8x [conv3x3-BN-ReLU] with
channels 64,64,64,64,128,128,128,128 plus two conv heads. XLA's conv
lowering measures 29-36 bf16 TFLOP/s on these shapes on a chip whose MXU
sustains ~190 int8 TOPs on large matmuls (benchmarks/micro_conv*.py), so
the serving path reformulates every 3x3 conv as row-band Pallas kernels
built from VMEM-resident (M, C)@(C, C') MXU dots:

* ``conv3x3_pallas`` — plain NHWC 3x3 conv for C_in >= 128: per row-band,
  9 accumulated dots over tap-shifted slices. 56-92 GMAC/s measured
  (int8, vs 95 peak).

* ``packed_conv3x3_pallas`` — the C=64 layers waste half the 128-lane
  datapath, so pairs of adjacent W-pixels are packed into one 128-lane
  row ("W-pair packing"). A 3x3/64ch conv becomes 3(dy) x 3(packed-dx)
  taps of 128x128 matrices that are half zeros; the two half-sparse side
  taps are merged into ONE dense matmul by assembling, with two lane
  rolls and a select, a combined input row [pair(j-1).hi | pair(j+1).lo]
  — 6 dense dots per conv instead of 9 half-empty ones (1.33x the real
  MACs instead of 2x).

Both flavors fuse bias + ReLU + requantization (int8 serving) or bias +
ReLU + bf16 cast, and take halo rows as separate inputs so the automatic
Pallas pipeline handles all HBM movement (no manual DMA).

Row bands: halo rows (the band's row above/below) are passed as separate
(B, nbands, 1, W, C) arrays sliced out in XLA, concatenated onto the
band inside the kernel — overlapping block reads are inexpressible with
block-index maps, and this costs only 2/Hb extra traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_limit(in_bytes: int, out_bytes: int, acc_bytes: int,
                const_bytes: int = 0) -> int:
    """Scoped-vmem budget for a banded conv pallas_call: pipelined
    in/out blocks are double-buffered, the f32 accumulator and constants
    are not; 2 MB headroom for Mosaic temporaries. Mosaic's default
    16 MB cap rejects the bf16 stack at 480x640 (measured: 16.43 MB
    needed at hb=32, Wp=320, C=128) — same failure class as the
    renderer's round-4 block-size limit (docs/PERF.md)."""
    need = 2 * (in_bytes + out_bytes) + 2 * acc_bytes + const_bytes \
        + 4 * 2**20
    return max(16 * 2**20, need)


def _pick_hb(H: int, W: int, Cout: int, cap: int = 48) -> int:
    """Largest divisor of H (<= cap) whose f32 accumulator fits ~5 MB of
    VMEM; the round-2 hb sweep (/tmp-era micro-bench, see PERF) showed
    throughput still rising slightly through hb=48."""
    budget = 5 * 1024 * 1024
    best = 1
    for hb in range(1, min(H, cap) + 1):
        if H % hb == 0 and hb * W * Cout * 4 <= budget:
            best = hb
    return best


def _band_inputs(x: jnp.ndarray, hb: int):
    """x (B, H, W, C) -> (core, tops, bots) where tops/bots hold each
    band's halo row (zero rows at the image border)."""
    B, H, W, C = x.shape
    nb = H // hb
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    tops = xp[:, 0:H:hb]          # row above band i (padded coords i*hb)
    bots = xp[:, hb + 1:: hb]     # row below band i
    bots = bots[:, :nb]
    return x.reshape(B, nb, hb, W, C), tops, bots


def _affine(acc_f32, mult, shift_bias, relu):
    y = acc_f32 * mult + shift_bias
    return jnp.maximum(y, 0.0) if relu else y


def _cast(y, out_dtype):
    if out_dtype == jnp.int8:
        y = jnp.clip(jnp.round(y), -127.0, 127.0)
    return y.astype(out_dtype)


def _requant(acc_f32, mult, shift_bias, relu, out_dtype):
    """acc * mult + bias, optional ReLU, saturate-cast."""
    return _cast(_affine(acc_f32, mult, shift_bias, relu), out_dtype)


def _pool_plain(y):
    """In-kernel 2x2 maxpool of a plain (hb, W, C) band -> (hb/2, W/2, C).

    Strided slices lower to gathers Mosaic rejects; pair selection is
    expressed as leading/sublane-dim SPLIT reshapes + max instead (the
    lane dim never changes, which is the Mosaic-legal direction)."""
    hb, W, C = y.shape
    y4 = y.reshape(hb // 2, 2, W, C)
    y = jnp.maximum(y4[:, 0], y4[:, 1])               # row pairs
    c4 = y.reshape(hb // 2, W // 2, 2, C)
    return jnp.maximum(c4[:, :, 0], c4[:, :, 1])      # column pairs


def _pool_packed(y):
    """In-kernel 2x2 maxpool of a W-pair-packed (hb, Wp, 2C) band ->
    packed (hb/2, Wp/2, 2C).

    Each packed row holds pixel pair (2j, 2j+1) in lane halves; pooling
    merges that pair into one output pixel, and output pair j' packs the
    pooled pixels of input pairs (2j', 2j'+1). The lane-half max uses a
    half-rotation (pltpu.roll; +C == -C at lane size 2C); pair selection
    uses sublane-split reshapes (strided slices would lower to gathers)."""
    hb, Wp, C2 = y.shape
    C = C2 // 2
    y4 = y.reshape(hb // 2, 2, Wp, C2)
    y = jnp.maximum(y4[:, 0], y4[:, 1])            # row pairs
    m = jnp.maximum(y, pltpu.roll(y, C, 2))        # lanes 0:C = pair max
    m4 = m.reshape(hb // 2, Wp // 2, 2, C2)
    m_even = m4[:, :, 0]
    m_odd = m4[:, :, 1]
    half = jax.lax.broadcasted_iota(jnp.int32, m_even.shape, 2) < C
    return jnp.where(half, m_even, pltpu.roll(m_odd, C, 2))


# --------------------------------------------------------------- plain conv


def _plain_kernel(x_ref, top_ref, bot_ref, w_ref, m_ref, b_ref, o_ref,
                  *, hb, W, Cin, Cout, relu, acc_dtype, out_dtype, pool):
    rows = jnp.concatenate(
        [top_ref[0], x_ref[0, 0], bot_ref[0]], axis=0
    )  # (hb + 2, W + 2, Cin) — W pre-padded by caller
    # hoist the 3 dx-shifted views: the misaligned sublane slice is a
    # whole-slab rotate-copy, so do it once per dx instead of once per
    # (dy, dx) tap (see tail_fused_pallas._tap_views)
    taps = (rows[:, 0:W, :], rows[:, 1:W + 1, :], rows[:, 2:W + 2, :])
    acc = jnp.zeros((hb * W, Cout), acc_dtype)
    for dy in range(3):
        for dx in range(3):
            xs = taps[dx][dy:dy + hb]
            acc += jnp.dot(xs.reshape(hb * W, Cin), w_ref[dy * 3 + dx],
                           preferred_element_type=acc_dtype)
    y = _affine(acc.astype(jnp.float32), m_ref[0], b_ref[0], relu)
    y = y.reshape(hb, W, Cout)
    if pool:  # pool the f32 values: max commutes with the monotone requant
        y = _pool_plain(y)
    o_ref[0, 0] = _cast(y, out_dtype)


def conv3x3_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    mult: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    relu: bool = True,
    out_dtype=jnp.int8,
    hb: int | None = None,
    pool: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """3x3 SAME conv: x (B, H, W, Cin), w (3, 3, Cin, Cout) -> (B, H, W, Cout).

    ``mult``/``bias`` are per-output-channel (Cout,) f32: the output is
    ``cast(relu(acc * mult + bias))`` — for int8 serving mult carries
    s_in*s_w/s_out and bias the BN-folded bias over s_out; for bf16,
    mult=1 and bias is the conv bias. ``pool=True`` fuses the reference
    stack's 2x2 maxpool into the epilogue -> (B, H/2, W/2, Cout),
    saving the full-size activation's HBM round trip.
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    hb = hb or _pick_hb(H, W, Cout)
    if pool and hb % 2:
        hb = 2 if H % 2 == 0 else hb
    if H % hb != 0 or (pool and (hb % 2 or W % 2)):
        raise ValueError(
            f"conv3x3_pallas: H={H} not divisible by band hb={hb}"
            + (f" (pool=True also needs even hb/W, W={W})" if pool else ""))
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nb = H // hb
    xw = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))  # W halo inline
    core, tops, bots = _band_inputs(xw, hb)
    acc_dtype = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    kern = functools.partial(
        _plain_kernel, hb=hb, W=W, Cin=Cin, Cout=Cout, relu=relu,
        acc_dtype=acc_dtype, out_dtype=out_dtype, pool=pool,
    )
    ho, wo = (hb // 2, W // 2) if pool else (hb, W)
    out = pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, hb, W + 2, Cin), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W + 2, Cin), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W + 2, Cin), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ho, wo, Cout), lambda b, i: (b, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb, ho, wo, Cout), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                (hb + 2) * (W + 2) * Cin * x.dtype.itemsize,
                ho * wo * Cout * jnp.dtype(out_dtype).itemsize,
                hb * (W + 2) * Cout * 4,
                9 * Cin * Cout * w.dtype.itemsize)),
        interpret=interpret,
    )(core, tops, bots, w.reshape(9, Cin, Cout),
      mult.reshape(1, Cout).astype(jnp.float32),
      bias.reshape(1, Cout).astype(jnp.float32))
    return out.reshape(B, nb * ho, wo, Cout)


# -------------------------------------------------------------- packed conv


def pack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W//2, 2C): adjacent W-pixel pairs share a row."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def unpack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    B, H, Wp, C2 = x.shape
    return x.reshape(B, H, Wp * 2, C2 // 2)


def pack_weights_center(w_dy: jnp.ndarray) -> jnp.ndarray:
    """dy-slice (3, C, Cout) -> dense 2Cx2Cout center-tap matrix:
    out pair j reads input pair j: lo->lo:W0, hi->lo:W+1, lo->hi:W-1, hi->hi:W0."""
    wm1, w0, wp1 = w_dy[0], w_dy[1], w_dy[2]
    C, Co = w0.shape
    blk = jnp.zeros((2 * C, 2 * Co), w0.dtype)
    blk = blk.at[:C, :Co].set(w0)
    blk = blk.at[C:, :Co].set(wp1)
    blk = blk.at[:C, Co:].set(wm1)
    blk = blk.at[C:, Co:].set(w0)
    return blk


def pack_weights_side(w_dy: jnp.ndarray) -> jnp.ndarray:
    """dy-slice -> dense side-tap matrix for the kernel's combined row
    (lanes 0:C = pair(j+1).lo, lanes C: = pair(j-1).hi): the lo half
    routes to out.hi with W+1, the hi half to out.lo with W-1. The lane
    half-swap a shuffle would do is baked into this row layout."""
    wm1, _, wp1 = w_dy[0], w_dy[1], w_dy[2]
    C, Co = wm1.shape
    blk = jnp.zeros((2 * C, 2 * Co), wm1.dtype)
    blk = blk.at[:C, Co:].set(wp1)   # pair(j+1).lo -> out.hi
    blk = blk.at[C:, :Co].set(wm1)   # pair(j-1).hi -> out.lo
    return blk


def _packed_kernel(x_ref, top_ref, bot_ref, wc_ref, ws_ref, m_ref, b_ref,
                   o_ref, *, hb, Wp, C2, Co2, relu, acc_dtype, out_dtype,
                   pool):
    # x block is (1, 1, hb(+halos), Wp + 2, C2): Wp pre-padded with one
    # zero PAIR on each side.
    rows = jnp.concatenate(
        [top_ref[0], x_ref[0, 0], bot_ref[0]], axis=0
    )  # (hb + 2, Wp + 2, C2)
    C = C2 // 2
    half = jax.lax.broadcasted_iota(jnp.int32, (hb * Wp, C2), 1) < C
    acc = jnp.zeros((hb * Wp, Co2), acc_dtype)
    for dy in range(3):
        center = rows[dy:dy + hb, 1:1 + Wp, :].reshape(hb * Wp, C2)
        left = rows[dy:dy + hb, 0:Wp, :].reshape(hb * Wp, C2)
        right = rows[dy:dy + hb, 2:2 + Wp, :].reshape(hb * Wp, C2)
        # combined side row: lanes 0:C carry pair(j+1).lo, lanes C: carry
        # pair(j-1).hi — no lane shuffle needed, the half-swap that would
        # route each half to its output is folded into ws_ref's rows
        combined = jnp.where(half, right, left)
        acc += jnp.dot(center, wc_ref[dy], preferred_element_type=acc_dtype)
        acc += jnp.dot(combined, ws_ref[dy], preferred_element_type=acc_dtype)
    y = _affine(acc.astype(jnp.float32), m_ref[0], b_ref[0], relu)
    y = y.reshape(hb, Wp, Co2)
    if pool:  # pool the f32 values: max commutes with the monotone requant
        y = _pool_packed(y)
    o_ref[0, 0] = _cast(y, out_dtype)


def packed_conv3x3_pallas(
    xp: jnp.ndarray,
    w: jnp.ndarray,
    mult: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    relu: bool = True,
    out_dtype=jnp.int8,
    hb: int | None = None,
    pool: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """3x3 SAME conv on W-pair-packed activations.

    xp: (B, H, Wp, 2C) packed pairs (``pack_pairs`` of (B, H, 2Wp, C)).
    w: (3, 3, C, Cout) ordinary conv weights.
    Returns packed output (B, H, Wp, 2*Cout); with ``pool=True`` the
    2x2 maxpool is fused into the epilogue -> packed (B, H/2, Wp/2,
    2*Cout), never writing the pre-pool activation to HBM.
    """
    B, H, Wp, C2 = xp.shape
    C = C2 // 2
    Cout = w.shape[-1]
    Co2 = 2 * Cout
    hb = hb or _pick_hb(H, Wp, Co2)
    if pool and hb % 2:
        hb = 2 if H % 2 == 0 else hb
    if H % hb != 0 or (pool and (hb % 2 or Wp % 2)):
        raise ValueError(
            f"packed_conv3x3_pallas: H={H} not divisible by band hb={hb}"
            + (f" (pool=True also needs even hb/Wp, Wp={Wp})" if pool else ""))
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nb = H // hb
    wc = jnp.stack([pack_weights_center(w[dy]) for dy in range(3)])
    ws = jnp.stack([pack_weights_side(w[dy]) for dy in range(3)])
    xw = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 0)))
    core, tops, bots = _band_inputs(xw, hb)
    acc_dtype = jnp.int32 if xp.dtype == jnp.int8 else jnp.float32
    m2 = jnp.concatenate([mult, mult]).reshape(1, Co2).astype(jnp.float32)
    b2 = jnp.concatenate([bias, bias]).reshape(1, Co2).astype(jnp.float32)
    kern = functools.partial(
        _packed_kernel, hb=hb, Wp=Wp, C2=C2, Co2=Co2, relu=relu,
        acc_dtype=acc_dtype, out_dtype=out_dtype, pool=pool,
    )
    ho, wo = (hb // 2, Wp // 2) if pool else (hb, Wp)
    out = pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, hb, Wp + 2, C2), lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Wp + 2, C2), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Wp + 2, C2), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ho, wo, Co2), lambda b, i: (b, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb, ho, wo, Co2), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                (hb + 2) * (Wp + 2) * C2 * xp.dtype.itemsize,
                ho * wo * Co2 * jnp.dtype(out_dtype).itemsize,
                hb * (Wp + 2) * Co2 * 4,
                (wc.size + ws.size) * wc.dtype.itemsize)),
        interpret=interpret,
    )(core, tops, bots, wc, ws, m2, b2)
    return out.reshape(B, nb * ho, wo, Co2)


# ------------------------------------------------------------- 1x1 convs


def _dot_kernel(x_ref, w_ref, m_ref, b_ref, o_ref,
                *, rows, Cin, Cout, relu, acc_dtype, out_dtype):
    acc = jnp.dot(x_ref[0].reshape(rows, Cin), w_ref[:],
                  preferred_element_type=acc_dtype)
    y = _requant(acc.astype(jnp.float32), m_ref[0], b_ref[0], relu, out_dtype)
    o_ref[0] = y.reshape(*o_ref.shape[1:])


def dot_bias_act_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    mult: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    relu: bool = False,
    out_dtype=jnp.bfloat16,
    rows_per_block: int = 4096,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Per-pixel (..., Cin) @ (Cin, Cout) + bias (+ReLU) — the 1x1 convs
    (heads convPb/convDb, reference heads.py:13-15,55) and the conv1
    patch contraction. Leading dims are flattened and row-blocked."""
    lead = x.shape[:-1]
    Cin = x.shape[-1]
    Cout = w.shape[-1]
    M = int(np.prod(lead))
    rb = min(rows_per_block, M)
    while M % rb:
        rb //= 2
    nb = M // rb
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    acc_dtype = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    kern = functools.partial(
        _dot_kernel, rows=rb, Cin=Cin, Cout=Cout, relu=relu,
        acc_dtype=acc_dtype, out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, rb, Cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, Cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, rb, Cout), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                rb * Cin * x.dtype.itemsize,
                rb * Cout * jnp.dtype(out_dtype).itemsize,
                rb * Cout * 4,
                Cin * Cout * w.dtype.itemsize)),
        interpret=interpret,
    )(x.reshape(nb, rb, Cin), w,
      mult.reshape(1, Cout).astype(jnp.float32),
      bias.reshape(1, Cout).astype(jnp.float32))
    return out.reshape(*lead, Cout)


# ------------------------------------------------------------------ conv1


def conv1_patches(x: jnp.ndarray) -> jnp.ndarray:
    """Grayscale (B, H, W, 1) -> W-pair conv1 patches (B, H, W//2, 18).

    Channel t = dy*6 + dj*2 + c reads pixel (h-1+dy, 2(j-1+dj)+c): the
    3x3 receptive fields of both pixels of output pair j live inside
    this 3-row x 3-pair window. The C_in=1 first conv is pathological
    for both XLA's conv and an (M, 9) im2col (PERF round 1), so it
    becomes one lane-aligned (M, 18)@(18, 128) contraction instead.
    """
    B, H, W, _ = x.shape
    pairs = x.reshape(B, H, W // 2, 2)
    p = jnp.pad(pairs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        p[:, dy:dy + H, dj:dj + W // 2, :]
        for dy in range(3)
        for dj in range(3)
    ]
    return jnp.concatenate(taps, axis=-1)  # (B, H, W//2, 18)


def pack_conv1_weights(w1: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 1, Cout) conv1 weights -> (18, 2*Cout) patch matrix matching
    ``conv1_patches`` channel order (W-pair-packed output)."""
    Cout = w1.shape[-1]
    out = jnp.zeros((18, 2 * Cout), w1.dtype)
    for dy in range(3):
        for dj in range(3):
            for c in range(2):
                row = dy * 6 + dj * 2 + c
                col_px = 2 * (dj - 1) + c  # pixel offset vs pair start 2j
                # out.lo = pixel 2j needs offsets -1..1; out.hi = 2j+1: 0..2
                if -1 <= col_px <= 1:
                    out = out.at[row, :Cout].set(w1[dy, col_px + 1, 0])
                if 0 <= col_px <= 2:
                    out = out.at[row, Cout:].set(w1[dy, col_px - 1 + 1, 0])
    return out


def conv1_packed(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    mult: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    out_dtype=jnp.int8,
) -> jnp.ndarray:
    """First VGG block on grayscale input, producing W-pair-packed
    activations (B, H, W//2, 2*Cout) directly."""
    Cout = w1.shape[-1]
    patches = conv1_patches(x)
    wp = pack_conv1_weights(w1)
    m2 = jnp.concatenate([mult, mult])
    b2 = jnp.concatenate([bias, bias])
    return dot_bias_act_pallas(patches, wp, m2, b2, relu=True,
                               out_dtype=out_dtype)


# ------------------------------------------------------------ pooling glue


def maxpool2x2_packed(xp: jnp.ndarray) -> jnp.ndarray:
    """2x2 max pool on W-pair-packed activations, output packed again.

    (B, H, Wp, 2C): pairs (2j, 2j+1); pooling merges px (2j, 2j+1) ->
    one output px, so output pair j' packs pooled px from input pairs
    (2j', 2j'+1). Pure XLA relayout — cheap next to the conv kernels.
    """
    B, H, Wp, C2 = xp.shape
    C = C2 // 2
    x = xp.reshape(B, H, Wp, 2, C)
    wmax = jnp.max(x, axis=3)                       # (B, H, Wp, C)
    hmax = jnp.max(wmax.reshape(B, H // 2, 2, Wp, C), axis=2)
    return hmax.reshape(B, H // 2, Wp // 2, 2 * C)  # repack adjacent pairs
