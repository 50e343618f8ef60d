"""Fully fused Pallas volume-render kernel for the tiny NeRF field.

The classic renderer is FLOP-bound (~250 MFLOP/ray) and the light MLP
presets are overhead-bound in XLA (docs/PERF.md): dozens of small ops
per sample dominate. This kernel renders a block of rays END TO END in
one pallas_call — per-sample positional encoding, the MLP, and alpha
compositing all stay in VMEM registers.

Mosaic-safe by construction: every tensor is (R, 128) and every matmul
is (R, 128) @ (128, 128); there are no narrow slices, gathers, concats
or lane-splitting reshapes (the limitations that blocked the conv
kernel, see PERF notes):

- the frequency expansion matrix E2 (128-col, pi/2 phase folded into a
  bias row) is applied OUTSIDE the kernel to rays (one tiny matmul), so
  per-sample encoding inside is ``sin(oE + t * dE)``;
- sampling is shared-jitter uniform: t_s is a SCALAR per sample, so no
  per-ray t tensors are needed inside;
- sigma lives in column 0 of the head output and is broadcast to all
  128 lanes with a constant selector MATMUL (no column slicing);
- rgb occupies columns 1..3 of the accumulated output; the caller
  extracts them (and depth from a second accumulator) in XLA.

The field itself (``TinyFusedNeRF`` in models/hash_nerf.py... see
models/fused_tiny_nerf.py) is trained with the numerically identical
XLA path; the kernel is the serving renderer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ENC = 128  # encoding width (padded)
HID = 128  # MLP width


def _kernel(jit_ref, flag_ref, oe_ref, de_ref, df_ref, w1_ref, w2_ref,
            w3_ref, out_ref, depth_ref, enc_scr, h_scr, head_scr, sig_scr,
            rgb_scr, dep_scr, trans_scr, *, n_samples, s_chunk, near, far,
            block, early_stop_eps):
    """Sample-CHUNKED: the samples are processed ``s_chunk`` at a time —
    encodings built for the chunk, the MLP runs as three (R*s_chunk, 128)
    matmuls, compositing walks the chunk. Chunking (a) bounds scratch to
    O(R*s_chunk) so 512-ray blocks fit VMEM (the old whole-sample-axis
    scratch OOM'd past block=256), and (b) gives occupancy skipping its
    granularity: a chunk whose flag is 0 (see ops/occupancy.py) is
    skipped entirely under ``pl.when`` — a skipped chunk leaves the
    compositing state unchanged, which is lossless when its true alpha
    is below the flag builder's alpha_thresh (1e-3). The default probe
    (ops/occupancy.py method="sampled") estimates the view-dependent
    sigma as a margin-scaled max over sampled directions — a
    quality-gated approximation (>= 39 dB PSNR skip-vs-dense gate), not
    a proof; method="bound" gives the provable-but-loose alternative.
    Compositing state (rgb / depth / transmittance) lives in scratch so
    it survives the skip predicates."""
    jitter = jit_ref[0, 0]
    bi = pl.program_id(0)  # flags ride SMEM whole: Mosaic requires the
    # sublane dim of a blocked operand to be 8-aligned, which a (1, C)
    # per-block slice of (n_blocks, C) can't satisfy — so the kernel
    # indexes the full array by grid position instead
    dt = (far - near) / n_samples
    oe = oe_ref[...]
    de = de_ref[...]
    R = block
    mm = enc_scr.dtype

    rgb_scr[...] = jnp.zeros((R, HID), jnp.float32)
    dep_scr[...] = jnp.zeros((R, 1), jnp.float32)
    trans_scr[...] = jnp.ones((R, 1), jnp.float32)

    df = df_ref[...].astype(jnp.float32)
    df_all = jnp.broadcast_to(df[None], (s_chunk, block, HID)).reshape(
        s_chunk * block, HID)
    # sin(oe + t_s de) by angle rotation: 2 transcendentals per chunk
    # plus the per-lane step rotation (sd, cd), then 4 FMAs per sample
    # instead of a VPU sine each — the sine loop was ~30% of block time.
    sd = jnp.sin(dt * de)
    cd = jnp.cos(dt * de)

    for ci in range(n_samples // s_chunk):
        live = flag_ref[bi, ci] != 0
        if early_stop_eps > 0.0 and ci > 0:
            # transmittance early-out: once EVERY ray in the block has
            # T < eps, the remaining chunks contribute at most eps to
            # any output — skip their encoding/MLP/compositing. This is
            # occlusion culling: for solid scenes most rays terminate at
            # the first surface and the trailing chunks are free.
            live = live & (jnp.max(trans_scr[...]) > early_stop_eps)

        @pl.when(live)
        def _(ci=ci):
            t0 = near + (ci * s_chunk + jitter) * dt
            u = jnp.sin(oe + t0 * de)
            v = jnp.cos(oe + t0 * de)
            for s in range(s_chunk):
                enc_scr[pl.ds(s * R, R), :] = u.astype(mm)
                un = u * cd + v * sd
                v = v * cd - u * sd
                u = un

            h_scr[...] = jnp.maximum(
                jnp.dot(enc_scr[...], w1_ref[...],
                        preferred_element_type=jnp.float32), 0.0
            ).astype(mm)
            # layer 2 as one chunk-wide matmul, then the per-ray view
            # feature (df, precomputed outside) is added per sample
            # segment with the ReLU
            head_scr[...] = jnp.dot(h_scr[...], w2_ref[...],
                                    preferred_element_type=jnp.float32)
            h_scr[...] = jnp.maximum(head_scr[...] + df_all, 0.0).astype(mm)
            head_scr[...] = jnp.dot(h_scr[...], w3_ref[...],
                                    preferred_element_type=jnp.float32)
            # stash raw sigma (head column 0) before the in-place
            # sigmoid; the compositing recursion then runs on (R, 1)
            # per-ray scalars — the per-sample exp costs 1 lane, and a
            # 128-wide sigma-broadcast selector matmul is avoided
            sig_scr[...] = head_scr[:, 0:1]
            head_scr[...] = jax.nn.sigmoid(head_scr[...])

            rgb_acc = rgb_scr[...]
            depth_acc = dep_scr[...]
            trans = trans_scr[...]
            for s in range(s_chunk):
                t_s = near + (ci * s_chunk + s + jitter) * dt
                sigma = sig_scr[pl.ds(s * R, R), :]
                alpha = 1.0 - jnp.exp(-jnp.maximum(sigma, 0.0) * dt)
                w = trans * alpha
                rgb_acc = rgb_acc + jnp.broadcast_to(w, (R, HID)) * \
                    head_scr[pl.ds(s * R, R), :]
                depth_acc = depth_acc + w * t_s
                trans = trans * (1.0 - alpha)
            rgb_scr[...] = rgb_acc
            dep_scr[...] = depth_acc
            trans_scr[...] = trans

    out_ref[...] = rgb_scr[...]
    depth_ref[...] = jnp.broadcast_to(dep_scr[...], (R, HID))


@functools.partial(
    jax.jit, static_argnames=("n_samples", "near", "far", "block",
                              "s_chunk", "interpret", "early_stop_eps")
)
def render_fused(
    oe: jnp.ndarray,
    de: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    w3: jnp.ndarray,
    df: jnp.ndarray | None = None,
    jitter: jnp.ndarray | float = 0.5,
    n_samples: int = 32,
    near: float = 2.0,
    far: float = 6.0,
    block: int = 512,
    s_chunk: int = 16,
    flags: jnp.ndarray | None = None,
    interpret: bool = False,
    early_stop_eps: float = 1e-3,
):
    """Render (N, ENC)-encoded rays. Returns (rgb (N, 3), depth (N,)).

    oe, de: origin/direction ray encodings = [o|d] @ E2 + bias (see
    models/fused_tiny_nerf.encode_rays). w*: (128, 128) MLP weights with
    biases folded into a constant-one input lane by the caller.
    flags: optional int32 (n_blocks, n_samples // s_chunk) occupancy
    skip flags from ``ops.occupancy.chunk_flags`` (must be built with
    the SAME block/s_chunk); None renders every chunk.
    early_stop_eps: skip a chunk once every ray in the block has
    transmittance below this (output error <= eps per channel); 0
    disables the early-out.
    """
    N = oe.shape[0]
    if df is None:
        df = jnp.zeros_like(oe)
    if n_samples % s_chunk:
        raise ValueError(f"n_samples={n_samples} % s_chunk={s_chunk} != 0")
    pad = (-N) % block
    oe = jnp.pad(oe, ((0, pad), (0, 0)))
    de = jnp.pad(de, ((0, pad), (0, 0)))
    df = jnp.pad(df, ((0, pad), (0, 0)))
    n_blocks = (N + pad) // block
    n_chunks = n_samples // s_chunk
    if flags is None:
        flags = jnp.ones((n_blocks, n_chunks), jnp.int32)

    kernel = functools.partial(
        _kernel, n_samples=n_samples, s_chunk=s_chunk, near=near, far=far,
        block=block, early_stop_eps=float(early_stop_eps),
    )
    jit_arr = jnp.asarray(jitter, jnp.float32).reshape(1, 1)
    rgb_w, depth_w = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_blocks, n_chunks), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, ENC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, ENC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, ENC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, HID), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, HID), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + pad, HID), jnp.float32),
            jax.ShapeDtypeStruct((N + pad, HID), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block * s_chunk, ENC), w1.dtype),
            pltpu.VMEM((block * s_chunk, HID), w1.dtype),
            pltpu.VMEM((block * s_chunk, HID), jnp.float32),
            pltpu.VMEM((block * s_chunk, 1), jnp.float32),
            pltpu.VMEM((block, HID), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
        # v5e has 128M VMEM; the default 16M scoped limit rejects
        # block*s_chunk > 4096 (measured: block=512, s_chunk=16 needs
        # 17.24M). Budget the actual scratch + blocked operands, x2 for
        # Mosaic double-buffering, floor 16M.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(
                16 * 2**20,
                2 * (block * s_chunk * (2 * ENC * w1.dtype.itemsize + HID * 4)
                     + 10 * block * (ENC + HID) * 4)),
        ),
        interpret=interpret,
    )(jit_arr, jnp.asarray(flags, jnp.int32), oe, de, df, jnp.asarray(w1),
      jnp.asarray(w2), jnp.asarray(w3))

    rgb = rgb_w[:N, 1:4]
    depth = depth_w[:N, 0]
    # accumulated opacity: sum of weights = 1 - final transmittance; the
    # rgb accumulator's unused col 4 carries nothing, so recover acc from
    # depth/rgb is not possible — callers needing acc use the XLA path.
    return rgb, depth


# ---------------------------------------------------------------------------
# int8 serving variant
#
# The bf16 kernel is matmul-bound at its MXU speed of light (measured
# round 4: ~16M rays/s = ~49 TFLOP/s effective, vs ~50-56 TFLOP/s for
# pure XLA matmuls of the same (R,128)@(128,128) shape class on this
# chip). The only way past it is fewer/cheaper MACs: int8 runs the MXU
# at twice the bf16 rate. Scheme (mirrors ops/serving.py for the
# SuperPoint backbone): symmetric int8, per-output-column weight scales,
# per-tensor activation scales calibrated on sample renders; the
# encoding is EXACTLY representable (sin in [-1,1], scale 1/127) and
# compositing stays f32, so only the two hidden activations quantize.
# ---------------------------------------------------------------------------


def quantize_field(params, calib_oe, calib_de, calib_df, *, n_samples=32,
                   near=2.0, far=6.0, jitter=0.5):
    """Quantize tiny-field MLP weights to int8 for ``render_fused_int8``.

    Calibrates the two hidden-activation scales by running the XLA
    reference math over the calibration rays at every sample depth and
    taking the max. Returns a dict of int8 weights + f32 scale vectors
    (all host-materialized numpy; build once per field, like the
    occupancy volume).
    """
    w1 = np.asarray(params["w1"], np.float32)
    w2 = np.asarray(params["w2"], np.float32)
    w3 = np.asarray(params["w3"], np.float32)

    def colscale(w):
        s = np.abs(w).max(axis=0) / 127.0
        return np.where(s > 0, s, 1.0).astype(np.float32)

    s1, s2, s3 = colscale(w1), colscale(w2), colscale(w3)
    qw1 = np.clip(np.rint(w1 / s1), -127, 127).astype(np.int8)
    qw2 = np.clip(np.rint(w2 / s2), -127, 127).astype(np.int8)
    qw3 = np.clip(np.rint(w3 / s3), -127, 127).astype(np.int8)

    # activation calibration through the QUANTIZED layer-1/2 weights so
    # the scales see the ranges the kernel will actually produce
    oe = np.asarray(calib_oe, np.float32)
    de = np.asarray(calib_de, np.float32)
    df = np.asarray(calib_df, np.float32)
    dt = (far - near) / n_samples
    dq1 = qw1.astype(np.float32) * s1 / 127.0  # enc scale folded (se=1/127)
    dq2 = qw2.astype(np.float32) * s2
    # pass 1: layer-1 range over all sample depths
    h_max = 1e-6
    for s in range(n_samples):
        t_s = near + (s + jitter) * dt
        enc = np.rint(np.sin(oe + t_s * de) * 127.0)
        h_max = max(h_max, float(np.maximum(enc @ dq1, 0.0).max()))
    a1 = h_max / 127.0
    # pass 2: layer-2 range through the FINAL layer-1 quantizer
    h2_max = 1e-6
    for s in range(n_samples):
        t_s = near + (s + jitter) * dt
        enc = np.rint(np.sin(oe + t_s * de) * 127.0)
        qh = np.clip(np.rint(np.maximum(enc @ dq1, 0.0) / a1), 0, 127)
        h2 = np.maximum(qh @ dq2 * a1 + df, 0.0)
        h2_max = max(h2_max, float(h2.max()))
    a2 = h2_max / 127.0
    return {
        "qw1": qw1, "qw2": qw2, "qw3": qw3,
        # layer 1: qh = round(clip(relu(acc1) * m1, 0, 127))
        "m1": (s1 / (127.0 * a1)).astype(np.float32),
        # layer 2: qh2 = round(clip(relu(acc2 * m2 + df * ia2), 0, 127))
        "m2": (s2 * (a1 / a2)).astype(np.float32),
        "ia2": np.float32(1.0 / a2),
        # layer 3: head = acc3 * r3
        "r3": (s3 * a2).astype(np.float32),
        "a1": np.float32(a1), "a2": np.float32(a2),
    }


def _kernel_int8(jit_ref, flag_ref, oe_ref, de_ref, df_ref, w1_ref, w2_ref,
                 w3_ref, scl_ref, out_ref, depth_ref, enc_scr, h_scr,
                 head_scr, sig_scr, rgb_scr, dep_scr, trans_scr, *,
                 n_samples, s_chunk, near, far, block, early_stop_eps, ia2):
    """int8 twin of ``_kernel``: same sampling/compositing, quantized
    MLP. ``scl_ref`` is an (8, HID) f32 VMEM input whose rows 0/1/2 are
    the per-column rescales m1/m2/r3 (8 sublanes for tile alignment);
    ia2 is a compile-time scalar."""
    jitter = jit_ref[0, 0]
    bi = pl.program_id(0)
    dt = (far - near) / n_samples
    oe = oe_ref[...]
    de = de_ref[...]
    R = block

    rgb_scr[...] = jnp.zeros((R, HID), jnp.float32)
    dep_scr[...] = jnp.zeros((R, 1), jnp.float32)
    trans_scr[...] = jnp.ones((R, 1), jnp.float32)

    scl = scl_ref[...]
    c_m1 = scl[0:1, :]
    c_m2 = scl[1:2, :]
    c_r3 = scl[2:3, :]

    df = df_ref[...].astype(jnp.float32) * ia2  # pre-scaled for layer 2
    df_all = jnp.broadcast_to(df[None], (s_chunk, block, HID)).reshape(
        s_chunk * block, HID)
    sd = jnp.sin(dt * de)
    cd = jnp.cos(dt * de)

    for ci in range(n_samples // s_chunk):
        live = flag_ref[bi, ci] != 0
        if early_stop_eps > 0.0 and ci > 0:
            live = live & (jnp.max(trans_scr[...]) > early_stop_eps)

        @pl.when(live)
        def _(ci=ci):
            t0 = near + (ci * s_chunk + jitter) * dt
            u = jnp.sin(oe + t0 * de)
            v = jnp.cos(oe + t0 * de)
            for s in range(s_chunk):
                # sin in [-1, 1]: *127 is exact symmetric int8
                enc_scr[pl.ds(s * R, R), :] = jnp.round(
                    u * 127.0).astype(jnp.int8)
                un = u * cd + v * sd
                v = v * cd - u * sd
                u = un

            acc1 = jax.lax.dot_general(
                enc_scr[...], w1_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h_scr[...] = jnp.round(jnp.clip(
                jnp.maximum(acc1, 0).astype(jnp.float32) * c_m1,
                0.0, 127.0)).astype(jnp.int8)
            acc2 = jax.lax.dot_general(
                h_scr[...], w2_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h2 = jnp.maximum(acc2.astype(jnp.float32) * c_m2 + df_all, 0.0)
            h_scr[...] = jnp.round(jnp.clip(h2, 0.0, 127.0)).astype(jnp.int8)
            acc3 = jax.lax.dot_general(
                h_scr[...], w3_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            head_scr[...] = acc3.astype(jnp.float32) * c_r3
            sig_scr[...] = head_scr[:, 0:1]
            head_scr[...] = jax.nn.sigmoid(head_scr[...])

            rgb_acc = rgb_scr[...]
            depth_acc = dep_scr[...]
            trans = trans_scr[...]
            for s in range(s_chunk):
                t_s = near + (ci * s_chunk + s + jitter) * dt
                sigma = sig_scr[pl.ds(s * R, R), :]
                alpha = 1.0 - jnp.exp(-jnp.maximum(sigma, 0.0) * dt)
                w = trans * alpha
                rgb_acc = rgb_acc + jnp.broadcast_to(w, (R, HID)) * \
                    head_scr[pl.ds(s * R, R), :]
                depth_acc = depth_acc + w * t_s
                trans = trans * (1.0 - alpha)
            rgb_scr[...] = rgb_acc
            dep_scr[...] = depth_acc
            trans_scr[...] = trans

    out_ref[...] = rgb_scr[...]
    depth_ref[...] = jnp.broadcast_to(dep_scr[...], (R, HID))


@functools.partial(
    jax.jit, static_argnames=("n_samples", "near", "far", "block",
                              "s_chunk", "interpret", "early_stop_eps",
                              "ia2")
)
def _render_fused_int8(oe, de, qw1, qw2, qw3, scl, df, jitter, n_samples,
                       near, far, block, s_chunk, flags, interpret,
                       early_stop_eps, ia2):
    N = oe.shape[0]
    pad = (-N) % block
    oe = jnp.pad(oe, ((0, pad), (0, 0)))
    de = jnp.pad(de, ((0, pad), (0, 0)))
    df = jnp.pad(df, ((0, pad), (0, 0)))
    n_blocks = (N + pad) // block
    n_chunks = n_samples // s_chunk
    if flags is None:
        flags = jnp.ones((n_blocks, n_chunks), jnp.int32)

    kernel = functools.partial(
        _kernel_int8, n_samples=n_samples, s_chunk=s_chunk, near=near,
        far=far, block=block, early_stop_eps=float(early_stop_eps),
        ia2=float(ia2),
    )
    jit_arr = jnp.asarray(jitter, jnp.float32).reshape(1, 1)
    rgb_w, depth_w = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_blocks, n_chunks), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, ENC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, ENC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, ENC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, HID), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, HID), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + pad, HID), jnp.float32),
            jax.ShapeDtypeStruct((N + pad, HID), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block * s_chunk, ENC), jnp.int8),
            pltpu.VMEM((block * s_chunk, HID), jnp.int8),
            pltpu.VMEM((block * s_chunk, HID), jnp.float32),
            pltpu.VMEM((block * s_chunk, 1), jnp.float32),
            pltpu.VMEM((block, HID), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(
                16 * 2**20,
                2 * (block * s_chunk * (ENC + HID + HID * 4)
                     + 10 * block * (ENC + HID) * 4)),
        ),
        interpret=interpret,
    )(jit_arr, jnp.asarray(flags, jnp.int32), oe, de, df,
      jnp.asarray(qw1), jnp.asarray(qw2), jnp.asarray(qw3), scl)
    return rgb_w[:N, 1:4], depth_w[:N, 0]


def render_fused_int8(oe, de, qfield, df=None, jitter=0.5, n_samples=32,
                      near=2.0, far=6.0, block=512, s_chunk=16, flags=None,
                      interpret=False, early_stop_eps=1e-3):
    """Render encoded rays through the int8-quantized field.

    ``qfield`` is the dict from :func:`quantize_field`. Same contract as
    :func:`render_fused` otherwise.
    """
    if df is None:
        df = jnp.zeros_like(oe)
    if n_samples % s_chunk:
        raise ValueError(f"n_samples={n_samples} % s_chunk={s_chunk} != 0")
    scl = np.zeros((8, HID), np.float32)
    scl[0] = qfield["m1"]
    scl[1] = qfield["m2"]
    scl[2] = qfield["r3"]
    return _render_fused_int8(
        oe, de, qfield["qw1"], qfield["qw2"], qfield["qw3"],
        jnp.asarray(scl), df, jitter, n_samples, near, far, block,
        s_chunk, flags, interpret, float(early_stop_eps),
        float(qfield["ia2"]))


# ---------------------------------------------------------------------------
# Packed narrow-width serving variant
#
# The 128-wide kernel is matmul-bound at the chip's bf16 MXU rate, so
# the only remaining throughput lever is fewer MACs per sample. A
# width-W field (W in {64, 32}; models/fused_tiny_nerf.TinyFieldConfig
# width) runs k = 128 // W SAMPLES PER LANE ROW with block-diagonal
# weights: the matmuls stay (rows, 128) @ (128, 128) — full MXU
# utilization — while FLOP/ray drops by k. Head layout per lane group g:
# col 4g = raw sigma, cols 4g+1..4g+3 = rgb logits; compositing walks
# the k samples of a row sequentially (transmittance order preserved),
# accumulating each group's rgb into its own lanes with a per-lane
# masked weight, and the caller sums the k lane groups outside.
# Quality is gated like every renderer change: >= 39 dB PSNR on the
# sphere fit THROUGH this kernel (benchmarks/nerf_quality_sphere.py
# --width W).
# ---------------------------------------------------------------------------


def pack_field_params(params, width: int):
    """Block-diagonal 128x128 packing of width-W MLP weights.

    w1/w2 go plain block-diagonal; w3 is packed so lane group g's head
    lands in cols 4g..4g+3 (sigma, r, g, b) — low lanes, so the kernel
    only ever lane-slices at static offsets < 4k.
    """
    k = 128 // width
    if width * k != 128 or 4 * k > width:
        raise ValueError(f"unsupported pack width {width}")
    w1 = jnp.asarray(params["w1"])
    w2 = jnp.asarray(params["w2"])
    w3 = jnp.asarray(params["w3"])
    w1p = jnp.zeros((128, 128), w1.dtype)
    w2p = jnp.zeros((128, 128), w1.dtype)
    w3p = jnp.zeros((128, 128), w1.dtype)
    for g in range(k):
        sl = slice(g * width, (g + 1) * width)
        w1p = w1p.at[sl, sl].set(w1)
        w2p = w2p.at[sl, sl].set(w2)
        w3p = w3p.at[sl, 4 * g:4 * g + 4].set(w3[:, 0:4])
    return w1p, w2p, w3p


def _kernel_packed(jit_ref, flag_ref, oe_ref, de_ref, df_ref, w1_ref,
                   w2_ref, w3_ref, out_ref, enc_scr, h_scr,
                   head_scr, rgb_scr, tau_scr, *, n_rows,
                   s_chunk, pack, dt, near, block, early_stop_eps):
    """k-packed twin of ``_kernel``: each lane row carries ``pack``
    consecutive samples (group g in lanes gW..(g+1)W-1). The encoding
    recurrence advances by pack*dt per row (per-group phase offsets are
    folded into oe by the caller).

    Compositing is fully VECTORIZED — no per-sample (R, 1) recursion.
    Once the main matmuls halve (packing), the sequential scalar
    transmittance chain becomes the cap (measured: w64 15.5M ~= w128
    14.4M rays/s). Instead, per chunk of S = s_chunk*pack samples:

      1. tiny selection matmuls gather each row block's sigma lanes
         (4g) into an (R, S) sample-major layout and the rgb logits
         into (R, 3S);
      2. the exclusive transmittance prefix is ONE (R, S) @ (S, S)
         strictly-upper-triangular matmul in optical-depth (log) space
         — tau_j = sum_{i<j} sigma_i*dt — carried across chunks as a
         single (R, 1) accumulator (tau_scr);
      3. sample weights come from two full-width exps:
         w_j = exp(-(tau+csum_j)) - exp(-(tau+csum_j+sig_j))
         == T_j * alpha_j exactly (in exact arithmetic) — the alpha
         recursion telescopes;
      4. rgb = (sigmoid(rgb_logits) * w_repeated) @ D accumulates every
         sample of the chunk into output lanes 0..2 with one matmul
         (D sums the S samples per channel), depth likewise via
         (R, S) @ (S, 1).

    The extra selection matmuls cost ~20% of the main-MLP FLOP (they
    run over the bf16 head scratch); in exchange every transcendental
    and every compositing op is full-width or (R, S)-wide.
    """
    jitter = jit_ref[0, 0]
    bi = pl.program_id(0)
    oe = oe_ref[...]
    de = de_ref[...]
    R = block
    S = s_chunk * pack
    mm = enc_scr.dtype

    rgb_scr[...] = jnp.zeros((R, HID), jnp.float32)
    tau_scr[...] = jnp.zeros((R, 1), jnp.float32)  # accumulated optical depth
    # any-ray-live threshold in tau space: T = exp(-tau) > eps
    tau_cut = (np.inf if early_stop_eps <= 0.0
               else -float(np.log(early_stop_eps)))

    df = df_ref[...].astype(jnp.float32)
    df_all = jnp.broadcast_to(df[None], (s_chunk, block, HID)).reshape(
        s_chunk * block, HID)
    # rotation step per packed row = pack samples
    sd = jnp.sin(pack * dt * de)
    cd = jnp.cos(pack * dt * de)

    # --- constant selection matrices, built from iota comparisons
    # (pallas_call rejects captured host arrays; iota-built constants
    # trace into the kernel and Mosaic folds them) ---
    def _iota2(rows, cols):
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        q = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        return r, q

    # SEL[s]: (HID, S) head-lane 4g -> sample lane s*pack+g
    # CSEL[s]: (HID, 3S) head-lane 4g+1+c -> lane 3*(s*pack+g)+c
    sel, csel = [], []
    for s in range(s_chunk):
        r, q = _iota2(HID, S)
        g = q - s * pack
        sel.append(((g >= 0) & (g < pack) & (r == 4 * g)).astype(mm))
        r, q = _iota2(HID, 3 * S)
        j, cch = q // 3, q % 3
        g = j - s * pack
        csel.append(((g >= 0) & (g < pack)
                     & (r == 4 * g + 1 + cch)).astype(mm))
    # strictly-upper-triangular prefix: csum[:, j] = sum_{i<j} sig[:, i]
    r, q = _iota2(S, S)
    ut = (r < q).astype(jnp.float32)
    # repeat each sample weight into its 3 channel lanes
    r, q = _iota2(S, 3 * S)
    rep = (r == q // 3).astype(jnp.float32)
    # sum channel c of every sample into output lane c
    r, q = _iota2(3 * S, HID)
    dmat = (q == r % 3).astype(jnp.float32)
    # depth accumulates into output LANE 3 of the same scratch (one
    # packed (R, HID) output instead of two — the two full-width f32
    # outputs were ~30% of the kernel's structural floor, measured)
    r, q = _iota2(S, HID)
    dep_mat = (q == 3).astype(jnp.float32)
    ones_s = jnp.ones((S, 1), jnp.float32)

    for ci in range(n_rows // s_chunk):
        live = flag_ref[bi, ci] != 0
        if early_stop_eps > 0.0 and ci > 0:
            live = live & (jnp.min(tau_scr[...]) < tau_cut)

        @pl.when(live)
        def _(ci=ci):
            # first sample index of this chunk's first row
            j0 = ci * S
            t0 = near + (j0 + jitter) * dt
            u = jnp.sin(oe + t0 * de)
            v = jnp.cos(oe + t0 * de)
            for s in range(s_chunk):
                enc_scr[pl.ds(s * R, R), :] = u.astype(mm)
                un = u * cd + v * sd
                v = v * cd - u * sd
                u = un

            h_scr[...] = jnp.maximum(
                jnp.dot(enc_scr[...], w1_ref[...],
                        preferred_element_type=jnp.float32), 0.0
            ).astype(mm)
            h2 = jnp.dot(h_scr[...], w2_ref[...],
                         preferred_element_type=jnp.float32)
            h_scr[...] = jnp.maximum(h2 + df_all, 0.0).astype(mm)
            head_scr[...] = jnp.dot(
                h_scr[...], w3_ref[...],
                preferred_element_type=jnp.float32).astype(mm)

            # gather sigma -> (R, S) and rgb logits -> (R, 3S)
            raw = jnp.zeros((R, S), jnp.float32)
            rgbl = jnp.zeros((R, 3 * S), jnp.float32)
            for s in range(s_chunk):
                row = head_scr[pl.ds(s * R, R), :]
                raw = raw + jnp.dot(row, sel[s],
                                    preferred_element_type=jnp.float32)
                rgbl = rgbl + jnp.dot(row, csel[s],
                                      preferred_element_type=jnp.float32)
            sig = jnp.maximum(raw, 0.0) * dt

            tau = tau_scr[...]
            csum = jnp.dot(sig, ut, preferred_element_type=jnp.float32)
            e1 = jnp.exp(-(csum + tau))          # T before sample j
            e2 = e1 * jnp.exp(-sig)              # T after sample j
            w = e1 - e2                          # == T_j * alpha_j

            # depth: sum_j w_j t_j with t_j = near + (j0+j+jitter)*dt,
            # accumulated into output lane 3 via dep_mat
            # (int iota + cast: Mosaic rejects float tpu.iota results)
            jvec = jax.lax.broadcasted_iota(
                jnp.int32, (1, S), 1).astype(jnp.float32)
            tvec = near + (j0 + jvec + jitter) * dt
            tau_scr[...] = tau + jnp.dot(
                sig, ones_s, preferred_element_type=jnp.float32)

            # rgb: weight each sample's sigmoid'd channels, sum into
            # output lanes 0..2 with one matmul; depth into lane 3
            wrep = jnp.dot(w, rep, preferred_element_type=jnp.float32)
            p = jax.nn.sigmoid(rgbl) * wrep
            rgb_scr[...] = (rgb_scr[...]
                            + jnp.dot(p, dmat,
                                      preferred_element_type=jnp.float32)
                            + jnp.dot(w * tvec, dep_mat,
                                      preferred_element_type=jnp.float32))

    out_ref[...] = rgb_scr[...]


@functools.partial(
    jax.jit, static_argnames=("width", "n_samples", "near", "far", "block",
                              "s_chunk", "interpret", "early_stop_eps")
)
def render_fused_packed(
    oe: jnp.ndarray,
    de: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    w3: jnp.ndarray,
    df: jnp.ndarray | None = None,
    jitter: jnp.ndarray | float = 0.5,
    *,
    width: int,
    n_samples: int = 32,
    near: float = 2.0,
    far: float = 6.0,
    block: int = 512,
    s_chunk: int = 8,
    flags: jnp.ndarray | None = None,
    interpret: bool = False,
    early_stop_eps: float = 1e-3,
):
    """Render width-W encoded rays (oe/de/df are (N, W)) with k = 128//W
    samples packed per lane row. w1/w2/w3 are the UNPACKED (W, W)
    weights; packing happens here (cheap, jitted). ``s_chunk`` counts
    packed rows, so one chunk covers s_chunk*k samples; ``flags`` (if
    given) must be (n_blocks, n_rows // s_chunk) built at that chunk
    granularity. Returns (rgb (N, 3), depth (N,))."""
    N, W = oe.shape
    if W != width:
        raise ValueError(f"oe width {W} != field width {width}")
    pack = 128 // width
    if n_samples % (pack * s_chunk):
        raise ValueError(
            f"n_samples={n_samples} not divisible by pack*s_chunk="
            f"{pack * s_chunk}")
    n_rows = n_samples // pack
    dt = (far - near) / n_samples
    if df is None:
        df = jnp.zeros_like(oe)

    # fold per-group sample phase into oe: group g sees t + g*dt
    oe_pk = jnp.concatenate([oe + (g * dt) * de for g in range(pack)],
                            axis=1)
    de_pk = jnp.concatenate([de] * pack, axis=1)
    df_pk = jnp.concatenate([df] * pack, axis=1)
    w1p, w2p, w3p = pack_field_params(
        {"w1": w1, "w2": w2, "w3": w3}, width)

    pad = (-N) % block
    oe_pk = jnp.pad(oe_pk, ((0, pad), (0, 0)))
    de_pk = jnp.pad(de_pk, ((0, pad), (0, 0)))
    df_pk = jnp.pad(df_pk, ((0, pad), (0, 0)))
    n_blocks = (N + pad) // block
    n_chunks = n_rows // s_chunk
    if flags is None:
        flags = jnp.ones((n_blocks, n_chunks), jnp.int32)

    kernel = functools.partial(
        _kernel_packed, n_rows=n_rows, s_chunk=s_chunk, pack=pack,
        dt=float(dt), near=near, block=block,
        early_stop_eps=float(early_stop_eps),
    )
    jit_arr = jnp.asarray(jitter, jnp.float32).reshape(1, 1)
    out_w = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_blocks, n_chunks), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, ENC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, ENC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, ENC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, HID), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N + pad, HID), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block * s_chunk, ENC), w1p.dtype),
            pltpu.VMEM((block * s_chunk, HID), w1p.dtype),
            # head kept at the weight dtype: the selection matmuls that
            # gather sigma/rgb lanes read it as an MXU operand
            pltpu.VMEM((block * s_chunk, HID), w1p.dtype),
            pltpu.VMEM((block, HID), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(
                16 * 2**20,
                2 * (block * s_chunk * (2 * ENC * w1p.dtype.itemsize
                                        + HID * 4)
                     + 10 * block * (ENC + HID) * 4)),
        ),
        interpret=interpret,
    )(jit_arr, jnp.asarray(flags, jnp.int32), oe_pk, de_pk, df_pk,
      w1p, w2p, w3p)

    # the in-kernel D matmuls already sum every sample into lanes 0..2
    # (rgb) and lane 3 (depth) of the single packed output
    rgb = out_w[:N, 0:3]
    depth = out_w[:N, 3]
    return rgb, depth
