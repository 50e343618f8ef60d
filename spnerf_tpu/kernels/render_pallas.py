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


def _kernel(jit_ref, oe_ref, de_ref, df_ref, w1_ref, w2_ref, w3_ref,
            out_ref, depth_ref, enc_scr, h_scr, head_scr, sig_scr,
            *, n_samples, near, far, block):
    """Sample-batched: all R*S sample encodings are built first, the MLP
    runs as three LARGE matmuls (M = R*S), then compositing walks the
    samples. Per-sample tiny matmuls are latency-bound on the MXU."""
    jitter = jit_ref[0, 0]
    dt = (far - near) / n_samples
    oe = oe_ref[...]
    de = de_ref[...]
    R = block

    # sin(oe + t_s de) by angle rotation: 4 transcendentals per BLOCK
    # (sin/cos of the start phase and of the per-lane step d*de), then
    # 4 FMAs per sample instead of a VPU sine each — the sine loop was
    # ~30% of block time.
    t0 = near + jitter * dt
    u = jnp.sin(oe + t0 * de)
    v = jnp.cos(oe + t0 * de)
    sd = jnp.sin(dt * de)
    cd = jnp.cos(dt * de)
    for s in range(n_samples):
        enc_scr[pl.ds(s * R, R), :] = u.astype(enc_scr.dtype)
        un = u * cd + v * sd
        v = v * cd - u * sd
        u = un

    mm = enc_scr.dtype
    h_scr[...] = jnp.maximum(
        jnp.dot(enc_scr[...], w1_ref[...],
                preferred_element_type=jnp.float32), 0.0
    ).astype(mm)
    # layer 2 as ONE big matmul, then the per-ray view feature (df,
    # precomputed outside) is added per sample segment with the ReLU
    head_scr[...] = jnp.dot(h_scr[...], w2_ref[...],
                            preferred_element_type=jnp.float32)
    df = df_ref[...].astype(jnp.float32)
    df_all = jnp.broadcast_to(df[None], (n_samples, block, HID)).reshape(
        n_samples * block, HID)
    h_scr[...] = jnp.maximum(head_scr[...] + df_all, 0.0).astype(mm)
    head_scr[...] = jnp.dot(h_scr[...], w3_ref[...],
                            preferred_element_type=jnp.float32)
    # stash raw sigma (head column 0) before the in-place sigmoid; the
    # compositing recursion then runs on (R, 1) per-ray scalars — the
    # per-sample exp costs 1 lane instead of 128, and the old 128-wide
    # sigma-broadcast selector matmul (25% of MXU work) is gone
    sig_scr[...] = head_scr[:, 0:1]
    head_scr[...] = jax.nn.sigmoid(head_scr[...])

    rgb_acc = jnp.zeros((R, HID), jnp.float32)
    depth_acc = jnp.zeros((R, 1), jnp.float32)
    trans = jnp.ones((R, 1), jnp.float32)
    for s in range(n_samples):
        t_s = near + (s + jitter) * dt
        sigma = sig_scr[pl.ds(s * R, R), :]
        alpha = 1.0 - jnp.exp(-jnp.maximum(sigma, 0.0) * dt)
        w = trans * alpha
        rgb_acc = rgb_acc + jnp.broadcast_to(w, (R, HID)) * \
            head_scr[pl.ds(s * R, R), :]
        depth_acc = depth_acc + w * t_s
        trans = trans * (1.0 - alpha)

    out_ref[...] = rgb_acc
    depth_ref[...] = jnp.broadcast_to(depth_acc, (R, HID))


@functools.partial(
    jax.jit, static_argnames=("n_samples", "near", "far", "block",
                              "interpret")
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
    block: int = 256,
    interpret: bool = False,
):
    """Render (N, ENC)-encoded rays. Returns (rgb (N, 3), depth (N,), acc (N,)).

    oe, de: origin/direction ray encodings = [o|d] @ E2 + bias (see
    models/fused_tiny_nerf.encode_rays). w*: (128, 128) MLP weights with
    biases folded into a constant-one input lane by the caller.
    """
    N = oe.shape[0]
    if df is None:
        df = jnp.zeros_like(oe)
    pad = (-N) % block
    oe = jnp.pad(oe, ((0, pad), (0, 0)))
    de = jnp.pad(de, ((0, pad), (0, 0)))
    df = jnp.pad(df, ((0, pad), (0, 0)))
    n_blocks = (N + pad) // block

    kernel = functools.partial(
        _kernel, n_samples=n_samples, near=near, far=far, block=block,
    )
    jit_arr = jnp.asarray(jitter, jnp.float32).reshape(1, 1)
    rgb_w, depth_w = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
            pltpu.VMEM((block * n_samples, ENC), w1.dtype),
            pltpu.VMEM((block * n_samples, HID), w1.dtype),
            pltpu.VMEM((block * n_samples, HID), jnp.float32),
            pltpu.VMEM((block * n_samples, 1), jnp.float32),
        ],
        interpret=interpret,
    )(jit_arr, oe, de, df, jnp.asarray(w1), jnp.asarray(w2),
      jnp.asarray(w3))

    rgb = rgb_w[:N, 1:4]
    depth = depth_w[:N, 0]
    # accumulated opacity: sum of weights = 1 - final transmittance; the
    # rgb accumulator's unused col 4 carries nothing, so recover acc from
    # depth/rgb is not possible — callers needing acc use the XLA path.
    return rgb, depth
