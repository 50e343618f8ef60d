"""Fused 3x3 conv + bias + ReLU Pallas kernel (NHWC, stride 1, SAME).

EXPERIMENTAL. XLA's conv on this chip reaches only ~27 TFLOPs at
C_out=64 (vs ~52 achievable with a 64-wide MXU output tile); the
backbone's 64-channel layers at 480x640 dominate SuperPoint inference.
This kernel streams row tiles through VMEM with halo DMA and computes
the conv as three K=3*Cin matmuls (one per kernel row) into an f32
accumulator, fusing bias + ReLU into the epilogue.

Layout strategy: the padded input is stored flat as (B, H+2, Wp*Cin) so
every DMA slice is lane-aligned; the three dx shifts are flat slices at
offsets dx*Cin staged through a VMEM scratch (Mosaic cannot concat
vectors with mismatched lane offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_hbm, w_ref, b_ref, out_ref, x_tile, patches, acc, sem,
            *, W, Wp, Cin, Cout, row_tile, relu):
    b = pl.program_id(0)
    t = pl.program_id(1)

    copy = pltpu.make_async_copy(
        xp_hbm.at[b, pl.ds(t * row_tile, row_tile + 2), :],
        x_tile,
        sem,
    )
    copy.start()
    copy.wait()

    acc[:, :] = jnp.zeros_like(acc)
    for dy in range(3):
        rows = x_tile[pl.ds(dy, row_tile), :]  # (TR, Wp*Cin) flat
        for dx in range(3):
            # dx shift == flat offset dx*Cin; stage through scratch to
            # realign lane offsets before the K=3*Cin matmul
            sl = rows[:, dx * Cin : dx * Cin + W * Cin]
            patches[:, :, dx * Cin : (dx + 1) * Cin] = sl.reshape(
                row_tile, W, Cin
            )
        acc[:, :] += jnp.dot(
            patches[:, :, :].reshape(row_tile * W, 3 * Cin),
            w_ref[dy],
            preferred_element_type=jnp.float32,
        )

    out = acc[:, :] + b_ref[0, :][None, :].astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0, :, :, :] = out.reshape(row_tile, W, Cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("row_tile", "relu", "interpret"))
def conv3x3_fused(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    row_tile: int = 8,
    relu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, H, W, Cin), w (3, 3, Cin, Cout), bias (Cout,) ->
    (B, H, W, Cout), SAME zero padding, fused bias+ReLU."""
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    assert H % row_tile == 0, (H, row_tile)
    # flat layout: (B, H+2, Wp*Cin), Wp*Cin a multiple of 128
    Wp = W + 2
    while (Wp * Cin) % 128:
        Wp += 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0)))
    xp_flat = xp.reshape(B, H + 2, Wp * Cin)
    w_rows = w.reshape(3, 3 * Cin, Cout)
    bias2d = bias.reshape(1, Cout)

    n_tiles = H // row_tile
    kernel = functools.partial(
        _kernel, W=W, Wp=Wp, Cin=Cin, Cout=Cout, row_tile=row_tile, relu=relu,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((3, 3 * Cin, Cout), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, row_tile, W, Cout), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((row_tile + 2, Wp * Cin), x.dtype),
            pltpu.VMEM((row_tile, W, 3 * Cin), x.dtype),
            pltpu.VMEM((row_tile * W, Cout), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp_flat, w_rows, bias2d)
