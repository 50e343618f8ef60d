"""Blockwise Pallas kernel for the descriptor hinge loss.

The descriptor loss contracts every raw-image cell against every
warped-image cell: at 480x640 that is a (4800, 4800) dot-product volume
per batch item (23M pairs). The reference materializes the full 6-D
broadcast volume (losses.py:64-96); the dense JAX path (train/losses.py)
already reduces it to one matmul but still materializes the (N, M)
pairwise tensor for the hinge.

This kernel streams (TILE_N, TILE_M) tiles flash-attention-style: each
tile's dot-product block is computed on the MXU, the correspondence
indicator s is rebuilt in-register from cell coordinates, and only three
scalar sums leave the kernel. The backward pass recomputes tiles and
accumulates dA / dB blockwise (custom VJP) — HBM traffic is O(N*C), not
O(N^2).

Applies to the ``normalise_descriptors=False`` variant (the one every
shipped training config uses); the normalise variant needs global
row/col norms of the volume and stays on the dense path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128
TILE_M = 128


def _pad_to(x, size, axis, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _fwd_kernel(a_ref, b_ref, wy_ref, wx_ref, cy_ref, cx_ref, mn_ref, mm_ref,
                pair_ref, pos_ref, neg_ref,
                *, lambda_d, pos_margin, neg_margin, radius):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        pair_ref[0, 0] = 0.0
        pos_ref[0, 0] = 0.0
        neg_ref[0, 0] = 0.0

    dot = jnp.dot(a_ref[...], b_ref[...].T, preferred_element_type=jnp.float32)

    wy = wy_ref[0, :][:, None]  # (TILE_N, 1) warped raw-cell coords
    wx = wx_ref[0, :][:, None]
    cy = cy_ref[0, :][None, :]  # (1, TILE_M) warped-image cell centers
    cx = cx_ref[0, :][None, :]
    d2 = (cy - wy) ** 2 + (cx - wx) ** 2
    s = (d2 <= radius * radius).astype(jnp.float32)

    mask = mn_ref[0, :][:, None] * mm_ref[0, :][None, :]

    pos = lambda_d * s * jnp.maximum(0.0, pos_margin - dot)
    neg = (1.0 - s) * jnp.maximum(0.0, dot - neg_margin)

    pair_ref[0, 0] += jnp.sum(mask * (pos + neg))
    pos_ref[0, 0] += jnp.sum(mask * pos)
    neg_ref[0, 0] += jnp.sum(mask * neg)


def _bwd_da_kernel(g_ref, a_ref, b_ref, wy_ref, wx_ref, cy_ref, cx_ref,
                   mn_ref, mm_ref, da_ref,
                   *, lambda_d, pos_margin, neg_margin, radius):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        da_ref[...] = jnp.zeros_like(da_ref)

    dot = jnp.dot(a_ref[...], b_ref[...].T, preferred_element_type=jnp.float32)
    wy = wy_ref[0, :][:, None]
    wx = wx_ref[0, :][:, None]
    cy = cy_ref[0, :][None, :]
    cx = cx_ref[0, :][None, :]
    d2 = (cy - wy) ** 2 + (cx - wx) ** 2
    s = (d2 <= radius * radius).astype(jnp.float32)
    mask = mn_ref[0, :][:, None] * mm_ref[0, :][None, :]

    ddot = mask * (
        -lambda_d * s * (dot < pos_margin).astype(jnp.float32)
        + (1.0 - s) * (dot > neg_margin).astype(jnp.float32)
    )
    g = g_ref[0, 0]
    da_ref[...] += g * jnp.dot(ddot, b_ref[...],
                               preferred_element_type=jnp.float32)


def _bwd_db_kernel(g_ref, a_ref, b_ref, wy_ref, wx_ref, cy_ref, cx_ref,
                   mn_ref, mm_ref, db_ref,
                   *, lambda_d, pos_margin, neg_margin, radius):
    i = pl.program_id(1)  # inner dim: sweep over N tiles

    @pl.when(i == 0)
    def _():
        db_ref[...] = jnp.zeros_like(db_ref)

    dot = jnp.dot(a_ref[...], b_ref[...].T, preferred_element_type=jnp.float32)
    wy = wy_ref[0, :][:, None]
    wx = wx_ref[0, :][:, None]
    cy = cy_ref[0, :][None, :]
    cx = cx_ref[0, :][None, :]
    d2 = (cy - wy) ** 2 + (cx - wx) ** 2
    s = (d2 <= radius * radius).astype(jnp.float32)
    mask = mn_ref[0, :][:, None] * mm_ref[0, :][None, :]

    ddot = mask * (
        -lambda_d * s * (dot < pos_margin).astype(jnp.float32)
        + (1.0 - s) * (dot > neg_margin).astype(jnp.float32)
    )
    g = g_ref[0, 0]
    db_ref[...] += g * jnp.dot(ddot.T, a_ref[...],
                               preferred_element_type=jnp.float32)


def _row_spec(tile, which):
    # (1, N)-shaped auxiliary rows, blocked along the second axis
    if which == "n":
        return pl.BlockSpec((1, tile), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, tile), lambda i, j: (0, j),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def descriptor_hinge_sums(
    A, Bm, wcells, cells, mask_m,
    lambda_d, pos_margin, neg_margin, radius, interpret=False,
):
    """(S_pair, S_pos, S_neg) masked hinge sums for one batch item.

    A: (N, C) raw descriptors; Bm: (M, C) warped descriptors;
    wcells: (N, 2) raw cell centers warped into the warped frame;
    cells: (M, 2) warped-image cell centers; mask_m: (M,) valid cells.
    """
    return _hinge_sums_impl(A, Bm, wcells, cells, mask_m, lambda_d,
                            pos_margin, neg_margin, radius, interpret)


def _prep(A, Bm, wcells, cells, mask_m):
    N, C = A.shape
    M = Bm.shape[0]
    Np = -(-N // TILE_N) * TILE_N
    Mp = -(-M // TILE_M) * TILE_M
    A = _pad_to(A, Np, 0)
    Bm = _pad_to(Bm, Mp, 0)
    wy = _pad_to(wcells[:, 0][None, :], Np, 1, value=1e9)
    wx = _pad_to(wcells[:, 1][None, :], Np, 1, value=1e9)
    cy = _pad_to(cells[:, 0][None, :], Mp, 1, value=-1e9)
    cx = _pad_to(cells[:, 1][None, :], Mp, 1, value=-1e9)
    mn = _pad_to(jnp.ones((1, N), jnp.float32), Np, 1)
    mm = _pad_to(mask_m.astype(jnp.float32)[None, :], Mp, 1)
    return A, Bm, wy, wx, cy, cx, mn, mm, Np, Mp, C


def _hinge_sums_impl(A, Bm, wcells, cells, mask_m, lambda_d, pos_margin,
                     neg_margin, radius, interpret):
    A, Bm, wy, wx, cy, cx, mn, mm, Np, Mp, C = _prep(A, Bm, wcells, cells, mask_m)
    grid = (Np // TILE_N, Mp // TILE_M)
    kernel = functools.partial(
        _fwd_kernel, lambda_d=lambda_d, pos_margin=pos_margin,
        neg_margin=neg_margin, radius=radius,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(TILE_N, "n"), _row_spec(TILE_N, "n"),
            _row_spec(TILE_M, "m"), _row_spec(TILE_M, "m"),
            _row_spec(TILE_N, "n"), _row_spec(TILE_M, "m"),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 3,
        interpret=interpret,
    )(A, Bm, wy, wx, cy, cx, mn, mm)
    return tuple(o[0, 0] for o in out)


def _hinge_fwd(A, Bm, wcells, cells, mask_m, lambda_d, pos_margin,
               neg_margin, radius, interpret):
    out = _hinge_sums_impl(A, Bm, wcells, cells, mask_m, lambda_d,
                           pos_margin, neg_margin, radius, interpret)
    return out, (A, Bm, wcells, cells, mask_m)


def _hinge_bwd(lambda_d, pos_margin, neg_margin, radius, interpret,
               residuals, cotangents):
    A0, Bm0, wcells, cells, mask_m = residuals
    g_pair = cotangents[0]  # summaries are logging-only: ignore their grads
    N, C = A0.shape
    M = Bm0.shape[0]
    A, Bm, wy, wx, cy, cx, mn, mm, Np, Mp, _ = _prep(A0, Bm0, wcells, cells, mask_m)
    g = jnp.reshape(g_pair, (1, 1)).astype(jnp.float32)

    da_kernel = functools.partial(
        _bwd_da_kernel, lambda_d=lambda_d, pos_margin=pos_margin,
        neg_margin=neg_margin, radius=radius,
    )
    dA = pl.pallas_call(
        da_kernel,
        grid=(Np // TILE_N, Mp // TILE_M),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_N, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            _row_spec(TILE_N, "n"), _row_spec(TILE_N, "n"),
            _row_spec(TILE_M, "m"), _row_spec(TILE_M, "m"),
            _row_spec(TILE_N, "n"), _row_spec(TILE_M, "m"),
        ],
        out_specs=pl.BlockSpec((TILE_N, C), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, C), jnp.float32),
        interpret=interpret,
    )(g, A, Bm, wy, wx, cy, cx, mn, mm)

    db_kernel = functools.partial(
        _bwd_db_kernel, lambda_d=lambda_d, pos_margin=pos_margin,
        neg_margin=neg_margin, radius=radius,
    )
    # grid: (j, i) so dB block j accumulates over inner i
    dB = pl.pallas_call(
        db_kernel,
        grid=(Mp // TILE_M, Np // TILE_N),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_N, C), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, C), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, C), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, C), jnp.float32),
        interpret=interpret,
    )(g, A, Bm, wy, wx, cy, cx, mn, mm)

    return dA[:N], dB[:M], None, None, None


descriptor_hinge_sums.defvjp(_hinge_fwd, _hinge_bwd)


def descriptor_loss_pallas(
    desc_raw: jnp.ndarray,
    warped_desc_raw: jnp.ndarray,
    warped_cells: jnp.ndarray,
    config,
    valid_mask: jnp.ndarray | None = None,
    interpret: bool | None = None,
):
    """Drop-in replacement for the dense
    ``train.losses.descriptor_loss_from_cells`` (normalise=False only).
    """
    from spnerf_tpu.train.losses import _cell_mask, cell_grid_coords

    cfg = config
    g = cfg.grid_size
    B, Hc, Wc, C = desc_raw.shape
    N = Hc * Wc
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    cells = cell_grid_coords(Hc, Wc, g)
    A = desc_raw.reshape(B, N, C)
    Bm = warped_desc_raw.reshape(B, N, C)
    if valid_mask is None:
        mask_m = jnp.ones((B, N), jnp.float32)
    else:
        mask_m = _cell_mask(valid_mask, g).reshape(B, N)

    def one(a, bm, wc, mm):
        return descriptor_hinge_sums(
            a, bm, wc, cells, mm,
            float(cfg.lambda_d), float(cfg.positive_margin),
            float(cfg.negative_margin), float(g), interpret,
        )

    s_pair, s_pos, s_neg = jax.vmap(one)(A, Bm, warped_cells, mask_m)
    normalization = jnp.sum(mask_m) * N
    loss = cfg.lambda_loss * jnp.sum(s_pair) / normalization
    pos = jax.lax.stop_gradient(jnp.sum(s_pos) / normalization)
    neg = jax.lax.stop_gradient(jnp.sum(s_neg) / normalization)
    return loss, pos, neg
