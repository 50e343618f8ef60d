"""Integer-factor bicubic upsampling with PyTorch semantics.

The reference upsamples raw descriptors with
``F.interpolate(..., mode='bicubic', align_corners=False)``
(heads.py:65). PyTorch's cubic kernel uses a = -0.75 and clamps source
indices at the border; ``jax.image.resize`` uses a = -0.5, so we build
the exact kernel ourselves. For an integer scale factor the fractional
source offsets cycle through ``factor`` fixed phases, so upsampling is a
static phase-weighted sum of 4 shifted slices per axis — pure fused VPU
work under XLA, no gathers.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(t: float, a: float = -0.75) -> np.ndarray:
    """Weights for source offsets (-1, 0, 1, 2) at fractional position t."""

    def w(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x**3 - (a + 3) * x**2 + 1
        if x < 2:
            return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
        return 0.0

    return np.array([w(t + 1), w(t), w(1 - t), w(2 - t)], np.float32)


@functools.lru_cache(maxsize=None)
def _phase_table(factor: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-phase (base offset, 4-tap weights) for align_corners=False."""
    bases = np.zeros(factor, np.int32)
    weights = np.zeros((factor, 4), np.float32)
    for p in range(factor):
        src = (p + 0.5) / factor - 0.5
        base = int(np.floor(src))
        t = src - base
        bases[p] = base
        weights[p] = _cubic_kernel(t)
    return bases, weights


def _upsample_axis(x: jnp.ndarray, factor: int, axis: int) -> jnp.ndarray:
    n = x.shape[axis]
    bases, weights = _phase_table(factor)
    # clamp-at-border => edge padding by 2 on each side
    pad = [(0, 0)] * x.ndim
    pad[axis] = (2, 2)
    xp = jnp.pad(x, pad, mode="edge")

    def take(start):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start + 2, start + 2 + n)
        return xp[tuple(idx)]

    phases = []
    for p in range(factor):
        acc = None
        for k in range(4):
            term = take(int(bases[p]) - 1 + k) * float(weights[p, k])
            acc = term if acc is None else acc + term
        phases.append(acc)
    stacked = jnp.stack(phases, axis=axis + 1)  # (..., n, factor, ...)
    new_shape = list(x.shape)
    new_shape[axis] = n * factor
    return stacked.reshape(new_shape)


def upsample_bicubic(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Bicubic-upsample (B, H, W, C) by an integer factor on H and W."""
    x = _upsample_axis(x, factor, axis=1)
    x = _upsample_axis(x, factor, axis=2)
    return x
