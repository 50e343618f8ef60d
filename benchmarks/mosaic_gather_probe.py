"""Probe: which gather forms lower through Mosaic (jax 0.9, TPU v5e)?

Decides the fate of the Instant-NGP hash-grid renderer path
(models/hash_nerf.py says "planned Pallas kernel ... fused
sample->hash->interp->MLP"). Findings on this chip (2026-08-19):

  - ``jnp.take(table, idx, axis=0)``, 1-D idx, 2-D table:   ValueError
    (shape mismatch) — not supported.
  - flat 1-D ``jnp.take``:                                  NotImplementedError
    ("Only 2D gather is supported").
  - ``take_along_axis(table, idx, axis=0)`` same-shape
    sublane gather:                                         Mosaic compile
    crash (tpu_compile_helper exit 1).
  - ``take_along_axis(x, idx, axis=1)`` LANE gather
    (per-element indices 0..127 within the lane dim):       WORKS, exact.

Consequence: a large-table (2^17-entry) hash encoding cannot be fetched
inside a kernel — random sublane gathers don't lower — so the fused
hash-NeRF kernel is dead on this toolchain. What IS expressible is a
*factorized* field: per-axis feature LINES with resolution on the lane
dim, fetched by lane gather + a few jnp.where chunk selects
(see kernels/factor_field_pallas.py). Run this file to re-check when
the toolchain moves.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(kern, out_shape, *args):
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


def probe_take_2d(T=4096, F=128, N=256):
    table = jnp.arange(T * F, dtype=jnp.float32).reshape(T, F) % 997
    idx = jnp.asarray(np.random.default_rng(0).integers(0, T, N), jnp.int32)

    def kern(tr, ir, o):
        o[:] = jnp.take(tr[:], ir[:], axis=0)

    out = _run(kern, jax.ShapeDtypeStruct((N, F), jnp.float32), table, idx)
    ref = np.asarray(table)[np.asarray(idx)]
    return float(np.abs(np.asarray(out) - ref).max())


def probe_sublane_taa(T=512, F=128):
    table = jnp.arange(T * F, dtype=jnp.float32).reshape(T, F) % 997
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, T, (T, F)), jnp.int32)

    def kern(tr, ir, o):
        o[:] = jnp.take_along_axis(tr[:], ir[:], axis=0)

    out = _run(kern, jax.ShapeDtypeStruct((T, F), jnp.float32), table, idx)
    ref = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=0)
    return float(np.abs(np.asarray(out) - ref).max())


def probe_lane_taa(N=256, F=128):
    x = jnp.arange(N * F, dtype=jnp.float32).reshape(N, F) % 997
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, F, (N, F)), jnp.int32)

    def kern(xr, ir, o):
        o[:] = jnp.take_along_axis(xr[:], ir[:], axis=1)

    out = _run(kern, jax.ShapeDtypeStruct((N, F), jnp.float32), x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    return float(np.abs(np.asarray(out) - ref).max())


if __name__ == "__main__":
    for name, fn in [("take_2d(table,1d-idx)", probe_take_2d),
                     ("take_along_axis sublane", probe_sublane_taa),
                     ("take_along_axis LANE", probe_lane_taa)]:
        try:
            err = fn()
            print(f"{name:28s} OK   max|err|={err}")
        except Exception as e:  # noqa: BLE001 - probe records failures
            print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:160]}")
