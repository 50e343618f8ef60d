"""Descriptor-loss benchmark at the Pallas kernel's design point:
480x640 (Hc=60, Wc=80 -> N=4800 cells, 23M cell pairs per item).

The blockwise kernel exists for exactly this shape (the reference's
superpoint_coco_train.yaml trains 480x640 at batch 2): the dense path
materializes a (B, 4800, 4800) f32 pairwise volume (92 MB/item fwd,
x2-3 with backward residuals), the kernel streams tiles and keeps HBM
at O(N*C). Measures value+grad ms/step and device peak memory for both
paths at b2 and b8.

Usage: python benchmarks/desc_loss_480.py  (on chip)
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp

from spnerf_tpu.kernels.descriptor_loss_pallas import descriptor_loss_pallas
from spnerf_tpu.train.losses import (
    DescriptorLossConfig,
    descriptor_loss_from_cells,
    descriptor_loss_normalised_blockwise,
)

H, W, C = 480, 640, 256
Hc, Wc = H // 8, W // 8


def peak_mb():
    stats = jax.devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", 0) / 1e6


def bench(fn, args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    dcfg = DescriptorLossConfig()
    key = jax.random.PRNGKey(0)

    for B in (2, 8):
        ka, kb, kc = jax.random.split(key, 3)
        A = jax.random.normal(ka, (B, Hc, Wc, C), jnp.float32)
        Bm = jax.random.normal(kb, (B, Hc, Wc, C), jnp.float32)
        # warped cell coords: cell centers + noise, shape (B, N, 2)
        ys, xs = jnp.meshgrid(jnp.arange(Hc) * 8.0 + 4, jnp.arange(Wc) * 8.0 + 4,
                              indexing="ij")
        cells = jnp.stack([ys.ravel(), xs.ravel()], -1)
        wcells = cells[None] + jax.random.normal(kc, (B, Hc * Wc, 2)) * 6.0

        ncfg = DescriptorLossConfig(normalise_descriptors=True)

        def dense_loss(a, bm, wc):
            loss, pos, neg = descriptor_loss_from_cells(a, bm, wc, dcfg)
            return loss

        def pallas_loss(a, bm, wc):
            loss, pos, neg = descriptor_loss_pallas(a, bm, wc, dcfg)
            return loss

        def norm_blockwise_loss(a, bm, wc):
            loss, pos, neg = descriptor_loss_normalised_blockwise(
                a, bm, wc, ncfg)
            return loss

        def norm_dense_loss(a, bm, wc):
            loss, pos, neg = descriptor_loss_from_cells(a, bm, wc, ncfg)
            return loss

        # low-memory paths first: peak_bytes_in_use is monotone since
        # process start, so measure them before the dense ones
        for name, fn in (("pallas", pallas_loss),
                         ("norm_blockwise", norm_blockwise_loss),
                         ("dense", dense_loss),
                         ("norm_dense", norm_dense_loss)):
            g = jax.jit(jax.grad(fn))
            try:
                ms, _ = bench(g, (A, Bm, wcells))
                print(f"B={B} {name:6s} value+grad {ms:8.2f} ms/step  "
                      f"peak {peak_mb():8.0f} MB", flush=True)
            except Exception as e:  # dense at b8 may OOM — that IS the result
                print(f"B={B} {name:6s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
