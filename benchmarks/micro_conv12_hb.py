"""Sweep the conv12_fused row-band size hb on chip (480x640, batch 64).

hb trades per-block dispatch overhead against VMEM (conv1 Toeplitz acc
is (Wp, (hb+2)*128) i32, conv2 acc (hb*Wp, 128) i32). hb=16 shipped in
round 3; larger bands amortize better if they still fit scoped VMEM.
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.kernels.conv12_fused_pallas import conv12_fused

H, W, B = 480, 640, 64


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, 1)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 1, 64)) * 0.3, jnp.float32)
    m1 = jnp.full((64,), 0.02, jnp.float32)
    b1 = jnp.zeros((64,), jnp.float32)
    w2 = jnp.asarray(rng.integers(-3, 3, (3, 3, 64, 64)), jnp.int8)
    m2 = jnp.full((64,), 0.01, jnp.float32)
    b2 = jnp.zeros((64,), jnp.float32)

    ref = None
    for hb in (16, 20, 24, 30, 32):
        if H % hb:
            continue
        try:
            f = jax.jit(lambda im, hb=hb: conv12_fused(
                im, k1, m1, b1, w2, m2, b2, pool=True, out_dtype=jnp.int8,
                hb=hb))
            out = f(x)
            np.asarray(out[:1, :1])
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(x)
            np.asarray(out[:1, :1])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            if ref is None:
                ref = np.asarray(out)
                same = True
            else:
                same = bool(np.array_equal(ref, np.asarray(out)))
            print(f"hb={hb:2d}: {ms:7.2f} ms/batch-64  match_hb16={same}",
                  flush=True)
        except Exception as e:
            print(f"hb={hb:2d}: FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
