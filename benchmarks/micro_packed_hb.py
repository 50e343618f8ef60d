"""Sweep packed_conv3x3_pallas band size at the block3/4 shape
(240x320 packed, batch 64) — the largest single chunk of backbone time
after the conv12 entry kernel. Round-2 swept to hb=48; hb=60 fits the
5 MB accumulator budget and halves the band count vs 30.
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

from spnerf_tpu.kernels.conv_stack_pallas import packed_conv3x3_pallas

B, H, Wp, C2 = 64, 240, 160, 128


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-5, 5, (B, H, Wp, C2)), jnp.int8)
    w = jnp.asarray(rng.integers(-3, 3, (3, 3, 64, 64)), jnp.int8)
    mult = jnp.full((64,), 0.01, jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    for pool in (False, True):
        for hb in (30, 40, 48, 60):
            if H % hb:
                continue
            try:
                f = jax.jit(lambda a, hb=hb, p=pool: packed_conv3x3_pallas(
                    a, w, mult, bias, out_dtype=jnp.int8, hb=hb, pool=p))
                out = f(x)
                np.asarray(out[:1, :1])
                t0 = time.perf_counter()
                for _ in range(10):
                    out = f(x)
                np.asarray(out[:1, :1])
                ms = (time.perf_counter() - t0) / 10 * 1e3
                print(f"pool={pool} hb={hb:2d}: {ms:7.2f} ms", flush=True)
            except Exception as e:
                print(f"pool={pool} hb={hb:2d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
