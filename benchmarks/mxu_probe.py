"""MXU rate probes backing the PERF.md renderer speed-of-light analysis.

Three regimes on the tunneled chip:
  1. deep-scan: depth-chained (R, K) @ (K, N) inside ONE jit call
     (amortizes the ~10ms per-dispatch tunnel latency);
  2. square: one big square matmul (upper bound incl. dispatch);
  3. pallas-chain: a dependent matmul chain inside a Mosaic kernel,
     bf16 vs int8 — measures whether int8 has any MXU rate advantage
     (round-4 v5e answer: none, 3.9 vs 3.7 TOP/s).
Run: python benchmarks/mxu_probe.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def deep_scan(R, K, N, depth=384, iters=5):
    x = jnp.ones((R, K), jnp.bfloat16)
    w = jnp.ones((depth, K, N), jnp.bfloat16)

    @jax.jit
    def f(x, w):
        def body(h, wi):
            return jnp.maximum(
                jnp.dot(h, wi, preferred_element_type=jnp.float32),
                0).astype(jnp.bfloat16), 0
        h, _ = jax.lax.scan(body, x, w)
        return h

    np.asarray(f(x, w)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(x, w)
    np.asarray(o[:1])
    dt = time.perf_counter() - t0
    print(f"deep-scan R={R} K={K} N={N} depth={depth}: "
          f"{2*R*K*N*depth*iters/dt/1e12:.1f} TFLOP/s")


def square(M, iters=3):
    a = jnp.ones((M, M), jnp.bfloat16)
    f = jax.jit(lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    np.asarray(f(a, a)[:1, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(a, a)
    np.asarray(o[:1, :1])
    dt = time.perf_counter() - t0
    print(f"square {M}^3: {2*M**3*iters/dt/1e12:.1f} TFLOP/s (incl dispatch)")


def pallas_chain(dtype, depth=32, R=8192, K=128, N=128, iters=20):
    def kern(x_ref, w_ref, o_ref):
        x = x_ref[...]
        for _ in range(depth):
            if dtype == jnp.int8:
                a = jax.lax.dot_general(
                    x, w_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                x = jnp.clip(a >> 7, -127, 127).astype(jnp.int8)
            else:
                a = jnp.dot(x, w_ref[...],
                            preferred_element_type=jnp.float32)
                x = jnp.maximum(a, 0).astype(dtype)
        o_ref[...] = x

    x = jnp.ones((R, K), dtype)
    w = jnp.ones((K, N), dtype)
    f = jax.jit(pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((R, K), lambda i: (0, 0)),
                  pl.BlockSpec((K, N), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((R, N), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, N), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20)))
    np.asarray(f(x, w)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(x, w)
    np.asarray(o[:1])
    dt = time.perf_counter() - t0
    print(f"pallas-chain {np.dtype(dtype).name}: "
          f"{2*R*K*N*depth*iters/dt/1e12:.1f} TOP/s")


if __name__ == "__main__":
    deep_scan(4096, 128, 128)
    deep_scan(16384, 128, 128, depth=96)
    deep_scan(8192, 512, 512, depth=24)
    square(8192)
    pallas_chain(jnp.bfloat16)
    pallas_chain(jnp.int8)
