"""Microbenchmark: candidate conv formulations on one chip.

Measures achievable rates for the shapes that dominate SuperPoint's
conv stack (SURVEY.md model spec), to pick the round-2 inference-path
strategy empirically:

  - bf16/int8 matmuls at im2col shapes (M, 9*Cin) @ (9*Cin, Cout)
  - XLA conv_general_dilated bf16 and int8 per layer shape
  - 9-shift matmul-accumulation conv variant

Rates are reported as useful GMAC/s of the underlying conv (not padded
matmul FLOPs), so numbers are directly comparable across formulations.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def _sync(out):
    # Materialize via a scalar fetch: np.asarray of the full array would
    # drag the whole buffer through the tunnel and dominate the timing;
    # block_until_ready alone is unreliable on axon.
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench_matmul(M, K, N, dtype):
    key = jax.random.PRNGKey(0)
    if dtype == "int8":
        a = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        b = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
    else:
        a = jax.random.normal(key, (M, K), jnp.bfloat16)
        b = jax.random.normal(key, (K, N), jnp.bfloat16)
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dt = timeit(f, a, b)
    gmacs = M * K * N / 1e9
    print(f"matmul {dtype:5s} ({M},{K})@({K},{N}): {dt*1e3:7.2f} ms  "
          f"{gmacs/dt:8.1f} GMAC/s  ({2*gmacs/dt/1000:6.1f} TFLOP/s)")
    return gmacs / dt


def bench_conv(B, H, W, Cin, Cout, dtype, k=3):
    key = jax.random.PRNGKey(0)
    if dtype == "int8":
        x = jax.random.randint(key, (B, H, W, Cin), -127, 127, jnp.int8)
        w = jax.random.randint(key, (k, k, Cin, Cout), -127, 127, jnp.int8)
        pref = jnp.int32
    else:
        x = jax.random.normal(key, (B, H, W, Cin), jnp.bfloat16)
        w = jax.random.normal(key, (k, k, Cin, Cout), jnp.bfloat16)
        pref = jnp.float32
    f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref))
    try:
        dt = timeit(f, x, w)
    except Exception as e:
        print(f"conv {dtype} {B}x{H}x{W}x{Cin}->{Cout}: FAILED {type(e).__name__}")
        return 0.0
    gmacs = B * H * W * k * k * Cin * Cout / 1e9
    print(f"conv   {dtype:5s} {B}x{H}x{W} {Cin:3d}->{Cout:3d}: {dt*1e3:7.2f} ms  "
          f"{gmacs/dt:8.1f} GMAC/s  ({2*gmacs/dt/1000:6.1f} TFLOP/s)")
    return gmacs / dt


def bench_shift_conv(B, H, W, C, Cout, dtype):
    """y = sum_taps shift(x) @ W[tap] — conv as 9 accumulated matmuls."""
    key = jax.random.PRNGKey(0)
    if dtype == "int8":
        x = jax.random.randint(key, (B, H, W, C), -127, 127, jnp.int8)
        w = jax.random.randint(key, (9, C, Cout), -127, 127, jnp.int8)
        pref = jnp.int32
    else:
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(key, (9, C, Cout), jnp.bfloat16)
        pref = jnp.float32

    @jax.jit
    def f(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        i = 0
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
                r = jax.lax.dot_general(
                    xs.reshape(-1, C), w[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=pref)
                acc = r if acc is None else acc + r
                i += 1
        return acc

    dt = timeit(f, x, w)
    gmacs = B * H * W * 9 * C * Cout / 1e9
    print(f"shift9 {dtype:5s} {B}x{H}x{W} {C:3d}->{Cout:3d}: {dt*1e3:7.2f} ms  "
          f"{gmacs/dt:8.1f} GMAC/s  ({2*gmacs/dt/1000:6.1f} TFLOP/s)")
    return gmacs / dt


def main():
    print(f"devices: {jax.devices()}")
    M = 1 << 20
    print("-- square reference matmuls --")
    bench_matmul(4096, 4096, 4096, "bf16")
    bench_matmul(8192, 8192, 8192, "bf16")
    bench_matmul(8192, 8192, 8192, "int8")
    print("-- im2col shapes (K = 9*Cin) --")
    for dt_ in ("bf16", "int8"):
        bench_matmul(M, 576, 64, dt_)     # conv2-4 as im2col
        bench_matmul(M, 576, 128, dt_)    # conv5
        bench_matmul(M, 1152, 128, dt_)   # conv6-8
        bench_matmul(M // 2, 1152, 128, dt_)  # pixel-pair packed C64
        bench_matmul(M, 1152, 256, dt_)   # convPa/Da
        bench_matmul(M, 64, 64, dt_)      # single-tap shift conv2-4
        bench_matmul(M, 128, 128, dt_)    # single-tap shift conv6-8
    print("-- XLA convs per layer (batch 8 to keep mem sane) --")
    B = 8
    for dt_ in ("bf16", "int8"):
        bench_conv(B, 480, 640, 1, 64, dt_)
        bench_conv(B, 480, 640, 64, 64, dt_)
        bench_conv(B, 240, 320, 64, 64, dt_)
        bench_conv(B, 120, 160, 64, 128, dt_)
        bench_conv(B, 120, 160, 128, 128, dt_)
        bench_conv(B, 60, 80, 128, 128, dt_)
        bench_conv(B, 60, 80, 128, 256, dt_)
        bench_conv(B, 60, 80, 256, 256, dt_, k=1)
    print("-- shift-conv formulation --")
    for dt_ in ("bf16", "int8"):
        bench_shift_conv(B, 480, 640, 64, 64, dt_)
        bench_shift_conv(B, 120, 160, 128, 128, dt_)


if __name__ == "__main__":
    main()
