"""Microbenchmark round 2: overhead-amortized matmul rates + Pallas
conv-kernel compute rate.

Everything runs as ONE jitted program per measurement (lax.scan inside),
so the ~4 ms dispatch overhead of this tunneled chip amortizes away and
the numbers reflect sustained rates — the basis for choosing the round-2
SuperPoint conv formulation.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def bench_scan_matmul(M, K, N, dtype, steps=24, nbuf=4):
    key = jax.random.PRNGKey(0)
    if dtype == "int8":
        xs = jax.random.randint(key, (nbuf, M, K), -127, 127, jnp.int8)
        w = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        pref = jnp.int32
    else:
        xs = jax.random.normal(key, (nbuf, M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.bfloat16)
        pref = jnp.float32

    @jax.jit
    def f(xs, w):
        def body(acc, i):
            x = jax.lax.dynamic_index_in_dim(xs, i % nbuf, 0, keepdims=False)
            y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pref)
            return acc + y[:1].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.zeros((1, N), jnp.float32),
                              jnp.arange(steps))
        return acc

    dt = timeit(f, xs, w)
    gmacs = M * K * N * steps / 1e9
    print(f"scan-matmul {dtype:5s} ({M},{K})@({K},{N}) x{steps}: "
          f"{dt*1e3:7.2f} ms  {gmacs/dt:8.1f} GMAC/s")
    return gmacs / dt


def bench_pallas_conv_rate(C, dtype, Hb=8, W=640, n=480):
    """Non-halo 9-tap accumulation kernel: measures pure compute rate of
    the conv formulation (correctness at band edges intentionally ignored
    here; the real kernel adds halo DMA)."""
    if dtype == "int8":
        idt, pref = jnp.int8, jnp.int32
        x = jax.random.randint(jax.random.PRNGKey(0), (n, Hb, W + 2, C), -127, 127, idt)
        w = jax.random.randint(jax.random.PRNGKey(1), (9, C, C), -127, 127, idt)
    else:
        idt, pref = jnp.bfloat16, jnp.float32
        x = jax.random.normal(jax.random.PRNGKey(0), (n, Hb, W + 2, C), idt)
        w = jax.random.normal(jax.random.PRNGKey(1), (9, C, C), idt)

    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((Hb * W, C), pref)
        for dy in range(3):
            for dx in range(3):
                xs = x_ref[0, :, dx:dx + W, :]
                acc += jnp.dot(xs.reshape(Hb * W, C), w_ref[dy * 3 + dx],
                               preferred_element_type=pref)
        o_ref[0] = jnp.maximum(acc, 0).reshape(Hb, W, C).astype(idt)

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, Hb, W + 2, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Hb, W, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, Hb, W, C), idt),
        )(x, w)

    try:
        dt = timeit(f, x, w)
    except Exception as e:
        print(f"pallas-conv {dtype} C={C}: FAIL "
              f"{type(e).__name__}: {str(e).splitlines()[0][:160]}")
        return 0.0
    gmacs = n * Hb * W * 9 * C * C / 1e9
    print(f"pallas-conv {dtype:5s} C={C:3d} ({n} bands of {Hb}x{W}): "
          f"{dt*1e3:7.2f} ms  {gmacs/dt:8.1f} GMAC/s")
    return gmacs / dt


def main():
    print(f"devices: {jax.devices()}")
    M = 1 << 18
    for dt_ in ("bf16", "int8"):
        bench_scan_matmul(M, 128, 128, dt_)
        bench_scan_matmul(M, 64, 64, dt_)
        bench_scan_matmul(M // 2, 576, 64, dt_)
        bench_scan_matmul(M // 2, 1152, 128, dt_)
    for dt_ in ("bf16", "int8"):
        bench_pallas_conv_rate(128, dt_)
        bench_pallas_conv_rate(64, dt_)
        bench_pallas_conv_rate(256, dt_, W=320)


if __name__ == "__main__":
    main()
