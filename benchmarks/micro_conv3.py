"""Microbenchmark round 3: conv-kernel variants + conv1 formulations.

Decides (a) whether the Pallas conv should accumulate 9 (M,C)@(C,C)
dots or concatenate taps into one (M,9C)@(9C,C) dot, (b) the row-band
size, and (c) how to compute the pathological C_in=1 first conv.
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


def bench_pallas_conv(C, dtype, Hb=8, W=640, n=480, concat=False, label=""):
    if dtype == "int8":
        idt, pref = jnp.int8, jnp.int32
    else:
        idt, pref = jnp.bfloat16, jnp.float32
    if dtype == "int8":
        x = jax.random.randint(jax.random.PRNGKey(0), (n, Hb, W + 2, C), -127, 127, idt)
        w9 = jax.random.randint(jax.random.PRNGKey(1), (9, C, C), -127, 127, idt)
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (n, Hb, W + 2, C), idt)
        w9 = jax.random.normal(jax.random.PRNGKey(1), (9, C, C), idt)
    wc = w9.reshape(9 * C, C)

    def kernel_acc(x_ref, w_ref, o_ref):
        acc = jnp.zeros((Hb * W, C), pref)
        for dy in range(3):
            for dx in range(3):
                xs = x_ref[0, :, dx:dx + W, :]
                acc += jnp.dot(xs.reshape(Hb * W, C), w_ref[dy * 3 + dx],
                               preferred_element_type=pref)
        o_ref[0] = jnp.maximum(acc, 0).reshape(Hb, W, C).astype(idt)

    def kernel_concat(x_ref, w_ref, o_ref):
        taps = []
        for dy in range(3):
            for dx in range(3):
                taps.append(x_ref[0, :, dx:dx + W, :].reshape(Hb * W, C))
        patches = jnp.concatenate(taps, axis=1)  # (M, 9C) lane-aligned
        acc = jnp.dot(patches, w_ref[:], preferred_element_type=pref)
        o_ref[0] = jnp.maximum(acc, 0).reshape(Hb, W, C).astype(idt)

    kern = kernel_concat if concat else kernel_acc
    w = wc if concat else w9
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kern,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, Hb, W + 2, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                wspec,
            ],
            out_specs=pl.BlockSpec((1, Hb, W, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, Hb, W, C), idt),
        )(x, w)

    try:
        dt = timeit(f, x, w)
    except Exception as e:
        print(f"pconv {label} {dtype} C={C} Hb={Hb}: FAIL "
              f"{type(e).__name__}: {str(e).splitlines()[0][:140]}")
        return
    gmacs = n * Hb * W * 9 * C * C / 1e9
    print(f"pconv {label:8s} {dtype:5s} C={C:3d} Hb={Hb:2d}: {dt*1e3:7.2f} ms  "
          f"{gmacs/dt:8.1f} GMAC/s")


# ---------------------------------------------------------------- conv1

B, H, W1 = 64, 480, 640


def bench_conv1(mode):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W1, 1), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 1, 64), jnp.bfloat16)

    if mode == "xla_nhwc":
        @jax.jit
        def f(x, k):
            return jnp.maximum(jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32), 0).astype(jnp.bfloat16)
    elif mode == "xla_nchw":
        @jax.jit
        def f(x, k):
            xt = x.reshape(B, 1, H, W1)
            y = jax.lax.conv_general_dilated(
                xt, k.transpose(3, 2, 0, 1), (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y, 0).astype(jnp.bfloat16).transpose(0, 2, 3, 1)
    elif mode in ("fma", "fma_packed"):
        @jax.jit
        def f(x, k):
            xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)))
            acc = jnp.zeros((B, H, W1, 64), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    xs = jax.lax.dynamic_slice(xp, (0, dy, dx), (B, H, W1))
                    acc = acc + xs[..., None].astype(jnp.float32) * \
                        k[dy, dx, 0].astype(jnp.float32)
            y = jnp.maximum(acc, 0).astype(jnp.bfloat16)
            if mode == "fma_packed":
                y = y.reshape(B, H, W1 // 2, 128)
            return y
    dt = timeit(f, x, k)
    print(f"conv1 {mode:12s}: {dt*1e3:7.2f} ms/batch{B}")


def main():
    print(f"devices: {jax.devices()}")
    for concat in (False, True):
        label = "concat" if concat else "acc9"
        bench_pallas_conv(128, "int8", Hb=8, concat=concat, label=label)
        bench_pallas_conv(128, "int8", Hb=16, concat=concat, label=label)
        bench_pallas_conv(128, "bf16", Hb=16, concat=concat, label=label)
        bench_pallas_conv(256, "int8", Hb=16, W=320, concat=concat, label=label)
    bench_pallas_conv(128, "int8", Hb=32, concat=True, label="concat")
    for mode in ("xla_nhwc", "xla_nchw", "fma", "fma_packed"):
        bench_conv1(mode)


if __name__ == "__main__":
    main()
