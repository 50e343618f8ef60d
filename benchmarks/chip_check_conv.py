"""On-chip validation + rate measurement of conv_stack_pallas kernels."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax
import jax.numpy as jnp
from spnerf_tpu.kernels.conv_stack_pallas import (
    conv1_packed, conv3x3_pallas, dot_bias_act_pallas, pack_pairs,
    packed_conv3x3_pallas, unpack_pairs,
)

rng = np.random.default_rng(0)


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def timeit(fn, *a, iters=5):
    out = fn(*a)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    sync(out)
    return (time.perf_counter() - t0) / iters


def ref_conv(x, w, mult, bias, relu=True):
    acc = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = acc * mult + bias
    return jnp.maximum(y, 0.0) if relu else y


def check(name, mine, ref_q):
    ok = np.array_equal(np.asarray(mine), ref_q)
    if not ok:
        d = np.abs(np.asarray(mine).astype(int) - ref_q.astype(int))
        print(f"{name}: MISMATCH maxdiff={d.max()} frac={np.mean(d>0):.4f}")
    else:
        print(f"{name}: exact match")


# correctness: plain int8
B, H, W, C = 2, 32, 256, 128
x = jnp.asarray(rng.integers(-5, 5, (B, H, W, C)), jnp.int8)
w = jnp.asarray(rng.integers(-3, 3, (3, 3, C, C)), jnp.int8)
mult = jnp.asarray(rng.uniform(0.01, 0.02, (C,)), jnp.float32)
bias = jnp.asarray(rng.uniform(-1, 1, (C,)), jnp.float32)
out = conv3x3_pallas(x, w, mult, bias, out_dtype=jnp.int8, interpret=False)
refq = np.clip(np.round(np.asarray(ref_conv(x, w, mult, bias))), -127, 127).astype(np.int8)
check("plain int8", out, refq)

# correctness: packed int8
xp64 = jnp.asarray(rng.integers(-5, 5, (B, H, 64, 64)), jnp.int8)
w64 = jnp.asarray(rng.integers(-3, 3, (3, 3, 64, 64)), jnp.int8)
m64 = jnp.full((64,), 0.02, jnp.float32)
b64 = jnp.zeros((64,), jnp.float32)
outp = unpack_pairs(packed_conv3x3_pallas(pack_pairs(xp64), w64, m64, b64,
                                          out_dtype=jnp.int8, interpret=False))
refq2 = np.clip(np.round(np.asarray(ref_conv(xp64, w64, m64, b64))), -127, 127).astype(np.int8)
check("packed int8", outp, refq2)

# correctness: conv1
x1 = jnp.asarray(rng.random((2, 32, 64, 1)), jnp.float32)
w1 = jnp.asarray(rng.standard_normal((3, 3, 1, 64)) * 0.3, jnp.float32)
o1 = unpack_pairs(conv1_packed(x1, w1, jnp.ones((64,)), jnp.zeros((64,)),
                               out_dtype=jnp.float32))
r1 = np.asarray(ref_conv(x1, w1, 1.0, 0.0))
err = np.max(np.abs(np.asarray(o1) - r1))
print(f"conv1 maxerr {err:.2e}")

# ------- rates at production shapes (batch 64) -------
B = 64


def rate(name, fn, args, real_gmacs):
    f = jax.jit(fn)
    try:
        dt = timeit(f, *args)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e).splitlines()[0][:140]}")
        return
    print(f"{name}: {dt*1e3:7.2f} ms  {real_gmacs/dt:7.1f} real GMAC/s")


# conv2 packed: 480x640x64->64
xq = jnp.asarray(rng.integers(-30, 30, (B, 480, 320, 128)), jnp.int8)
wq = jnp.asarray(rng.integers(-30, 30, (3, 3, 64, 64)), jnp.int8)
rate("conv2 packed int8",
     lambda a, b: packed_conv3x3_pallas(a, b, m64, b64, interpret=False),
     (xq, wq), B * 480 * 640 * 9 * 64 * 64 / 1e9)

# conv3 packed: 240x320
xq3 = jnp.asarray(rng.integers(-30, 30, (B, 240, 160, 128)), jnp.int8)
rate("conv3 packed int8",
     lambda a, b: packed_conv3x3_pallas(a, b, m64, b64, interpret=False),
     (xq3, wq), B * 240 * 320 * 9 * 64 * 64 / 1e9)

# conv6 plain: 120x160x128
xq6 = jnp.asarray(rng.integers(-30, 30, (B, 120, 160, 128)), jnp.int8)
wq6 = jnp.asarray(rng.integers(-30, 30, (3, 3, 128, 128)), jnp.int8)
rate("conv6 plain int8",
     lambda a, b: conv3x3_pallas(a, b, mult, bias, interpret=False),
     (xq6, wq6), B * 120 * 160 * 9 * 128 * 128 / 1e9)

# conv7 plain: 60x80x128
xq7 = jnp.asarray(rng.integers(-30, 30, (B, 60, 80, 128)), jnp.int8)
rate("conv7 plain int8",
     lambda a, b: conv3x3_pallas(a, b, mult, bias, interpret=False),
     (xq7, wq6), B * 60 * 80 * 9 * 128 * 128 / 1e9)

# convPa plain: 60x80 128->256
wpa = jnp.asarray(rng.integers(-30, 30, (3, 3, 128, 256)), jnp.int8)
m256 = jnp.full((256,), 0.01, jnp.float32)
b256 = jnp.zeros((256,), jnp.float32)
rate("convPa plain int8",
     lambda a, b: conv3x3_pallas(a, b, m256, b256, interpret=False),
     (xq7, wpa), B * 60 * 80 * 9 * 128 * 256 / 1e9)

# conv1: 480x640
x1b = jnp.asarray(rng.random((B, 480, 640, 1)), jnp.float32)
w1b = jnp.asarray(rng.standard_normal((3, 3, 1, 64)) * 0.3, jnp.float32)
rate("conv1 packed",
     lambda a, b: conv1_packed(a, b, jnp.ones((64,)) * 50, jnp.zeros((64,)),
                               out_dtype=jnp.int8),
     (x1b, w1b), B * 480 * 640 * 9 * 64 / 1e9)

# convPb dot: 60x80 256->128pad(65)
xpb = jnp.asarray(rng.integers(-30, 30, (B, 60, 80, 256)), jnp.int8)
wpb = jnp.asarray(rng.integers(-30, 30, (256, 128)), jnp.int8)
m128 = jnp.full((128,), 0.01, jnp.float32)
b128 = jnp.zeros((128,), jnp.float32)
rate("convPb dot int8",
     lambda a, b: dot_bias_act_pallas(a, b, m128, b128, relu=False,
                                      out_dtype=jnp.bfloat16, interpret=False),
     (xpb, wpb), B * 60 * 80 * 256 * 128 / 1e9)
