"""conv_stack_pallas kernels vs XLA convolutions (interpret mode on CPU).

The serving conv stack (kernels/conv_stack_pallas.py) reformulates the
reference VGG convs (VGG_Backbone.py:40-70) as Pallas matmul kernels;
these tests pin exact int8 numerics and bf16 tolerance against
lax.conv_general_dilated on every flavor: plain, W-pair packed, the
packed first conv, and the 1x1 dot kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.kernels.conv_stack_pallas import (
    conv1_packed,
    conv1_patches,
    conv3x3_pallas,
    dot_bias_act_pallas,
    maxpool2x2_packed,
    pack_conv1_weights,
    pack_pairs,
    packed_conv3x3_pallas,
    unpack_pairs,
)


def ref_conv(x, w, mult, bias, relu=True):
    acc = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = acc * mult + bias
    return jnp.maximum(y, 0.0) if relu else y


def quant_ref(y):
    return np.clip(np.round(np.asarray(y)), -127, 127).astype(np.int8)


def test_conv3x3_int8_exact(rng):
    B, H, W, C = 2, 16, 256, 128
    x = jnp.asarray(rng.integers(-5, 5, (B, H, W, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-3, 3, (3, 3, C, C)), jnp.int8)
    mult = jnp.asarray(rng.uniform(0.01, 0.02, (C,)), jnp.float32)
    bias = jnp.asarray(rng.uniform(-1, 1, (C,)), jnp.float32)
    out = conv3x3_pallas(x, w, mult, bias, out_dtype=jnp.int8)
    ref = quant_ref(ref_conv(x, w, mult, bias))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_conv3x3_bf16(rng):
    B, H, W, C = 1, 8, 256, 128
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((C)), jnp.float32)
    out = conv3x3_pallas(x, w, jnp.ones((C,)), bias, out_dtype=jnp.bfloat16)
    ref = ref_conv(x, w, 1.0, bias)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.05)


def test_packed_conv_int8_exact(rng):
    B, H, W, C = 2, 16, 64, 64
    x = jnp.asarray(rng.integers(-5, 5, (B, H, W, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-3, 3, (3, 3, C, C)), jnp.int8)
    mult = jnp.asarray(rng.uniform(0.01, 0.02, (C,)), jnp.float32)
    bias = jnp.asarray(rng.uniform(-1, 1, (C,)), jnp.float32)
    out_p = packed_conv3x3_pallas(pack_pairs(x), w, mult, bias,
                                  out_dtype=jnp.int8)
    out = unpack_pairs(out_p)
    ref = quant_ref(ref_conv(x, w, mult, bias))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_packed_conv_changes_cout(rng):
    B, H, W, C, Co = 1, 8, 32, 64, 128
    x = jnp.asarray(rng.integers(-4, 4, (B, H, W, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-2, 2, (3, 3, C, Co)), jnp.int8)
    mult = jnp.full((Co,), 0.02, jnp.float32)
    bias = jnp.zeros((Co,), jnp.float32)
    out = unpack_pairs(packed_conv3x3_pallas(pack_pairs(x), w, mult, bias))
    ref = quant_ref(ref_conv(x, w, mult, bias))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_conv1_packed_matches_xla(rng):
    B, H, W = 2, 16, 64
    x = jnp.asarray(rng.random((B, H, W, 1)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 1, 64)) * 0.3, jnp.float32)
    mult = jnp.full((64,), 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((64)) * 0.1, jnp.float32)
    out = unpack_pairs(conv1_packed(x, w1, mult, bias,
                                    out_dtype=jnp.float32))
    ref = ref_conv(x, w1, 1.0, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=1e-4)


def test_conv1_patches_shape_and_content(rng):
    x = jnp.asarray(np.arange(2 * 4 * 8).reshape(2, 4, 8, 1), jnp.float32)
    p = conv1_patches(x)
    assert p.shape == (2, 4, 4, 18)
    # center tap (dy=1, dj=1, c=0) must be the pair's first pixel
    np.testing.assert_array_equal(np.asarray(p[..., 8]),
                                  np.asarray(x[:, :, 0::2, 0]))


def test_dot_bias_act(rng):
    x = jnp.asarray(rng.integers(-5, 5, (4, 8, 16, 256)), jnp.int8)
    w = jnp.asarray(rng.integers(-3, 3, (256, 128)), jnp.int8)
    mult = jnp.full((128,), 0.01, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((128)), jnp.float32)
    out = dot_bias_act_pallas(x, w, mult, bias, relu=False,
                              out_dtype=jnp.bfloat16)
    ref = jnp.einsum("bhwc,cd->bhwd", x.astype(jnp.float32),
                     w.astype(jnp.float32)) * mult + bias
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=1e-2, atol=0.5)


def test_maxpool_packed(rng):
    x = jnp.asarray(rng.integers(-50, 50, (2, 8, 32, 64)), jnp.int8)
    pooled_ref = jax.lax.reduce_window(
        x.astype(jnp.float32), -jnp.inf, jax.lax.max, (1, 2, 2, 1),
        (1, 2, 2, 1), "VALID",
    ).astype(jnp.int8)
    out = unpack_pairs(maxpool2x2_packed(pack_pairs(x)))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(pooled_ref))


def test_plain_conv_fused_pool(rng):
    x = jnp.asarray(rng.integers(-5, 5, (2, 8, 16, 128)), jnp.int8)
    w = jnp.asarray(rng.integers(-3, 3, (3, 3, 128, 128)), jnp.int8)
    mult = jnp.full((128,), 0.02, jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    full = conv3x3_pallas(x, w, mult, bias, out_dtype=jnp.int8)
    pooled = conv3x3_pallas(x, w, mult, bias, out_dtype=jnp.int8, pool=True)
    ref = np.asarray(full).reshape(2, 4, 2, 8, 2, 128).max(axis=(2, 4))
    np.testing.assert_array_equal(np.asarray(pooled), ref)


def test_packed_conv_fused_pool(rng):
    x = jnp.asarray(rng.integers(-5, 5, (2, 8, 16, 64)), jnp.int8)
    w = jnp.asarray(rng.integers(-3, 3, (3, 3, 64, 64)), jnp.int8)
    mult = jnp.full((64,), 0.02, jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    xp = pack_pairs(x)
    full = unpack_pairs(
        packed_conv3x3_pallas(xp, w, mult, bias, out_dtype=jnp.int8))
    pooled = unpack_pairs(packed_conv3x3_pallas(
        xp, w, mult, bias, out_dtype=jnp.int8, pool=True))
    ref = np.asarray(full).reshape(2, 4, 2, 8, 2, 64).max(axis=(2, 4))
    np.testing.assert_array_equal(np.asarray(pooled), ref)
