"""Fused conv1+conv2+pool kernel vs the unfused reference composition.

Reference semantics: image -> conv3x3(1->64)+ReLU -> conv3x3(64->64)
+ReLU -> maxpool2x2 (VGG_Backbone.py:44-47), with the serving stack's
int8 quantization at each stage. The fused kernel must match the
composition of those stages bit-exactly (same quantization points).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.kernels.conv12_fused_pallas import (
    conv12_fused,
    quantize_conv1_weights,
)
from spnerf_tpu.kernels.conv_stack_pallas import unpack_pairs


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _reference(image, k1, mult1, bias1, w2q, mult2, bias2, pool=True):
    """Unfused: int8-quantized image -> f32 conv1 -> int8 -> int8 conv2
    -> int8 -> maxpool — the exact arithmetic the kernel fuses."""
    xq = np.clip(np.round(np.asarray(image[..., 0]) * 127.0), -127, 127)
    a0 = jnp.asarray(xq, jnp.float32)[..., None]
    # mirror the kernel's conv1 weight quantization point: int8 weights,
    # dequant scale folded into the requant multiplier
    kq1, s1w = quantize_conv1_weights(k1)
    acc1 = jax.lax.conv_general_dilated(
        a0, kq1.astype(jnp.float32)[:, :, None, :], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a1 = jnp.maximum(acc1 * (mult1 * s1w) + bias1, 0.0)
    a1q = jnp.clip(jnp.round(a1), -127, 127)
    acc2 = jax.lax.conv_general_dilated(
        a1q, jnp.asarray(w2q, jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a2 = jnp.maximum(acc2 * mult2 + bias2, 0.0)
    a2q = np.clip(np.round(np.asarray(a2)), -127, 127).astype(np.int8)
    if not pool:
        return a2q
    B, H, W, C = a2q.shape
    return a2q.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))


def _setup(rng, B=2, H=16, W=32):
    image = jnp.asarray(rng.random((B, H, W, 1)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 1, 64)) * 0.3, jnp.float32)
    mult1 = jnp.asarray(rng.uniform(0.01, 0.03, (64,)), jnp.float32)
    bias1 = jnp.asarray(rng.uniform(-1, 1, (64,)), jnp.float32)
    w2q = jnp.asarray(rng.integers(-20, 20, (3, 3, 64, 64)), jnp.int8)
    mult2 = jnp.asarray(rng.uniform(0.001, 0.003, (64,)), jnp.float32)
    bias2 = jnp.asarray(rng.uniform(-1, 1, (64,)), jnp.float32)
    return image, k1, mult1, bias1, w2q, mult2, bias2


@pytest.mark.parametrize("pool", [True, False])
def test_conv12_fused_matches_reference(rng, pool):
    image, k1, mult1, bias1, w2q, mult2, bias2 = _setup(rng)
    out = conv12_fused(image, k1, mult1, bias1, w2q, mult2, bias2,
                       pool=pool, hb=8)
    got = np.asarray(unpack_pairs(out))
    want = _reference(image, k1, mult1, bias1, w2q, mult2, bias2, pool=pool)
    mismatch = np.mean(got != want)
    # round-at-0.5 boundary cases may flip +-1 LSB between f32 paths
    assert mismatch < 1e-3, mismatch
    np.testing.assert_allclose(got.astype(int), want.astype(int), atol=1)


def test_conv12_band_boundaries(rng):
    """Band decomposition must be seamless: compare hb=4 vs hb=16."""
    image, k1, mult1, bias1, w2q, mult2, bias2 = _setup(rng, B=1, H=16, W=16)
    a = conv12_fused(image, k1, mult1, bias1, w2q, mult2, bias2,
                     pool=False, hb=4)
    b = conv12_fused(image, k1, mult1, bias1, w2q, mult2, bias2,
                     pool=False, hb=16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
