import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.geometry.homography import HomographyConfig, sample_homography
from spnerf_tpu.ops.image_warp import warp_image, warp_image_matmul
import pytest


@pytest.mark.slow
def test_matmul_warp_matches_gather_warp(rng):
    B, H, W = 3, 48, 64
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32))
    cfg = HomographyConfig(allow_artifacts=True, patch_ratio=0.8,
                           scaling_amplitude=0.2)
    Hs = jax.vmap(lambda k: sample_homography(k, (H, W), cfg))(
        jax.random.split(jax.random.PRNGKey(0), B))
    a = np.asarray(warp_image(img, Hs, mode="bilinear"))
    b = np.asarray(warp_image_matmul(img, Hs))
    np.testing.assert_allclose(b, a, atol=2e-3)


def test_matmul_warp_identity(rng):
    img = jnp.asarray(rng.uniform(0, 1, (2, 24, 40, 1)).astype(np.float32))
    out = np.asarray(warp_image_matmul(img, jnp.tile(jnp.eye(3)[None], (2, 1, 1))))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-5)


def test_matmul_warp_translation_zero_pads():
    img = jnp.ones((1, 16, 16, 1))
    H = jnp.array([[[1.0, 0.0, 5.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]])
    out = np.asarray(warp_image_matmul(img, H))[0, ..., 0]
    assert out[:, :4].max() < 1e-6  # shifted-in region is zero
    assert out[:, 6:].min() > 0.99


def test_warp_matmul_bf16_close_to_f32():
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((2, 48, 64, 1)), jnp.float32)
    H = jnp.asarray([np.eye(3), [[0.9, 0.1, 3.0], [-0.05, 1.05, -2.0],
                                 [1e-4, -5e-5, 1.0]]], jnp.float32)
    a = warp_image_matmul(img, H)
    b = warp_image_matmul(img, H, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-2, rtol=0)
    assert float(jnp.mean(jnp.abs(a - b))) < 3e-3


def test_warp_matmul_int8_close_to_f32():
    """7-bit fixed-point warp: worst-case ~0.8% of range on [0,1] images."""
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((2, 48, 64, 1)), jnp.float32)
    H = jnp.asarray([np.eye(3), [[0.9, 0.1, 3.0], [-0.05, 1.05, -2.0],
                                 [1e-4, -5e-5, 1.0]]], jnp.float32)
    a = warp_image_matmul(img, H)
    b = warp_image_matmul(img, H, compute_dtype=jnp.int8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2.5e-2, rtol=0)
    assert float(jnp.mean(jnp.abs(a - b))) < 8e-3


@pytest.mark.slow
def test_warp_fused_pallas_matches_matmul():
    from spnerf_tpu.kernels.warp_pallas import warp_image_fused

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((2, 48, 64, 1)), jnp.float32)
    cfg = HomographyConfig(allow_artifacts=True, patch_ratio=0.8,
                           scaling_amplitude=0.2, max_angle=1.57)
    Hs = jax.vmap(lambda k: sample_homography(k, (48, 64), cfg))(
        jax.random.split(jax.random.PRNGKey(2), 2))
    ref = np.asarray(warp_image_matmul(img, Hs))
    for dt, atol in ((jnp.float32, 1e-4), (jnp.bfloat16, 2e-2),
                     (jnp.int8, 2.5e-2)):
        got = np.asarray(warp_image_fused(img, Hs, compute_dtype=dt))
        np.testing.assert_allclose(got, ref, atol=atol, rtol=0,
                                   err_msg=str(dt))


def test_warp_fused_pallas_non_divisible_rows():
    from spnerf_tpu.kernels.warp_pallas import warp_image_fused

    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.random((1, 40, 64, 1)), jnp.float32)  # 40 % 16 != 0
    H = jnp.asarray([[[0.95, 0.05, 2.0], [-0.02, 1.03, -1.0],
                      [1e-4, 0.0, 1.0]]], jnp.float32)
    ref = np.asarray(warp_image_matmul(img, H))
    got = np.asarray(warp_image_fused(img, H, compute_dtype=jnp.float32))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=0)
