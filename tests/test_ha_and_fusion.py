"""Homographic adaptation + NeRF label fusion + descriptor sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.geometry.homography import HomographyConfig
from spnerf_tpu.ops.descriptor_sampling import sample_descriptors
from spnerf_tpu.ops.homography_adaptation import HAConfig, homography_adaptation
from spnerf_tpu.ops.nerf_label_fusion import (
    fuse_nerf_labels,
    splat_reprojected_points,
)
from spnerf_tpu.ops.upsample import upsample_bicubic


def test_homography_adaptation_identity_model():
    """A model that returns a constant heatmap: HA mean must stay close
    to that constant wherever counts > 0."""
    B, H, W = 1, 32, 40

    def prob_fn(images):
        return jnp.full(images.shape[:3], 0.5)

    image = jnp.zeros((B, H, W, 1))
    cfg = HAConfig(num=9, chunk=4, valid_border_margin=0,
                   params=HomographyConfig(allow_artifacts=True, patch_ratio=0.85))
    out = homography_adaptation(prob_fn, image, jax.random.PRNGKey(0), cfg)
    assert out.shape == (B, H, W)
    center = np.asarray(out[0, 10:-10, 10:-10])
    # center pixels are covered by most warps; mean stays near 0.5
    # (bf16 warp matmuls wobble each sample by ~1e-3, see image_warp)
    assert np.all(center <= 0.5 + 3e-3)
    assert center.mean() > 0.35


def test_homography_adaptation_num1_is_plain_forward():
    def prob_fn(images):
        return images[..., 0] * 2.0

    image = jnp.ones((2, 16, 16, 1)) * 0.3
    cfg = HAConfig(num=1)
    out = homography_adaptation(prob_fn, image, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(out), 0.6, atol=1e-6)


def test_splat_reprojected_points():
    prob = jnp.zeros((16, 16)).at[8, 8].set(0.9).at[7, 8].set(0.2)
    src = jnp.array([[8.0, 8.0]])
    dst = jnp.array([[4.0, 4.0]])
    out = np.asarray(splat_reprojected_points(prob, src, dst, jnp.array([True])))
    # 3x3 patch around source (8,8) lands around target (4,4)
    assert out[4, 4] == pytest.approx(0.9)
    assert out[3, 4] == pytest.approx(0.2)  # (7,8) -> offset (-1,0)
    assert out.sum() == pytest.approx(1.1, abs=1e-5)


def test_splat_border_single_pixel():
    prob = jnp.zeros((16, 16)).at[1, 1].set(0.7)
    src = jnp.array([[1.0, 1.0]])
    dst = jnp.array([[5.0, 5.0]])
    out = np.asarray(splat_reprojected_points(prob, src, dst, jnp.array([True])))
    assert out[5, 5] == pytest.approx(0.7)
    assert (out > 0).sum() == 1


def test_fuse_nerf_labels_identity_cameras():
    """Identical cameras: source detections reproject onto themselves."""
    F, H, W = 3, 32, 32
    probs = jnp.zeros((F, H, W)).at[1, 16, 16].set(0.8).at[2, 10, 10].set(0.6)
    pts = jnp.zeros((F, 4, 2))
    mask = jnp.zeros((F, 4), bool)
    pts = pts.at[1, 0].set(jnp.array([16.0, 16.0]))
    mask = mask.at[1, 0].set(True)
    pts = pts.at[2, 0].set(jnp.array([10.0, 10.0]))
    mask = mask.at[2, 0].set(True)
    K = jnp.tile(jnp.array([[[20.0, 0, 16.0], [0, 20.0, 16.0], [0, 0, 1.0]]]), (F, 1, 1))
    depth = jnp.full((F, H, W), 2.0)
    R = jnp.tile(jnp.eye(3)[None], (F, 1, 1))
    t = jnp.zeros((F, 3, 1))
    selected = jnp.array([False, True, True])
    fused = np.asarray(
        fuse_nerf_labels(probs, pts, mask, depth, K, R, t, jnp.asarray(0), selected)
    )
    # 3 views -> mean over 3; detections from frames 1, 2 splat at same yx
    assert fused[16, 16] == pytest.approx(0.8 / 3, abs=1e-4)
    assert fused[10, 10] == pytest.approx(0.6 / 3, abs=1e-4)


def test_sample_descriptors_matches_dense_upsample(rng):
    """Point sampling == reading the dense x8 bicubic upsample at pixels."""
    Hc, Wc, C, g = 4, 5, 8, 8
    desc_raw = rng.standard_normal((Hc, Wc, C)).astype(np.float32)
    dense = np.asarray(upsample_bicubic(jnp.asarray(desc_raw)[None], g))[0]
    dense = dense / (np.linalg.norm(dense, axis=-1, keepdims=True) + 1e-12)

    pts = np.array([[5, 7], [16, 8], [31, 39], [0, 0]], np.float32)
    sampled = np.asarray(
        sample_descriptors(jnp.asarray(desc_raw), jnp.asarray(pts), g)
    )
    for i, (y, x) in enumerate(pts.astype(int)):
        np.testing.assert_allclose(sampled[i], dense[y, x], rtol=1e-3, atol=1e-4)


def test_sample_descriptors_bilinear_runs(rng):
    desc_raw = rng.standard_normal((4, 4, 8)).astype(np.float32)
    pts = jnp.array([[10.0, 10.0]])
    out = sample_descriptors(jnp.asarray(desc_raw), pts, 8, method="bilinear")
    assert out.shape == (1, 8)
    np.testing.assert_allclose(float(jnp.linalg.norm(out[0])), 1.0, atol=1e-4)


@pytest.mark.slow
def test_homography_adaptation_int8_matches_f32():
    """7-bit fixed-point warps through the full HA aggregation stay
    within ~1% of the exact-f32 path (100-warp averaging washes the
    per-warp quantization out further)."""
    rng = np.random.default_rng(3)
    image = jnp.asarray(rng.random((1, 32, 40, 1)), jnp.float32)

    def prob_fn(images):
        return images[..., 0]

    kw = dict(num=9, chunk=4, valid_border_margin=0,
              params=HomographyConfig(allow_artifacts=True, patch_ratio=0.85))
    ref = homography_adaptation(prob_fn, image, jax.random.PRNGKey(0),
                                HAConfig(compute_dtype="float32", **kw))
    got = homography_adaptation(prob_fn, image, jax.random.PRNGKey(0),
                                HAConfig(compute_dtype="int8", **kw))
    diff = np.abs(np.asarray(ref) - np.asarray(got))
    assert diff.max() < 2.5e-2
    assert diff.mean() < 5e-3
