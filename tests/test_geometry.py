import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.geometry import (
    HomographyConfig,
    adapt_homography_to_resize,
    compute_keypoint_map,
    filter_points_mask,
    homography_from_corners,
    sample_homographies,
    sample_homography,
    top_k_keypoints,
    warp_points,
)


def test_homography_from_corners_matches_cv2(rng):
    for _ in range(10):
        pts1 = rng.uniform(0, 100, (4, 2)).astype(np.float32)
        pts2 = pts1 + rng.uniform(-10, 10, (4, 2)).astype(np.float32)
        H_cv = cv2.getPerspectiveTransform(pts1, pts2)
        H_jax = homography_from_corners(jnp.asarray(pts1), jnp.asarray(pts2))
        np.testing.assert_allclose(np.asarray(H_jax), H_cv, rtol=1e-4, atol=1e-4)


def test_warp_points_matches_manual(rng):
    H = np.array([[1.1, 0.02, 3.0], [-0.01, 0.95, -2.0], [1e-4, -2e-4, 1.0]], np.float32)
    pts_yx = rng.uniform(0, 100, (7, 2)).astype(np.float32)
    # manual: flip to (x, y), homogeneous multiply, dehomogenize, flip back
    xy = pts_yx[:, ::-1]
    homog = np.concatenate([xy, np.ones((7, 1), np.float32)], axis=1)
    out = (H @ homog.T).T
    expected = (out[:, :2] / out[:, 2:])[:, ::-1]
    got = warp_points(jnp.asarray(pts_yx), jnp.asarray(H))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


def test_warp_points_batched(rng):
    Hs = np.stack([np.eye(3, dtype=np.float32)] * 3)
    Hs[1, 0, 2] = 5.0  # x-translation of 5 -> col + 5
    pts = rng.uniform(10, 50, (4, 2)).astype(np.float32)
    got = warp_points(jnp.asarray(pts), jnp.asarray(Hs))
    assert got.shape == (3, 4, 2)
    np.testing.assert_allclose(np.asarray(got[0]), pts, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1, :, 1]), pts[:, 1] + 5.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1, :, 0]), pts[:, 0], atol=1e-4)


@pytest.mark.slow
def test_sample_homography_shapes_and_invertibility():
    key = jax.random.PRNGKey(0)
    cfg = HomographyConfig(patch_ratio=0.8, allow_artifacts=True,
                           scaling_amplitude=0.2, perspective_amplitude_x=0.2,
                           perspective_amplitude_y=0.2, translation_overflow=0.05)
    H = sample_homography(key, (120, 160), cfg)
    assert H.shape == (3, 3)
    # must be invertible and map roughly within the image
    det = jnp.linalg.det(H)
    assert jnp.abs(det) > 1e-6
    Hs = sample_homographies(key, 8, (120, 160), cfg)
    assert Hs.shape == (8, 3, 3)
    assert not np.allclose(np.asarray(Hs[0]), np.asarray(Hs[1]))


def test_sample_homography_no_artifacts_keeps_patch_inside():
    # with allow_artifacts=False, the warped patch corners stay inside the
    # image, so the center of the image must map inside the image bounds
    cfg = HomographyConfig(allow_artifacts=False, patch_ratio=0.5)
    shape = (100, 100)
    for seed in range(10):
        H = sample_homography(jax.random.PRNGKey(seed), shape, cfg)
        # corners of the full image under the forward map H^-1 ... instead:
        # warp the 4 patch-center points and check finiteness
        pts = jnp.array([[50.0, 50.0]])
        w = warp_points(pts, jnp.linalg.inv(H)[None])[0]
        assert np.all(np.isfinite(np.asarray(w)))


def test_filter_points_mask():
    pts = jnp.array([[0.0, 0.0], [5.0, 5.0], [-1.0, 3.0], [99.0, 3.0], [3.0, 98.0]])
    mask = filter_points_mask(pts, (100, 100))
    np.testing.assert_array_equal(np.asarray(mask), [True, True, False, False, True])


def test_compute_keypoint_map():
    pts = jnp.array([[1.4, 2.6], [10.0, 10.0], [-3.0, 5.0], [200.0, 5.0]])
    kmap = compute_keypoint_map(pts, (20, 20))
    expected = np.zeros((20, 20), np.int32)
    expected[1, 3] = 1
    expected[10, 10] = 1
    np.testing.assert_array_equal(np.asarray(kmap), expected)


def test_compute_keypoint_map_respects_mask():
    pts = jnp.array([[1.0, 1.0], [2.0, 2.0]])
    kmap = compute_keypoint_map(pts, (5, 5), mask=jnp.array([True, False]))
    assert kmap[1, 1] == 1 and kmap[2, 2] == 0


def test_top_k_keypoints():
    prob = jnp.zeros((10, 10)).at[2, 3].set(0.9).at[5, 5].set(0.8).at[7, 1].set(0.1)
    pts, scores, valid = top_k_keypoints(prob, k=4, threshold=0.5)
    assert pts.shape == (4, 2)
    np.testing.assert_array_equal(np.asarray(pts[0]), [2, 3])
    np.testing.assert_array_equal(np.asarray(pts[1]), [5, 5])
    np.testing.assert_array_equal(np.asarray(valid), [True, True, False, False])


def test_adapt_homography_to_resize():
    H = jnp.array([[1.0, 0.0, 10.0], [0.0, 1.0, -4.0], [0.0, 0.0, 1.0]])
    H2 = adapt_homography_to_resize(H, (100, 200), (50, 50))
    # a point p in resized coords should map consistently:
    # scale up, warp with H, scale down
    p_yx = jnp.array([[20.0, 30.0]])
    up = p_yx * jnp.array([100 / 50, 200 / 50])
    warped_up = warp_points(up, H)
    expected = warped_up * jnp.array([50 / 100, 50 / 200])
    got = warp_points(p_yx, H2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-3)
