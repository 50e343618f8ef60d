"""Pose evaluation: synthetic two-view geometry ground truth.

Includes golden pins captured from the round-1 implementation before the
round-2 rewrite, proving the protocol numerics were preserved.
"""

import numpy as np
import pytest

from spnerf_tpu.eval.pose import (
    epipolar_errors,
    error_auc,
    pose_errors_deg,
    recover_relative_pose,
    rescale_K,
    resize_dims,
    rotate_extrinsic,
    rotate_K,
    top_keypoints_with_border,
)


def _synthetic_pair(rng, n=200, noise=0.0):
    """Random 3D points seen by two cameras; returns pixel matches + GT."""
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    pts3d = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)
    ], axis=1)
    # camera 0 at origin; camera 1 rotated + translated
    angle = 0.15
    R = np.array([
        [np.cos(angle), 0, np.sin(angle)],
        [0, 1, 0],
        [-np.sin(angle), 0, np.cos(angle)],
    ])
    t = np.array([0.5, 0.1, 0.05])
    T_0to1 = np.eye(4)
    T_0to1[:3, :3] = R
    T_0to1[:3, 3] = t

    p0 = pts3d @ K.T
    k0 = p0[:, :2] / p0[:, 2:]
    p1 = (pts3d @ R.T + t) @ K.T
    k1 = p1[:, :2] / p1[:, 2:]
    if noise:
        k0 = k0 + rng.normal(0, noise, k0.shape)
        k1 = k1 + rng.normal(0, noise, k1.shape)
    return k0, k1, K, T_0to1


def _golden_setup():
    """The exact inputs used to capture round-1 golden values."""
    rng = np.random.RandomState(0)
    K0 = np.array([[458.0, 0, 321.0], [0, 460.0, 239.0], [0, 0, 1.0]])
    K1 = np.array([[520.0, 0, 310.0], [0, 515.0, 252.0], [0, 0, 1.0]])
    T = np.eye(4)
    ang = 0.2
    T[:3, :3] = np.array([
        [np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]
    ])
    T[:3, 3] = [0.3, -0.1, 0.05]
    k0 = rng.uniform(0, 640, (7, 2))
    k1 = rng.uniform(0, 480, (7, 2))
    return k0, k1, K0, K1, T


def test_epipolar_errors_golden_pin():
    k0, k1, K0, K1, T = _golden_setup()
    golden = np.array([
        2.41509267, 0.16354453, 0.00338376, 0.24129085, 0.07260307,
        0.5122823, 0.87335561,
    ])
    np.testing.assert_allclose(epipolar_errors(k0, k1, T, K0, K1), golden,
                               rtol=1e-7)


def test_error_auc_golden_pin():
    aucs = error_auc([3.0, 7.0, 12.0, 25.0, 1.0], [5, 10, 20])
    np.testing.assert_allclose(aucs, [0.3, 0.45, 0.63], rtol=1e-12)
    assert error_auc([], [5]) == [0.0]


def test_rotate_K_golden_pins():
    _, _, K0, _, T = _golden_setup()
    np.testing.assert_allclose(
        rotate_K(K0, (480, 640), 1),
        [[460.0, 0, 239.0], [0, 458.0, 158.0], [0, 0, 1.0]])
    np.testing.assert_allclose(
        rotate_K(K0, (640, 480), 2),
        [[458.0, 0, 158.0], [0, 460.0, 400.0], [0, 0, 1.0]])
    np.testing.assert_allclose(
        rotate_K(K0, (480, 640), 3),
        [[460.0, 0, 400.0], [0, 458.0, 321.0], [0, 0, 1.0]])


def test_rotate_extrinsic_golden_pins():
    _, _, _, _, T = _golden_setup()
    g1 = np.array([
        [0.0, 1.0, 0.0, -0.1],
        [-0.98006658, 0.0, -0.19866933, -0.3],
        [-0.19866933, 0.0, 0.98006658, 0.05],
        [0.0, 0.0, 0.0, 1.0],
    ])
    g3 = np.array([
        [0.0, -1.0, 0.0, 0.1],
        [0.98006658, 0.0, 0.19866933, 0.3],
        [-0.19866933, 0.0, 0.98006658, 0.05],
        [0.0, 0.0, 0.0, 1.0],
    ])
    np.testing.assert_allclose(rotate_extrinsic(T, 1), g1, atol=1e-7)
    np.testing.assert_allclose(rotate_extrinsic(T, 3), g3, atol=1e-7)
    np.testing.assert_allclose(rotate_extrinsic(T, 0), T, atol=1e-7)


def test_epipolar_error_zero_for_true_matches(rng):
    k0, k1, K, T = _synthetic_pair(rng)
    errs = epipolar_errors(k0, k1, T, K, K)
    assert np.max(errs) < 1e-8


def test_recover_relative_pose_recovers_gt(rng):
    k0, k1, K, T = _synthetic_pair(rng, noise=0.3)
    ret = recover_relative_pose(k0, k1, K, K, thresh=1.0)
    assert ret is not None
    R, t, inliers = ret
    err_t, err_R = pose_errors_deg(T, R, t)
    assert err_R < 1.0, f"rotation error {err_R}"
    assert err_t < 2.0, f"translation direction error {err_t}"
    assert inliers.mean() > 0.8


def test_error_auc_ordering():
    aucs = error_auc([1.0, 2.0, 100.0], [5, 10, 20])
    assert 0 < aucs[0] < 1 and aucs[0] < aucs[1] < aucs[2] < 1
    perfect = error_auc([0.0, 0.0], [5])
    assert perfect[0] == pytest.approx(1.0)


def test_resize_dims_and_rescale_K():
    assert resize_dims(640, 480, [320]) == (320, 240)
    assert resize_dims(640, 480, [-1]) == (640, 480)
    assert resize_dims(640, 480, [320, 200]) == (320, 200)
    K = np.array([[500.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    K2 = rescale_K(K, (2.0, 2.0))
    assert K2[0, 0] == 250 and K2[1, 2] == 120


def test_rotate_K_swaps_focals():
    K = np.array([[500.0, 0, 310], [0, 400.0, 250], [0, 0, 1]])
    K90 = rotate_K(K, (640, 480), 1)  # image shape after rotation
    assert K90[0, 0] == K[1, 1] and K90[1, 1] == K[0, 0]


def test_rotate_K_full_turn_is_identity():
    K = np.array([[500.0, 0, 310.0], [0, 400.0, 250.0], [0, 0, 1.0]])
    np.testing.assert_allclose(rotate_K(K, (480, 640), 4), K)


def test_top_keypoints_with_border(rng):
    prob = np.zeros((64, 64), np.float32)
    prob[2, 2] = 0.9       # inside border margin -> removed
    prob[30, 30] = 0.8
    prob[40, 40] = 0.7
    pts = top_keypoints_with_border(prob, keep_k=10, border=4)
    coords = {tuple(p) for p in pts}
    assert (2, 2) not in coords
    assert (30, 30) in coords and (40, 40) in coords
