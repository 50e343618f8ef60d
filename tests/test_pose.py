"""Pose evaluation: synthetic two-view geometry ground truth."""

import numpy as np
import pytest

from spnerf_tpu.eval.pose import (
    compute_epipolar_error,
    compute_pose_error,
    estimate_pose,
    pose_auc,
    process_resize,
    rotate_intrinsics,
    scale_intrinsics,
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


def test_epipolar_error_zero_for_true_matches(rng):
    k0, k1, K, T = _synthetic_pair(rng)
    errs = compute_epipolar_error(k0, k1, T, K, K)
    assert np.max(errs) < 1e-8


def test_estimate_pose_recovers_gt(rng):
    k0, k1, K, T = _synthetic_pair(rng, noise=0.3)
    ret = estimate_pose(k0, k1, K, K, thresh=1.0)
    assert ret is not None
    R, t, inliers = ret
    err_t, err_R = compute_pose_error(T, R, t)
    assert err_R < 1.0, f"rotation error {err_R}"
    assert err_t < 2.0, f"translation direction error {err_t}"
    assert inliers.mean() > 0.8


def test_pose_auc():
    aucs = pose_auc([1.0, 2.0, 100.0], [5, 10, 20])
    assert 0 < aucs[0] < 1 and aucs[0] < aucs[1] < aucs[2] < 1
    perfect = pose_auc([0.0, 0.0], [5])
    assert perfect[0] == pytest.approx(1.0)


def test_process_resize_and_intrinsics():
    assert process_resize(640, 480, [320]) == (320, 240)
    assert process_resize(640, 480, [-1]) == (640, 480)
    assert process_resize(640, 480, [320, 200]) == (320, 200)
    K = np.array([[500.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    K2 = scale_intrinsics(K, (2.0, 2.0))
    assert K2[0, 0] == 250 and K2[1, 2] == 120


def test_rotate_intrinsics_roundtrip():
    K = np.array([[500.0, 0, 310], [0, 400.0, 250], [0, 0, 1]])
    K90 = rotate_intrinsics(K, (640, 480), 1)  # image shape after rotation
    assert K90[0, 0] == K[1, 1] and K90[1, 1] == K[0, 0]


def test_top_keypoints_with_border(rng):
    prob = np.zeros((64, 64), np.float32)
    prob[2, 2] = 0.9       # inside border margin -> removed
    prob[30, 30] = 0.8
    prob[40, 40] = 0.7
    pts = top_keypoints_with_border(prob, keep_k=10, border=4)
    coords = {tuple(p) for p in pts}
    assert (2, 2) not in coords
    assert (30, 30) in coords and (40, 40) in coords
