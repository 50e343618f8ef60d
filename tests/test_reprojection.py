import jax.numpy as jnp
import numpy as np

from spnerf_tpu.geometry import (
    intrinsics_from_fov,
    nerfstudio_to_cv,
    robust_depth_lookup,
    rotation_translation,
    warp_points_nerf,
)


def _robust_depth_numpy(depth, points):
    """Oracle re-implementing reference kp_utils.py:86-108 semantics."""
    H, W = depth.shape
    out = []
    for p in points:
        iy, ix = int(p[0]), int(p[1])
        if iy <= 2 or ix <= 2 or iy >= H - 2 or ix >= W - 2:
            out.append(depth[iy, ix])
            continue
        patch = depth[iy - 2 : iy + 3, ix - 2 : ix + 3]
        if patch.max() - patch.min() >= 0.03:
            out.append(patch.min())
        else:
            out.append(depth[iy, ix])
    return np.array(out, np.float32)


def test_intrinsics_from_fov():
    K = np.asarray(intrinsics_from_fov((480, 640), 90.0))
    assert K[0, 2] == 320 and K[1, 2] == 240
    np.testing.assert_allclose(K[0, 0], 240 / np.tan(np.pi / 4), rtol=1e-5)
    assert K[0, 0] == K[1, 1]


def test_nerfstudio_to_cv():
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    out = np.asarray(nerfstudio_to_cv(jnp.asarray(T)))
    expected = T @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    np.testing.assert_allclose(out, expected)
    R, t = rotation_translation(jnp.asarray(out))
    assert R.shape == (3, 3) and t.shape == (3, 1)


def test_robust_depth_lookup_matches_oracle(rng):
    depth = rng.uniform(1.0, 3.0, (30, 40)).astype(np.float32)
    # flat region: small variation
    depth[10:20, 10:20] = 2.0 + rng.uniform(0, 0.01, (10, 10)).astype(np.float32)
    pts = np.array(
        [[1.0, 1.0], [15.0, 15.0], [5.0, 5.0], [28.0, 38.0], [12.3, 17.8]],
        np.float32,
    )
    expected = _robust_depth_numpy(depth, pts)
    got = np.asarray(robust_depth_lookup(jnp.asarray(depth), jnp.asarray(pts)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_robust_depth_lookup_batched(rng):
    depth = rng.uniform(1.0, 3.0, (2, 20, 20)).astype(np.float32)
    pts = np.array([[5.0, 5.0], [10.0, 10.0]], np.float32)
    got = np.asarray(robust_depth_lookup(jnp.asarray(depth), jnp.asarray(pts)))
    assert got.shape == (2, 2)
    for b in range(2):
        np.testing.assert_allclose(got[b], _robust_depth_numpy(depth[b], pts), atol=1e-6)


def test_warp_points_nerf_identity():
    # same camera for input and warp -> points map to themselves
    H, W = 48, 64
    K = intrinsics_from_fov((H, W), 60.0)[None]
    depth = jnp.full((1, H, W), 2.0)
    R = jnp.eye(3)[None]
    t = jnp.zeros((1, 3, 1))
    pts = jnp.array([[10.0, 20.0], [30.0, 40.0], [24.0, 32.0]])
    out = warp_points_nerf(pts, depth, K, R, t, R, t)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(pts), atol=1e-3)


def test_warp_points_nerf_translation():
    # translate the target camera along +x (in camera axes): image points
    # shift in -x (pixel) direction by f * dx / z
    H, W = 64, 64
    K = np.asarray(intrinsics_from_fov((H, W), 60.0))
    f = K[0, 0]
    z = 2.0
    # NB depth map stores along-ray distance; for the principal point the
    # ray is the optical axis so distance == z there.
    depth = jnp.full((1, H, W), z)
    R = jnp.eye(3)[None]
    t0 = jnp.zeros((1, 3, 1))
    dx = 0.1
    t1 = jnp.array([[[dx], [0.0], [0.0]]])
    pts = jnp.array([[32.0, 32.0]])  # principal point
    out = np.asarray(warp_points_nerf(pts, depth, jnp.asarray(K)[None], R, t0, R, t1))[0, 0]
    expected_x = 32.0 - f * dx / z
    np.testing.assert_allclose(out[1], expected_x, rtol=1e-4)
    np.testing.assert_allclose(out[0], 32.0, atol=1e-4)
