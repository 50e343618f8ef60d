"""Camera geometry + NeRF depth reprojection — pure JAX, batched.

Replaces the reference's per-point Python double loop
(kp_utils.py:86-108) with window min/max pools computed once per depth
map and gathered at the point coordinates — O(HW) instead of O(N*25)
host ops, and fully jittable.

Depth convention: depth maps hold *along-ray* (Euclidean) distance, not
z-buffer depth — the reference unprojects by normalizing the ray to
unit length and scaling by depth (kp_utils.py:115-117). The in-framework
NeRF renderer emits exactly this quantity (models/nerf.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def intrinsics_from_fov(shape: tuple[int, int], fov_degrees: float) -> jnp.ndarray:
    """(3, 3) pinhole intrinsics from image shape and vertical FoV.

    Matches reference NeRF_dataset.py:65-83: c = size // 2,
    f = c_y / tan(fov/2), square pixels.
    """
    H, W = shape
    c_x = W // 2
    c_y = H // 2
    f = c_y / jnp.tan(jnp.deg2rad(fov_degrees) / 2.0)
    return jnp.array(
        [[f, 0.0, c_x], [0.0, f, c_y], [0.0, 0.0, 1.0]], jnp.float32
    )


def nerfstudio_to_cv(cam_to_world: jnp.ndarray) -> jnp.ndarray:
    """Flip the NerfStudio/OpenGL camera axes to OpenCV convention.

    Matches reference NeRF_dataset.py:86-93: right-multiply by
    diag(1, -1, -1, 1). Accepts (..., 4, 4).
    """
    reverse = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0], cam_to_world.dtype))
    return cam_to_world @ reverse


def rotation_translation(transform: jnp.ndarray):
    """Split (..., 4, 4) camera-to-world transforms into R (...,3,3), t (...,3,1)."""
    return transform[..., :3, :3], transform[..., :3, 3:4]


def robust_depth_lookup(depth: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware depth at integer point locations.

    depth: (..., H, W); points: (N, 2) float (y, x).
    Reference semantics (kp_utils.py:86-108): look at the 5x5 patch
    around the (truncated-int) point; if the patch depth range >= 0.03
    the point likely sits on an object edge, so take the patch MIN
    (foreground); otherwise take the center depth. Points within 2 px of
    the border use the center depth.

    Returns (..., N) depths.
    """
    H, W = depth.shape[-2], depth.shape[-1]
    iy = jnp.floor(points[..., 0]).astype(jnp.int32)
    ix = jnp.floor(points[..., 1]).astype(jnp.int32)

    pad = [(0, 0)] * (depth.ndim - 2) + [(2, 2), (2, 2)]
    window = [1] * (depth.ndim - 2) + [5, 5]
    strides = [1] * depth.ndim
    dmin = jax.lax.reduce_window(
        jnp.pad(depth, pad, constant_values=jnp.inf),
        jnp.inf, jax.lax.min, window, strides, "VALID",
    )
    dmax = jax.lax.reduce_window(
        jnp.pad(depth, pad, constant_values=-jnp.inf),
        -jnp.inf, jax.lax.max, window, strides, "VALID",
    )

    iy_c = jnp.clip(iy, 0, H - 1)
    ix_c = jnp.clip(ix, 0, W - 1)
    center = depth[..., iy_c, ix_c]
    pmin = dmin[..., iy_c, ix_c]
    pmax = dmax[..., iy_c, ix_c]

    near_border = (iy <= 2) | (ix <= 2) | (iy >= H - 2) | (ix >= W - 2)
    edge = (pmax - pmin) >= 0.03
    return jnp.where(near_border | ~edge, center, pmin)


def warp_points_nerf(
    points: jnp.ndarray,
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    rotation_in: jnp.ndarray,
    translation_in: jnp.ndarray,
    rotation_warp: jnp.ndarray,
    translation_warp: jnp.ndarray,
) -> jnp.ndarray:
    """Reproject (N, 2) (y, x) points from one camera into another via depth.

    Batched over a leading B dim on depth/intrinsics/rotations/translations
    (shapes (B,H,W), (B,3,3), (B,3,3), (B,3,1), ...). Returns (B, N, 2)
    (y, x) points in the target view.

    Pipeline (reference kp_utils.py:110-135): robust depth lookup,
    unproject through K^-1, normalize ray to unit length, scale by depth
    (along-ray convention), cam -> world with (R_in, t_in), world ->
    target cam with R_w^-1 (x - t_w), project through K.
    """
    depth_vals = robust_depth_lookup(depth, points)  # (B, N)

    pts_xy = points[..., ::-1].astype(jnp.float32)
    ones = jnp.ones(pts_xy.shape[:-1] + (1,), jnp.float32)
    homog = jnp.concatenate([pts_xy, ones], axis=-1)  # (N, 3)

    hi = jax.lax.Precision.HIGHEST
    K_inv = jnp.linalg.inv(intrinsics)
    rays = jnp.einsum("...ij,nj->...in", K_inv, homog, precision=hi)  # (B, 3, N)
    rays = rays / jnp.linalg.norm(rays, axis=-2, keepdims=True)
    cam_pts = rays * depth_vals[..., None, :]  # (B, 3, N)

    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    world = mm(rotation_in, cam_pts) + translation_in
    R_w_inv = jnp.linalg.inv(rotation_warp)
    cam2 = mm(R_w_inv, world) - mm(R_w_inv, translation_warp)
    pix = jnp.einsum("...ij,...jn->...in", intrinsics, cam2, precision=hi)  # (B, 3, N)

    pix = jnp.swapaxes(pix, -1, -2)  # (B, N, 3)
    pix = pix[..., :2] / pix[..., 2:3]
    return pix[..., ::-1]
