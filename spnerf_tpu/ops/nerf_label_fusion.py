"""Multi-view NeRF pseudo-label fusion — batched, static-shape.

Counterpart of reference export.py:246-366 (``ExportNeRFDetections``):
detections from other rendered views of the same scene are reprojected
into the target view through depth and splatted as 3x3 probability
patches, then mean-aggregated, NMS'd and thresholded.

TPU redesign:
- every frame's forward pass + NMS runs ONCE per batch (the reference
  reruns the model for every (target, source) pair — O(F^2) forwards);
- detections are fixed-capacity (K, 2) point sets with masks;
- the per-point Python splat loop (export.py:285-295) becomes a single
  scatter of (K, 9) patch values. Overlapping splats resolve by MAX
  (deterministic) instead of the reference's arbitrary overwrite order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from spnerf_tpu.geometry.reprojection import warp_points_nerf


def splat_reprojected_points(
    source_prob: jnp.ndarray,  # (H, W) source-view heatmap
    source_pts: jnp.ndarray,  # (K, 2) int/float (y, x) detected in source
    target_pts: jnp.ndarray,  # (K, 2) float (y, x) reprojected into target
    mask: jnp.ndarray,  # (K,) valid detections
) -> jnp.ndarray:
    """3x3 neighborhood splat (1x1 near borders), reference
    export.py:285-295 semantics."""
    H, W = source_prob.shape
    sy = jnp.floor(source_pts[:, 0]).astype(jnp.int32)
    sx = jnp.floor(source_pts[:, 1]).astype(jnp.int32)
    ty = jnp.floor(target_pts[:, 0]).astype(jnp.int32)
    tx = jnp.floor(target_pts[:, 1]).astype(jnp.int32)

    in_target = (ty >= 0) & (ty < H - 1) & (tx >= 0) & (tx < W - 1)
    mask = mask & in_target

    near_border = (
        (ty <= 1) | (tx <= 1) | (ty >= H - 1) | (tx >= W - 1)
        | (sy <= 1) | (sx <= 1) | (sy >= H - 1) | (sx >= W - 1)
    )

    dy, dx = jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij")
    dy = dy.reshape(-1)  # (9,)
    dx = dx.reshape(-1)

    # gather source patch values
    gy = jnp.clip(sy[:, None] + dy[None], 0, H - 1)
    gx = jnp.clip(sx[:, None] + dx[None], 0, W - 1)
    vals = source_prob[gy, gx]  # (K, 9)

    center = (dy == 0) & (dx == 0)
    use = jnp.where(near_border[:, None], center[None, :], True)
    use = use & mask[:, None]

    oy = ty[:, None] + dy[None]
    ox = tx[:, None] + dx[None]
    # route unused/out-of-range scatters out of bounds (drop)
    bad = ~use | (oy < 0) | (oy >= H) | (ox < 0) | (ox >= W)
    oy = jnp.where(bad, H, oy)
    ox = jnp.where(bad, W, ox)

    out = jnp.zeros((H, W), source_prob.dtype)
    return out.at[oy, ox].max(vals, mode="drop")


@partial(jax.jit, static_argnames=())
def fuse_nerf_labels(
    probs: jnp.ndarray,  # (F, H, W) decoded heatmaps, one per frame
    nms_pts: jnp.ndarray,  # (F, K, 2) NMS'd detections per frame
    nms_mask: jnp.ndarray,  # (F, K)
    depths: jnp.ndarray,  # (F, H, W)
    intrinsics: jnp.ndarray,  # (F, 3, 3)
    rotations: jnp.ndarray,  # (F, 3, 3)
    translations: jnp.ndarray,  # (F, 3, 1)
    target: jnp.ndarray,  # scalar int: target frame index
    selected: jnp.ndarray,  # (F,) bool: source frames to fuse
) -> jnp.ndarray:
    """Mean-fused heatmap for one target frame (before NMS/threshold)."""
    F, H, W = probs.shape
    K_t = intrinsics[target]
    R_t = rotations[target]
    t_t = translations[target]

    def one_source(k):
        pts = nms_pts[k].astype(jnp.float32)
        unwarped = warp_points_nerf(
            pts, depths[k][None], K_t[None],
            rotations[k][None], translations[k][None],
            R_t[None], t_t[None],
        )[0]
        return splat_reprojected_points(
            probs[k], pts, unwarped, nms_mask[k] & selected[k] & (k != target)
        )

    splats = jax.vmap(one_source)(jnp.arange(F))  # (F, H, W)
    n_views = 1.0 + jnp.sum(selected & (jnp.arange(F) != target))
    total = probs[target] + jnp.sum(splats, axis=0)
    return total / n_views
