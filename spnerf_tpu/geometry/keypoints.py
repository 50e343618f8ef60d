"""Fixed-shape keypoint set utilities.

The reference uses data-dependent shapes (boolean indexing in
kp_utils.py:3-35). On TPU every shape must be static, so keypoint sets
are carried as (N, 2) padded arrays plus a (N,) validity mask, and
"filtering" returns masks instead of shrinking arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def filter_points_mask(points: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Validity mask for (..., N, 2) (y, x) points strictly inside the image.

    Matches reference kp_utils.py:3-20: 0 <= y < H-1 and 0 <= x < W-1.
    """
    H, W = shape
    y, x = points[..., 0], points[..., 1]
    return (y >= 0) & (y < H - 1) & (x >= 0) & (x < W - 1)


def compute_keypoint_map(
    points: jnp.ndarray,
    shape: tuple[int, int],
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scatter (N, 2) (y, x) float points into a binary (H, W) map.

    Matches reference kp_utils.py:22-35 (round, bounds check, scatter 1).
    Invalid / padded points are dropped via scatter mode='drop'.
    """
    H, W = shape
    coords = jnp.round(points).astype(jnp.int32)
    valid = filter_points_mask(coords, shape)
    if mask is not None:
        valid = valid & mask.astype(bool)
    # route invalid points out of range so mode='drop' discards them
    # (use H/W, not -1: negative indices wrap in JAX scatters)
    y = jnp.where(valid, coords[..., 0], H)
    x = jnp.where(valid, coords[..., 1], W)
    kmap = jnp.zeros((H, W), jnp.int32)
    return kmap.at[y, x].set(1, mode="drop")


def top_k_keypoints(prob: jnp.ndarray, k: int, threshold: float = 0.0):
    """Extract the top-k scoring pixels of an (H, W) heatmap.

    Returns (points (k, 2) int32 (y, x), scores (k,), valid (k,) bool).
    Static-shape replacement for the reference's ``torch.nonzero`` +
    ``topk`` pattern (sp_utils.py:6-23): entries below ``threshold`` are
    marked invalid rather than removed.
    """
    H, W = prob.shape
    flat = prob.reshape(-1)
    k = min(k, H * W)
    scores, idx = jax.lax.top_k(flat, k)
    pts = jnp.stack([idx // W, idx % W], axis=-1).astype(jnp.int32)
    valid = scores >= threshold
    return pts, scores, valid
