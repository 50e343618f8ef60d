"""Static-shape keypoint NMS.

The reference runs torchvision's greedy IoU box NMS per image inside the
forward pass (sp_utils.py:4-28, heads.py:33-38) — a sequential,
data-dependent-shape C++ op. On TPU we replace it with:

- ``box_nms``: fast suppression — a point survives iff it is the maximum
  over the exact set of offsets whose boxes would overlap it above the
  IoU threshold. This reproduces torchvision's *pairwise* suppression
  topology; it differs only on suppression chains (A>B>C where B is
  suppressed by A: greedy keeps C, fast NMS may drop C). With iou=0.1 at
  size=4 the boxes are near-disjoint, making differences rare (SURVEY §7
  "hard parts"). Fully vectorized, runs inside jit at trace-time-known
  shapes.
- ``box_nms_greedy``: exact greedy semantics via a fixed-length
  suppression loop, for parity testing and offline eval.

Both return an NMS'd heatmap (surviving scores scattered into zeros),
like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def suppression_offsets(size: int, iou: float) -> tuple[tuple[int, int], ...]:
    """Offsets (dy, dx) != (0,0) where two size x size boxes exceed ``iou``."""
    offs = []
    for dy in range(-size + 1, size):
        for dx in range(-size + 1, size):
            if dy == 0 and dx == 0:
                continue
            inter = max(0, size - abs(dy)) * max(0, size - abs(dx))
            union = 2 * size * size - inter
            if inter / union > iou:
                offs.append((dy, dx))
    return tuple(offs)


def _neighborhood_max(scores: jnp.ndarray, size: int, iou: float) -> jnp.ndarray:
    """Max of scores over the suppression footprint (excluding self)."""
    offs = suppression_offsets(size, iou)
    neg = jnp.full_like(scores, -jnp.inf)
    out = neg
    H, W = scores.shape[-2], scores.shape[-1]
    for dy, dx in offs:
        shifted = jnp.roll(scores, (dy, dx), axis=(-2, -1))
        # zero-out wrap-around
        ys = jnp.arange(H)
        xs = jnp.arange(W)
        yvalid = (ys - dy >= 0) & (ys - dy < H)
        xvalid = (xs - dx >= 0) & (xs - dx < W)
        valid = yvalid[:, None] & xvalid[None, :]
        shifted = jnp.where(valid, shifted, -jnp.inf)
        out = jnp.maximum(out, shifted)
    return out


def box_nms(
    prob: jnp.ndarray,
    size: int = 4,
    iou: float = 0.1,
    min_prob: float = 0.01,
    keep_top_k: int = 0,
) -> jnp.ndarray:
    """Fast NMS over (..., H, W) heatmaps. Returns the NMS'd heatmap."""
    cand = prob >= min_prob
    scores = jnp.where(cand, prob, -jnp.inf)
    neigh = _neighborhood_max(scores, size, iou)
    keep = cand & (scores > neigh)
    # break exact ties by keeping both (ties are measure-zero with floats)
    keep = keep | (cand & (scores == neigh) & (neigh > -jnp.inf))
    out = jnp.where(keep, prob, 0.0)
    if keep_top_k:
        flat = out.reshape(out.shape[:-2] + (-1,))
        k = min(keep_top_k, flat.shape[-1])
        kth = jax.lax.top_k(flat, k)[0][..., -1:]
        out = jnp.where(out >= jnp.maximum(kth, min_prob).reshape(out.shape[:-2] + (1, 1)), out, 0.0)
    return out


def box_nms_greedy(
    prob: jnp.ndarray,
    size: int = 4,
    iou: float = 0.1,
    min_prob: float = 0.01,
    keep_top_k: int = 0,
    max_iters: int | None = None,
) -> jnp.ndarray:
    """Exact greedy box NMS on one (H, W) heatmap (parity reference).

    Sequential fixed-length loop: repeatedly keep the strongest remaining
    candidate and suppress its overlap footprint. ``max_iters`` bounds the
    loop (defaults to keep_top_k or H*W).
    """
    H, W = prob.shape
    offs = np.array(suppression_offsets(size, iou), np.int32).reshape(-1, 2)
    n_iters = max_iters or (keep_top_k if keep_top_k else H * W)

    def body(state, _):
        alive, kept = state
        masked = jnp.where(alive, prob, -jnp.inf)
        idx = jnp.argmax(masked)
        y, x = idx // W, idx % W
        score = masked.reshape(-1)[idx]
        ok = score >= min_prob
        kept = kept.at[y, x].set(kept[y, x] | ok)
        # suppress footprint + self
        ys = y + jnp.asarray(offs[:, 0])
        xs = x + jnp.asarray(offs[:, 1])
        # negative indices would wrap in JAX scatters; push them out of
        # bounds high so mode='drop' discards them
        ys = jnp.where(ys < 0, H, ys)
        xs = jnp.where(xs < 0, W, xs)
        alive = alive.at[y, x].set(False)
        alive = alive.at[ys, xs].set(False, mode="drop")
        return (alive, kept), None

    alive0 = prob >= min_prob
    kept0 = jnp.zeros((H, W), bool)
    (alive, kept), _ = jax.lax.scan(body, (alive0, kept0), None, length=n_iters)
    out = jnp.where(kept, prob, 0.0)
    if keep_top_k:
        flat = out.reshape(-1)
        k = min(keep_top_k, flat.shape[0])
        kth = jax.lax.top_k(flat, k)[0][-1]
        out = jnp.where(out >= jnp.maximum(kth, min_prob), out, 0.0)
    return out
