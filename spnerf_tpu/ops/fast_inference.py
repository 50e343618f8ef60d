"""Production inference path: candidate-based NMS + matmul descriptor
sampling.

The parity path (ops/nms.py + ops/descriptor_sampling.py) spends its
time in full-image suppression windows, a full-image sort (lax.top_k
over H*W) and pointwise gathers. This module restructures all three
around what the TPU is good at:

1. candidates come from ONE ``lax.approx_max_k`` over the heatmap (the
   TPU-native partial sort) — only ~C candidates above threshold exist;
2. NMS is a (C, C) pairwise suppression among candidates (VPU), exactly
   the box-IoU topology of ``box_nms``;
3. descriptors are interpolated by two separable one-hot matmuls on the
   MXU instead of 16 scattered gathers per point.

Same outputs as the parity path up to approx_max_k recall (>= 0.95 by
default, exact for the scores that matter since candidates ranked by
score).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.ops.nms import suppression_offsets


@functools.partial(jax.jit, static_argnames=("size", "iou", "num_candidates",
                                             "top_k"))
def detect_keypoints(
    prob: jnp.ndarray,
    min_prob: float = 0.015,
    size: int = 4,
    iou: float = 0.1,
    num_candidates: int = 2048,
    top_k: int = 1000,
):
    """(B, H, W) heatmap -> (pts (B, K, 2), scores (B, K), valid (B, K)).

    Candidate NMS: a candidate survives iff no strictly higher-scored
    candidate overlaps it above the IoU threshold (same pairwise
    topology as ops.nms.box_nms).
    """
    B, H, W = prob.shape
    C = min(num_candidates, H * W)
    flat = prob.reshape(B, -1)
    scores, idx = jax.lax.approx_max_k(flat, C, recall_target=0.95)
    # f32 coordinates — bf16 rounds pixel indices above 256 and would
    # corrupt the near-neighbor suppression tests
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    return _suppress_and_select(ys, xs, scores, min_prob, size, iou, top_k)


@functools.partial(jax.jit, static_argnames=("grid_size", "size", "iou",
                                             "num_candidates", "top_k"))
def detect_from_logits(
    logits: jnp.ndarray,
    grid_size: int = 8,
    min_prob: float = 0.015,
    size: int = 4,
    iou: float = 0.1,
    num_candidates: int = 1024,
    top_k: int = 1000,
):
    """Keypoints straight from (B, Hc, Wc, 65) detector logits.

    Fuses the decode (softmax -> drop dustbin, reference heads.py:25-29)
    with candidate extraction: ``approx_max_k`` runs over the cell-major
    softmax probabilities and pixel coordinates are reconstructed from
    (cell, within-cell) indices, so the depth-to-space relayout of the
    full (B, H, W) heatmap is never materialized. Same keypoints as
    ``decode_detector_logits`` + ``detect_keypoints``.
    """
    B, Hc, Wc, _ = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :-1]
    flat = probs.reshape(B, -1)  # index = (h*Wc + w)*g^2 + dy*g + dx
    C = min(num_candidates, flat.shape[1])
    scores, idx = jax.lax.approx_max_k(flat, C, recall_target=0.95)
    g2 = grid_size * grid_size
    cell = idx // g2
    within = idx % g2
    ys = (cell // Wc * grid_size + within // grid_size).astype(jnp.float32)
    xs = (cell % Wc * grid_size + within % grid_size).astype(jnp.float32)
    return _suppress_and_select(ys, xs, scores, min_prob, size, iou, top_k)


@functools.partial(jax.jit, static_argnames=("grid_size", "size", "iou",
                                             "num_candidates", "top_k",
                                             "compact"))
def detect_from_probs_padded(
    probs: jnp.ndarray,
    grid_size: int = 8,
    min_prob: float = 0.015,
    size: int = 4,
    iou: float = 0.1,
    num_candidates: int = 1024,
    top_k: int = 1000,
    compact: bool = True,
):
    """Keypoints from lane-padded cell probabilities (B, Hc, Wc, L).

    Consumes the output of ``head_pallas(..., softmax_lanes=65)``: lanes
    [0, 64) hold the post-softmax within-cell probabilities (dustbin
    already dropped, reference heads.py:25-29), lanes >= 64 are exactly
    zero. The pad lanes are sliced off before ``approx_max_k`` — the
    slice is a cheap bf16 copy while the partial sort scales with its
    input width (measured 3.80 vs 4.28 ms at b64 480x640,
    benchmarks/micro_tail.py). Same keypoints as ``detect_from_logits``
    up to the serving dtype rounding.

    ``compact=False`` skips the exact top-k compaction pass: all C
    candidates come back in approx_max_k rank order with suppressed /
    sub-threshold entries masked out by ``valid`` (a superset of the
    compacted output whenever more than ``top_k`` survive NMS; another
    1.4 ms at b64). Downstream consumers that mask by ``valid`` — the
    descriptor samplers, the exports' score-threshold selection — see
    the same keypoint set.
    """
    B, Hc, Wc, L = probs.shape
    g2 = grid_size * grid_size
    flat = probs[..., :g2].reshape(B, -1)  # ranked in serving dtype
    C = min(num_candidates, flat.shape[1])
    scores, idx = jax.lax.approx_max_k(flat, C, recall_target=0.95)
    scores = scores.astype(jnp.float32)
    cell = idx // g2
    within = idx % g2
    ys = (cell // Wc * grid_size + within // grid_size).astype(jnp.float32)
    xs = (cell % Wc * grid_size + within % grid_size).astype(jnp.float32)
    if not compact:
        return _suppress_only(ys, xs, scores, min_prob, size, iou)
    return _suppress_and_select(ys, xs, scores, min_prob, size, iou, top_k)


def _candidate_keep(ys, xs, scores, min_prob, size, iou):
    """(B, C) keep mask: candidate survives iff above threshold and no
    strictly higher-scored candidate overlaps it past the IoU bound."""
    cand_valid = scores >= min_prob
    dy = jnp.abs(ys[:, :, None] - ys[:, None, :])
    dx = jnp.abs(xs[:, :, None] - xs[:, None, :])
    inter = jnp.maximum(0.0, size - dy) * jnp.maximum(0.0, size - dx)
    union = 2.0 * size * size - inter
    overlap = inter / union > iou
    stronger = scores[:, None, :] > scores[:, :, None]
    suppressed = jnp.any(overlap & stronger & cand_valid[:, None, :], axis=-1)
    return cand_valid & ~suppressed


def _suppress_only(ys, xs, scores, min_prob, size, iou):
    """Candidate NMS without the compaction sort: all C candidates in
    approx_max_k rank order, masked by ``valid``."""
    keep = _candidate_keep(ys, xs, scores, min_prob, size, iou)
    pts = jnp.stack([ys, xs], axis=-1)
    return pts, jnp.where(keep, scores, 0.0), keep


def _suppress_and_select(ys, xs, scores, min_prob, size, iou, top_k):
    """Shared candidate NMS + top-k tail (see ``detect_keypoints``)."""
    C = scores.shape[1]
    keep = _candidate_keep(ys, xs, scores, min_prob, size, iou)
    kept_scores = jnp.where(keep, scores, -jnp.inf)
    k = min(top_k, C)
    final_scores, sel = jax.lax.top_k(kept_scores, k)
    take = lambda a: jnp.take_along_axis(a, sel, axis=1)
    pts = jnp.stack([take(ys), take(xs)], axis=-1)
    valid = jnp.isfinite(final_scores) & (final_scores >= min_prob)
    return pts, jnp.where(valid, final_scores, 0.0), valid


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2 * t2 + t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w3 = a * (-t3 + t2)
    return jnp.stack([w0, w1, w2, w3], axis=-1)  # (K, 4)


def _axis_weight_matrix(coord: jnp.ndarray, n: int, grid_size: int):
    """(K,) pixel coords -> (K, n) cubic interpolation row weights with
    border clamping (same geometry as ops/descriptor_sampling.py)."""
    src = (coord + 0.5) / grid_size - 0.5
    base = jnp.floor(src)
    t = src - base
    w = _cubic_weights(t)  # (K, 4)
    idx = base[:, None].astype(jnp.int32) + jnp.arange(-1, 3)[None, :]  # (K, 4)
    idx = jnp.clip(idx, 0, n - 1)
    # scatter-free one-hot: (K, 4, n) -> sum over taps
    grid = jnp.arange(n)[None, None, :]
    onehot = (idx[:, :, None] == grid).astype(w.dtype)
    return jnp.einsum("kt,ktn->kn", w, onehot)


def sample_descriptors_onehot(
    desc_raw: jnp.ndarray,
    points: jnp.ndarray,
    grid_size: int = 8,
    normalize: bool = True,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Bicubic descriptor interpolation at (K, 2) points as ONE matmul.

    The separable form (``sample_descriptors_matmul``) exposes a
    (K, Wc, C) intermediate that XLA materializes when batched — at
    batch 64 / K=1000 that is GBs of HBM traffic. Here the y/x cubic
    weights combine into a (K, Hc*Wc) interpolation matrix (16 nonzero
    taps per row) and descriptors come from a single
    (K, Hc*Wc) @ (Hc*Wc, C) MXU contraction. Same geometry as the
    reference's dense bicubic x8 upsample sampled at keypoints
    (heads.py:65-67)."""
    Hc, Wc, C = desc_raw.shape
    Wy = _axis_weight_matrix(points[:, 0], Hc, grid_size)
    Wx = _axis_weight_matrix(points[:, 1], Wc, grid_size)
    W2 = (Wy[:, :, None] * Wx[:, None, :]).reshape(Wy.shape[0], Hc * Wc)
    out = jnp.dot(W2.astype(compute_dtype),
                  desc_raw.reshape(Hc * Wc, C).astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    if normalize:
        out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
    return out


def sample_descriptors_matmul(
    desc_raw: jnp.ndarray,
    points: jnp.ndarray,
    grid_size: int = 8,
    normalize: bool = True,
) -> jnp.ndarray:
    """Bicubic descriptor interpolation at (K, 2) points as two separable
    matmuls: out[k] = sum_h sum_w Wy[k,h] Wx[k,w] desc[h,w]."""
    Hc, Wc, C = desc_raw.shape
    K = points.shape[0]
    Wy = _axis_weight_matrix(points[:, 0], Hc, grid_size).astype(desc_raw.dtype)
    Wx = _axis_weight_matrix(points[:, 1], Wc, grid_size).astype(desc_raw.dtype)
    # contract H on the MXU: (K, Hc) @ (Hc, Wc*C)
    tmp = jnp.dot(Wy, desc_raw.reshape(Hc, Wc * C),
                  preferred_element_type=jnp.float32).reshape(K, Wc, C)
    # contract W as an explicit VPU reduction (a k-batched matvec would
    # lower to K tiny matmuls)
    out = jnp.sum(Wx[:, :, None] * tmp, axis=1)
    if normalize:
        out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
    return out
