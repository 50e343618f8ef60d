"""Validation metrics (reference utils/metrics.py:3-10)."""

from __future__ import annotations

import jax.numpy as jnp


def precision_recall(pred_pts: jnp.ndarray, kpts_heatmap: jnp.ndarray):
    """Precision/recall of binary predicted keypoints vs the label heatmap.

    pred_pts, kpts_heatmap: (B, H, W) {0, 1}.
    """
    pred = pred_pts.astype(jnp.float32)
    labels = kpts_heatmap.astype(jnp.float32)
    tp = jnp.sum(pred * labels)
    precision = tp / (jnp.sum(pred) + 1e-10)
    recall = tp / (jnp.sum(labels) + 1e-10)
    return precision, recall
