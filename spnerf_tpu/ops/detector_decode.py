"""Detector head decode: channel softmax -> drop dustbin -> depth-to-space.

Reference semantics: heads.py:25-29 (softmax over 65 channels, drop the
dustbin channel, pixel_shuffle x8). Implemented as a single fused XLA
expression; the softmax over the dropped-dustbin distribution is
computed in a numerically stable way without materializing the full
softmax twice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spnerf_tpu.ops.space_ops import depth_to_space


def decode_detector_logits(logits: jnp.ndarray, grid_size: int = 8) -> jnp.ndarray:
    """(B, Hc, Wc, grid_size**2 + 1) logits -> (B, H, W) probability heatmap."""
    probs = jax.nn.softmax(logits, axis=-1)[..., :-1]
    return depth_to_space(probs, grid_size)[..., 0]
