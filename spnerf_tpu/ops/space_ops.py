"""Depth-to-space / space-to-depth for NHWC tensors.

Channel ordering matches torch.pixel_shuffle / pixel_unshuffle so that
cell-grid semantics (dustbin decoding, detector-loss label construction)
are bit-identical to the reference (heads.py:27, losses.py:14).

torch.pixel_shuffle maps input channel (i * r + j) -> spatial offset
(i, j) inside each r x r cell.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, r*r*C) -> (B, H*r, W*r, C), torch.pixel_shuffle order."""
    B, H, W, C = x.shape
    c = C // (r * r)
    # torch layout: channel index = co * r * r + i * r + j
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, i, W, j, c
    return x.reshape(B, H * r, W * r, c)


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H*r, W*r, C) -> (B, H, W, r*r*C), torch.pixel_unshuffle order."""
    B, Hr, Wr, C = x.shape
    H, W = Hr // r, Wr // r
    x = x.reshape(B, H, r, W, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H, W, C, i, j
    return x.reshape(B, H, W, C * r * r)
