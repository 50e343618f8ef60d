"""Training losses — detector cross-entropy and descriptor hinge.

Semantics match reference utils/losses.py exactly (file:line cited per
function); layout is NHWC and the pairwise descriptor volume is computed
as a batched (N, C) x (C, N) matmul that XLA maps straight onto the MXU
— the reference materializes the same volume via broadcast-multiply
-reduce over a 6-D tensor (losses.py:64-96), which is bandwidth-bound.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from spnerf_tpu.geometry.homography import warp_points
from spnerf_tpu.geometry.reprojection import warp_points_nerf
from spnerf_tpu.ops.space_ops import space_to_depth


def _cell_mask(valid_mask: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """(B, H, W) pixel mask -> (B, Hc, Wc) cell mask (all pixels valid).

    Matches torch.pixel_unshuffle + prod (reference losses.py:24-27).
    """
    cells = space_to_depth(valid_mask[..., None].astype(jnp.float32), grid_size)
    return jnp.prod(cells, axis=-1)


def detector_loss(
    key: jax.Array,
    logits: jnp.ndarray,
    kpts_heatmap: jnp.ndarray,
    valid_mask: jnp.ndarray | None = None,
    grid_size: int = 8,
) -> jnp.ndarray:
    """Per-cell 65-way cross-entropy with dustbin (reference losses.py:6-36).

    logits: (B, Hc, Wc, 65); kpts_heatmap: (B, H, W) binary;
    valid_mask: (B, H, W) or None (= all valid, include_mask=False).

    Label construction: pixel-unshuffled heatmap scaled by 2 + always-on
    dustbin channel, argmax after adding U(0, 0.1) tie-break noise — so a
    cell with >=1 keypoint picks one keypoint channel at random, and an
    empty cell picks the dustbin.
    """
    labels = space_to_depth(kpts_heatmap[..., None].astype(jnp.float32), grid_size)
    B, Hc, Wc, _ = labels.shape
    dustbin = jnp.ones((B, Hc, Wc, 1), jnp.float32)
    labels = jnp.concatenate([2.0 * labels, dustbin], axis=-1)
    noise = jax.random.uniform(key, labels.shape, minval=0.0, maxval=0.1)
    label_idx = jnp.argmax(labels + noise, axis=-1)  # (B, Hc, Wc)

    if valid_mask is None:
        mask = jnp.ones((B, Hc, Wc), jnp.float32)
    else:
        mask = _cell_mask(valid_mask, grid_size)

    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, label_idx[..., None], axis=-1)[..., 0]
    ce = logz - picked  # (B, Hc, Wc)

    per_image = jnp.sum(ce * mask, axis=(1, 2)) / (jnp.sum(mask, axis=(1, 2)) + 1e-10)
    return jnp.mean(per_image)


@dataclasses.dataclass(frozen=True)
class DescriptorLossConfig:
    grid_size: int = 8
    lambda_d: float = 250.0
    lambda_loss: float = 0.0001
    positive_margin: float = 1.0
    negative_margin: float = 0.2
    normalise_descriptors: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "DescriptorLossConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


def cell_grid_coords(Hc: int, Wc: int, grid_size: int) -> jnp.ndarray:
    """(Hc*Wc, 2) (y, x) centers of the 8-strided cell grid (losses.py:56-57)."""
    ys, xs = jnp.meshgrid(jnp.arange(Hc), jnp.arange(Wc), indexing="ij")
    cells = jnp.stack([ys, xs], axis=-1).reshape(-1, 2)
    return (cells * grid_size + grid_size // 2).astype(jnp.float32)


def descriptor_loss_from_cells(
    desc_raw: jnp.ndarray,
    warped_desc_raw: jnp.ndarray,
    warped_cells: jnp.ndarray,
    config: DescriptorLossConfig,
    valid_mask: jnp.ndarray | None = None,
):
    """Hinge contrastive loss over all cell pairs (reference losses.py:39-116).

    desc_raw, warped_desc_raw: (B, Hc, Wc, C) raw head outputs.
    warped_cells: (B, Hc*Wc, 2) — raw-image cell centers warped into the
    warped image (by homography or NeRF reprojection).
    valid_mask: (B, H, W) over the *warped* image, or None.

    Returns (loss, positive_summary, negative_summary).
    """
    cfg = config
    g = cfg.grid_size
    B, Hc, Wc, C = desc_raw.shape
    N = Hc * Wc

    cells = cell_grid_coords(Hc, Wc, g)  # (N, 2) — warped-image cell centers
    # dist[b, n, m] = || cells[m] - warped_cells[b, n] ||
    diff = cells[None, None, :, :] - warped_cells[:, :, None, :]
    dist = jnp.linalg.norm(diff, axis=-1)  # (B, N, N)

    A = desc_raw.reshape(B, N, C)
    Bm = warped_desc_raw.reshape(B, N, C)

    if cfg.normalise_descriptors:
        s = (dist <= (g - 0.5)).astype(jnp.float32)
        A = A / (jnp.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
        Bm = Bm / (jnp.linalg.norm(Bm, axis=-1, keepdims=True) + 1e-12)
        dot = jnp.einsum("bnc,bmc->bnm", A, Bm)
        dot = jax.nn.relu(dot)
        # double normalization of the dot volume (losses.py:74-84):
        # across warped cells (m) per (b, n), then across raw cells (n)
        dot = dot / (jnp.linalg.norm(dot, axis=2, keepdims=True) + 1e-12)
        dot = dot / (jnp.linalg.norm(dot, axis=1, keepdims=True) + 1e-12)
    else:
        s = (dist <= g).astype(jnp.float32)
        dot = jnp.einsum("bnc,bmc->bnm", A, Bm)

    positive = jax.nn.relu(cfg.positive_margin - dot)
    negative = jax.nn.relu(dot - cfg.negative_margin)
    pairwise = cfg.lambda_d * s * positive + (1.0 - s) * negative  # (B, N, N)

    if valid_mask is None:
        mask = jnp.ones((B, 1, N), jnp.float32)
    else:
        mask = _cell_mask(valid_mask, g).reshape(B, 1, N)

    normalization = jnp.sum(mask) * N
    loss = cfg.lambda_loss * jnp.sum(mask * pairwise) / normalization
    pos_summary = jnp.sum(mask * cfg.lambda_d * s * positive) / normalization
    neg_summary = jnp.sum(mask * (1.0 - s) * negative) / normalization
    return loss, pos_summary, neg_summary


def descriptor_loss(
    desc_raw, warped_desc_raw, homographies, config, valid_mask=None
):
    """Homography variant (reference losses.py:39-116)."""
    B, Hc, Wc, _ = desc_raw.shape
    cells = cell_grid_coords(Hc, Wc, config.grid_size)
    warped = warp_points(cells, homographies)  # (B, N, 2)
    if warped.ndim == 2:
        warped = warped[None]
    return descriptor_loss_from_cells(
        desc_raw, warped_desc_raw, warped, config, valid_mask
    )


def descriptor_loss_nerf(
    desc_raw,
    warped_desc_raw,
    depth,
    intrinsics,
    rotation_in,
    translation_in,
    rotation_warp,
    translation_warp,
    config,
    valid_mask=None,
):
    """NeRF variant: cells warped by 3D depth reprojection
    (reference losses.py:118-203 / kp_utils.py:68-135)."""
    B, Hc, Wc, _ = desc_raw.shape
    cells = cell_grid_coords(Hc, Wc, config.grid_size)
    warped = warp_points_nerf(
        cells, depth, intrinsics, rotation_in, translation_in,
        rotation_warp, translation_warp,
    )
    return descriptor_loss_from_cells(
        desc_raw, warped_desc_raw, warped, config, valid_mask
    )


def descriptor_loss_normalised_blockwise(
    desc_raw: jnp.ndarray,
    warped_desc_raw: jnp.ndarray,
    warped_cells: jnp.ndarray,
    config: DescriptorLossConfig,
    valid_mask: jnp.ndarray | None = None,
    tile: int = 400,
):
    """O(tile*N)-memory ``normalise_descriptors=True`` descriptor loss.

    Bitwise-equivalent reformulation of the dense normalise branch of
    ``descriptor_loss_from_cells`` (reference losses.py:74-84: relu'd
    dot volume double-normalized across warped cells then raw cells)
    that never materializes the (N, N) volume with AD residuals
    attached. The row norm ||relu(A_n . B^T)|| only needs the n-th
    row, so it is local to a row tile; only the column norm couples
    rows, so two checkpointed scans over row tiles suffice:

        pass 1: accumulate c2[m] = sum_n (relu(dot)/r_n)[n, m]^2
        pass 2: hinge sums on V = (relu(dot)/r_n)/c_m

    Each scan body recomputes its (tile, N) dot block on the MXU
    (flash-attention-style); jax.checkpoint re-runs it in the backward
    pass, so AD residual memory is O(tile*N), not O(N^2). The hot
    normalise=False path has a hand-written Pallas kernel
    (kernels/descriptor_loss_pallas.py); this variant is config-rare
    (every shipped reference config sets normalise_descriptors: False)
    so it trades a little recompute for zero extra kernel surface.
    """
    cfg = config
    g = cfg.grid_size
    B, Hc, Wc, C = desc_raw.shape
    N = Hc * Wc
    radius = float(g) - 0.5

    cells = cell_grid_coords(Hc, Wc, g)  # (N, 2) warped-image centers
    A = desc_raw.reshape(B, N, C)
    Bm = warped_desc_raw.reshape(B, N, C)
    A = A / (jnp.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
    Bm = Bm / (jnp.linalg.norm(Bm, axis=-1, keepdims=True) + 1e-12)

    if valid_mask is None:
        mask_m = jnp.ones((B, N), jnp.float32)
    else:
        mask_m = _cell_mask(valid_mask, g).reshape(B, N)

    n_tiles = -(-N // tile)
    Np = n_tiles * tile
    pad = Np - N

    def one(a, bm, wc, mm):
        # pad rows: zero descriptors (dot row 0 -> U row 0, no c2 or
        # hinge contribution) and far-away warped cells (s = 0)
        a_p = jnp.pad(a, ((0, pad), (0, 0)))
        wy = jnp.pad(wc[:, 0], (0, pad), constant_values=1e9)
        wx = jnp.pad(wc[:, 1], (0, pad), constant_values=1e9)
        a_t = a_p.reshape(n_tiles, tile, C)
        wy_t = wy.reshape(n_tiles, tile)
        wx_t = wx.reshape(n_tiles, tile)

        def row_block(a_tile):
            dot = jax.nn.relu(a_tile @ bm.T)  # (tile, N)
            r = jnp.linalg.norm(dot, axis=1, keepdims=True) + 1e-12
            return dot / r  # U rows

        @jax.checkpoint
        def pass1(c2, a_tile):
            u = row_block(a_tile)
            return c2 + jnp.sum(u * u, axis=0), None

        c2, _ = jax.lax.scan(pass1, jnp.zeros((N,), jnp.float32), a_t)
        c = jnp.sqrt(c2) + 1e-12  # (N,) column norms of U

        @jax.checkpoint
        def pass2(sums, inp):
            a_tile, wy_i, wx_i = inp
            v = row_block(a_tile) / c[None, :]
            d2 = (cells[None, :, 0] - wy_i[:, None]) ** 2 + (
                cells[None, :, 1] - wx_i[:, None]) ** 2
            s = (d2 <= radius * radius).astype(jnp.float32)
            pos = cfg.lambda_d * s * jax.nn.relu(cfg.positive_margin - v)
            neg = (1.0 - s) * jax.nn.relu(v - cfg.negative_margin)
            w = mm[None, :]
            return (sums[0] + jnp.sum(w * (pos + neg)),
                    sums[1] + jnp.sum(w * pos),
                    sums[2] + jnp.sum(w * neg)), None

        zeros = (jnp.zeros((), jnp.float32),) * 3
        (s_pair, s_pos, s_neg), _ = jax.lax.scan(
            pass2, zeros, (a_t, wy_t, wx_t))
        return s_pair, s_pos, s_neg

    s_pair, s_pos, s_neg = jax.vmap(one)(A, Bm, warped_cells, mask_m)
    normalization = jnp.sum(mask_m) * N
    loss = cfg.lambda_loss * jnp.sum(s_pair) / normalization
    pos = jax.lax.stop_gradient(jnp.sum(s_pos) / normalization)
    neg = jax.lax.stop_gradient(jnp.sum(s_neg) / normalization)
    return loss, pos, neg
