import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.train.losses import (
    DescriptorLossConfig,
    cell_grid_coords,
    descriptor_loss,
    descriptor_loss_from_cells,
    detector_loss,
)


def _detector_loss_numpy(logits, heatmap, valid_mask, grid_size=8):
    """Numpy oracle for the reference detector loss (losses.py:6-36),
    valid when every cell contains at most one keypoint (tie-break
    noise then cannot change the argmax)."""
    B, Hc, Wc, C = logits.shape
    g = grid_size
    # unshuffle the heatmap into cells, torch pixel_unshuffle order
    cells = heatmap.reshape(B, Hc, g, Wc, g).transpose(0, 1, 3, 2, 4)
    cells = cells.reshape(B, Hc, Wc, g * g)
    has_kp = cells.max(-1) > 0
    label = np.where(has_kp, cells.argmax(-1), g * g)  # dustbin index = 64

    mcells = valid_mask.reshape(B, Hc, g, Wc, g).transpose(0, 1, 3, 2, 4)
    mask = mcells.reshape(B, Hc, Wc, g * g).prod(-1)

    logz = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
    picked = np.take_along_axis(logits, label[..., None], axis=-1)[..., 0]
    ce = logz - picked
    per_image = (ce * mask).sum((1, 2)) / (mask.sum((1, 2)) + 1e-10)
    return per_image.mean()


def test_detector_loss_matches_oracle(rng):
    B, Hc, Wc, g = 2, 3, 4, 8
    logits = rng.standard_normal((B, Hc, Wc, 65)).astype(np.float32)
    heatmap = np.zeros((B, Hc * g, Wc * g), np.float32)
    # at most one keypoint per cell
    for b in range(B):
        for ci in range(Hc):
            for cj in range(Wc):
                if rng.uniform() < 0.5:
                    heatmap[b, ci * g + rng.integers(g), cj * g + rng.integers(g)] = 1
    valid = np.ones((B, Hc * g, Wc * g), np.float32)
    valid[:, :8, :] = 0.0  # knock out the first cell row

    expected = _detector_loss_numpy(logits, heatmap, valid, g)
    got = detector_loss(
        jax.random.PRNGKey(0),
        jnp.asarray(logits),
        jnp.asarray(heatmap),
        jnp.asarray(valid),
        grid_size=g,
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-4)


def test_detector_loss_no_mask_equals_full_mask(rng):
    B, Hc, Wc, g = 1, 2, 2, 8
    logits = rng.standard_normal((B, Hc, Wc, 65)).astype(np.float32)
    heatmap = np.zeros((B, Hc * g, Wc * g), np.float32)
    heatmap[0, 3, 3] = 1
    key = jax.random.PRNGKey(1)
    a = detector_loss(key, jnp.asarray(logits), jnp.asarray(heatmap), None, g)
    b = detector_loss(key, jnp.asarray(logits), jnp.asarray(heatmap),
                      jnp.ones((B, Hc * g, Wc * g)), g)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_detector_loss_perfect_logits_small(rng):
    # strong correct logits -> loss near zero
    B, Hc, Wc, g = 1, 2, 2, 8
    heatmap = np.zeros((B, Hc * g, Wc * g), np.float32)
    heatmap[0, 2, 3] = 1  # cell (0,0), offset (2,3) -> channel 2*8+3=19
    logits = np.full((B, Hc, Wc, 65), -10.0, np.float32)
    logits[..., 64] = 10.0  # dustbin everywhere
    logits[0, 0, 0, 64] = -10.0
    logits[0, 0, 0, 19] = 10.0
    loss = detector_loss(jax.random.PRNGKey(0), jnp.asarray(logits),
                         jnp.asarray(heatmap), None, g)
    assert float(loss) < 1e-3


def _descriptor_loss_numpy(desc, wdesc, warped_cells, cfg, valid_mask):
    """Numpy oracle for reference losses.py:39-116 (normalise=False)."""
    B, Hc, Wc, C = desc.shape
    g = cfg.grid_size
    N = Hc * Wc
    ys, xs = np.meshgrid(np.arange(Hc), np.arange(Wc), indexing="ij")
    cells = (np.stack([ys, xs], -1).reshape(-1, 2) * g + g // 2).astype(np.float32)
    dist = np.linalg.norm(cells[None, None] - warped_cells[:, :, None], axis=-1)
    s = (dist <= g).astype(np.float32)
    A = desc.reshape(B, N, C)
    Bm = wdesc.reshape(B, N, C)
    dot = np.einsum("bnc,bmc->bnm", A, Bm)
    positive = np.maximum(0.0, cfg.positive_margin - dot)
    negative = np.maximum(0.0, dot - cfg.negative_margin)
    pair = cfg.lambda_d * s * positive + (1 - s) * negative
    mc = valid_mask.reshape(B, Hc, g, Wc, g).transpose(0, 1, 3, 2, 4)
    mask = mc.reshape(B, Hc, Wc, g * g).prod(-1).reshape(B, 1, N)
    norm = mask.sum() * N
    return cfg.lambda_loss * (mask * pair).sum() / norm


def test_descriptor_loss_matches_oracle(rng):
    B, Hc, Wc, C, g = 2, 3, 4, 16, 8
    cfg = DescriptorLossConfig(grid_size=g, lambda_d=250, lambda_loss=1e-4,
                               positive_margin=1.0, negative_margin=0.2)
    desc = rng.standard_normal((B, Hc, Wc, C)).astype(np.float32)
    wdesc = rng.standard_normal((B, Hc, Wc, C)).astype(np.float32)
    warped = rng.uniform(0, 32, (B, Hc * Wc, 2)).astype(np.float32)
    valid = np.ones((B, Hc * g, Wc * g), np.float32)
    expected = _descriptor_loss_numpy(desc, wdesc, warped, cfg, valid)
    got, pos, neg = descriptor_loss_from_cells(
        jnp.asarray(desc), jnp.asarray(wdesc), jnp.asarray(warped), cfg,
        jnp.asarray(valid))
    # default matmul precision (bf16 on MXU) is intentional on the hot
    # descriptor dot-product: allow a correspondingly loose tolerance
    np.testing.assert_allclose(float(got), expected, rtol=5e-3)
    assert float(pos) >= 0 and float(neg) >= 0


def test_descriptor_loss_identity_homography_prefers_matching(rng):
    """With identity homography, loss decreases when corresponding cells
    have identical descriptors vs random ones."""
    B, Hc, Wc, C, g = 1, 4, 4, 8, 8
    cfg = DescriptorLossConfig(grid_size=g)
    H = jnp.eye(3)[None]
    desc = rng.standard_normal((B, Hc, Wc, C)).astype(np.float32)
    matched, _, _ = descriptor_loss(jnp.asarray(desc), jnp.asarray(desc), H, cfg)
    other = rng.standard_normal((B, Hc, Wc, C)).astype(np.float32)
    random_loss, _, _ = descriptor_loss(jnp.asarray(desc), jnp.asarray(other), H, cfg)
    # matched descriptors on the diagonal give high dot where s=1
    assert float(matched) < float(random_loss)


def test_descriptor_loss_normalised_variant_runs(rng):
    B, Hc, Wc, C, g = 1, 3, 3, 8, 8
    cfg = DescriptorLossConfig(grid_size=g, normalise_descriptors=True)
    desc = rng.standard_normal((B, Hc, Wc, C)).astype(np.float32)
    wdesc = rng.standard_normal((B, Hc, Wc, C)).astype(np.float32)
    loss, pos, neg = descriptor_loss(
        jnp.asarray(desc), jnp.asarray(wdesc), jnp.eye(3)[None], cfg)
    assert np.isfinite(float(loss))


def test_cell_grid_coords():
    cells = np.asarray(cell_grid_coords(2, 3, 8))
    assert cells.shape == (6, 2)
    np.testing.assert_array_equal(cells[0], [4, 4])
    np.testing.assert_array_equal(cells[1], [4, 12])
    np.testing.assert_array_equal(cells[3], [12, 4])
