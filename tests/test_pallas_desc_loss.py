"""Pallas blockwise descriptor loss vs the dense reference (interpret
mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.kernels.descriptor_loss_pallas import descriptor_loss_pallas
from spnerf_tpu.train.losses import (
    DescriptorLossConfig,
    cell_grid_coords,
    descriptor_loss_from_cells,
)


@pytest.fixture(scope="module")
def setup(  ):
    rng = np.random.default_rng(0)
    B, Hc, Wc, C, g = 2, 6, 8, 32, 8
    cfg = DescriptorLossConfig(grid_size=g, lambda_d=250, lambda_loss=1e-4,
                               positive_margin=1.0, negative_margin=0.2)
    desc = rng.standard_normal((B, Hc, Wc, C)).astype(np.float32) * 0.2
    wdesc = rng.standard_normal((B, Hc, Wc, C)).astype(np.float32) * 0.2
    warped = rng.uniform(0, 60, (B, Hc * Wc, 2)).astype(np.float32)
    valid = np.ones((B, Hc * g, Wc * g), np.float32)
    valid[:, :8] = 0
    return cfg, desc, wdesc, warped, valid


def test_pallas_matches_dense_forward(setup):
    cfg, desc, wdesc, warped, valid = setup
    dense = descriptor_loss_from_cells(
        jnp.asarray(desc), jnp.asarray(wdesc), jnp.asarray(warped), cfg,
        jnp.asarray(valid))
    fused = descriptor_loss_pallas(
        jnp.asarray(desc), jnp.asarray(wdesc), jnp.asarray(warped), cfg,
        jnp.asarray(valid), interpret=True)
    # dense path uses default-precision matmul; pallas accumulates fp32
    np.testing.assert_allclose(float(fused[0]), float(dense[0]), rtol=5e-3)
    np.testing.assert_allclose(float(fused[1]), float(dense[1]), rtol=5e-3)
    np.testing.assert_allclose(float(fused[2]), float(dense[2]), rtol=5e-3)


def test_pallas_matches_dense_gradients(setup):
    cfg, desc, wdesc, warped, valid = setup

    def dense_loss(a, b):
        return descriptor_loss_from_cells(a, b, jnp.asarray(warped), cfg,
                                          jnp.asarray(valid))[0]

    def pallas_loss(a, b):
        return descriptor_loss_pallas(a, b, jnp.asarray(warped), cfg,
                                      jnp.asarray(valid), interpret=True)[0]

    ga_d, gb_d = jax.grad(dense_loss, argnums=(0, 1))(
        jnp.asarray(desc), jnp.asarray(wdesc))
    ga_p, gb_p = jax.grad(pallas_loss, argnums=(0, 1))(
        jnp.asarray(desc), jnp.asarray(wdesc))
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_d),
                               rtol=5e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_d),
                               rtol=5e-3, atol=1e-6)


def test_pallas_no_mask(setup):
    cfg, desc, wdesc, warped, _ = setup
    dense = descriptor_loss_from_cells(
        jnp.asarray(desc), jnp.asarray(wdesc), jnp.asarray(warped), cfg, None)
    fused = descriptor_loss_pallas(
        jnp.asarray(desc), jnp.asarray(wdesc), jnp.asarray(warped), cfg,
        None, interpret=True)
    np.testing.assert_allclose(float(fused[0]), float(dense[0]), rtol=5e-3)


def test_normalised_blockwise_matches_dense(setup):
    import dataclasses

    from spnerf_tpu.train.losses import descriptor_loss_normalised_blockwise

    cfg, desc, wdesc, warped, valid = setup
    ncfg = dataclasses.replace(cfg, normalise_descriptors=True)

    dense = descriptor_loss_from_cells(
        jnp.asarray(desc), jnp.asarray(wdesc), jnp.asarray(warped), ncfg,
        jnp.asarray(valid))
    # tile smaller than N=48 so the scan actually tiles (and pads)
    blk = descriptor_loss_normalised_blockwise(
        jnp.asarray(desc), jnp.asarray(wdesc), jnp.asarray(warped), ncfg,
        jnp.asarray(valid), tile=16)
    for i in range(3):
        np.testing.assert_allclose(float(blk[i]), float(dense[i]),
                                   rtol=2e-3, atol=1e-9, err_msg=str(i))


def test_normalised_blockwise_gradients(setup):
    import dataclasses

    from spnerf_tpu.train.losses import descriptor_loss_normalised_blockwise

    cfg, desc, wdesc, warped, valid = setup
    ncfg = dataclasses.replace(cfg, normalise_descriptors=True)

    def dense_loss(a, b):
        return descriptor_loss_from_cells(a, b, jnp.asarray(warped), ncfg,
                                          jnp.asarray(valid))[0]

    def blk_loss(a, b):
        return descriptor_loss_normalised_blockwise(
            a, b, jnp.asarray(warped), ncfg, jnp.asarray(valid), tile=16)[0]

    ga_d, gb_d = jax.grad(dense_loss, argnums=(0, 1))(
        jnp.asarray(desc), jnp.asarray(wdesc))
    ga_b, gb_b = jax.grad(blk_loss, argnums=(0, 1))(
        jnp.asarray(desc), jnp.asarray(wdesc))
    np.testing.assert_allclose(np.asarray(ga_b), np.asarray(ga_d),
                               rtol=5e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gb_b), np.asarray(gb_d),
                               rtol=5e-3, atol=1e-7)
