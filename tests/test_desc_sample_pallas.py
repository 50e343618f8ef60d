"""Fused Pallas descriptor sampling vs the XLA onehot path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.kernels.desc_sample_pallas import sample_descriptors_fused
from spnerf_tpu.ops.fast_inference import sample_descriptors_onehot


@pytest.mark.parametrize("Hc,Wc,K", [(30, 40, 100), (16, 24, 64)])
@pytest.mark.parametrize("normalize", [True, False])
def test_matches_onehot_path(Hc, Wc, K, normalize):
    key = jax.random.PRNGKey(0)
    B, C, g = 2, 64, 8
    desc = jax.random.normal(key, (B, Hc, Wc, C), jnp.bfloat16)
    ky, kx = jax.random.split(key)
    pts = jnp.stack([jax.random.uniform(ky, (B, K)) * (Hc * g - 1),
                     jax.random.uniform(kx, (B, K)) * (Wc * g - 1)], -1)
    ref = jax.vmap(lambda d, p: sample_descriptors_onehot(
        d, p, g, normalize=normalize))(desc, pts)
    got = sample_descriptors_fused(desc, pts, g, normalize=normalize,
                                   block_k=64)
    # same bf16 contraction, different accumulation order
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_border_clamping_and_padding():
    """Points at the exact image corners (clipped taps) and a K that is
    not a multiple of block_k."""
    key = jax.random.PRNGKey(1)
    B, Hc, Wc, C, g = 1, 12, 16, 32, 8
    desc = jax.random.normal(key, (B, Hc, Wc, C), jnp.bfloat16)
    pts = jnp.array([[[0.0, 0.0], [Hc * g - 1.0, Wc * g - 1.0],
                      [0.0, Wc * g - 1.0], [37.3, 55.9], [3.1, 2.2]]])
    ref = jax.vmap(lambda d, p: sample_descriptors_onehot(d, p, g))(desc, pts)
    got = sample_descriptors_fused(desc, pts, g, block_k=8)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_unit_norm():
    key = jax.random.PRNGKey(2)
    desc = jax.random.normal(key, (1, 20, 20, 48), jnp.bfloat16)
    pts = jax.random.uniform(key, (1, 33, 2)) * 150.0
    out = sample_descriptors_fused(desc, pts, 8, normalize=True, block_k=16)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)


def test_axis_weights_pin_against_xla_helper():
    """_axis_weights (in-kernel broadcast construction) must stay in
    lockstep with ops/fast_inference._axis_weight_matrix (one-hot sum):
    the two re-derive the same Keys a=-0.75 taps + border clamping from
    independent formulations, and parity tests only catch drift if both
    move together (ADVICE r4). Pin them directly, including borders."""
    from spnerf_tpu.kernels.desc_sample_pallas import _axis_weights
    from spnerf_tpu.ops.fast_inference import _axis_weight_matrix

    n, g = 17, 8
    coord = jnp.asarray(
        [0.0, 1.0, 3.5, 4.0, 63.9, 100.0, n * g - 1.0, 2.25, 57.125],
        jnp.float32)
    ref = _axis_weight_matrix(coord, n, g)
    got = _axis_weights(coord[:, None], n, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
