import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from spnerf_tpu.models.hash_nerf import (
    HashNeRFConfig,
    init_hash_nerf,
    render_rays_hash,
)

TINY = HashNeRFConfig(n_levels=4, log2_table_size=12, base_resolution=4,
                      max_resolution=32, mlp_width=16, geo_features=7,
                      n_samples=16)


def test_hash_nerf_shapes():
    model, params = init_hash_nerf(jax.random.PRNGKey(0), TINY)
    pos = jax.random.normal(jax.random.PRNGKey(1), (5, 16, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    sigma, rgb = model.apply(params, pos, dirs)
    assert sigma.shape == (5, 16)
    assert rgb.shape == (5, 16, 3)
    assert np.isfinite(np.asarray(rgb)).all()
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1


def test_hash_nerf_render():
    model, params = init_hash_nerf(jax.random.PRNGKey(0), TINY)
    o = jnp.zeros((8, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    out = render_rays_hash(model, params, jax.random.PRNGKey(1), o, d, TINY)
    assert out["rgb"].shape == (8, 3)
    assert out["depth"].shape == (8,)
    assert float(out["depth"].max()) <= TINY.far + 1e-3


@pytest.mark.slow
def test_hash_nerf_overfits():
    model, params = init_hash_nerf(jax.random.PRNGKey(0), TINY)
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    o = jnp.zeros((32, 3))
    d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    target = jnp.tile(jnp.array([[0.8, 0.3, 0.5]]), (32, 1))

    @jax.jit
    def step(p, opt_state, key):
        def loss_fn(pp):
            out = render_rays_hash(model, pp, key, o, d, TINY)
            return jnp.mean((out["rgb"] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    key = jax.random.PRNGKey(3)
    first = None
    for i in range(60):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5
