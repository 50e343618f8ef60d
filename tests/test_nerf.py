import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.models.nerf import (
    NeRFConfig,
    camera_rays,
    composite,
    init_nerf,
    positional_encoding,
    render_image,
    render_rays,
    render_weights,
    sample_pdf,
    stratified_samples,
)


def test_positional_encoding_shapes():
    x = jnp.zeros((5, 3))
    enc = positional_encoding(x, 10)
    assert enc.shape == (5, 3 + 3 * 2 * 10)
    # sin(0)=0, cos(0)=1 structure
    assert float(enc[0, 0]) == 0.0


def test_render_weights_opaque_surface():
    # one huge density at sample 3 -> weight concentrates there
    t = jnp.linspace(2.0, 6.0, 8)[None, :].repeat(2, 0)
    sigma = jnp.zeros((2, 8)).at[:, 3].set(1e5)
    w = render_weights(sigma, t)
    assert float(w[0, 3]) > 0.99
    assert float(w[0, :3].sum()) < 1e-3


def test_composite_depth_is_weighted_distance():
    t = jnp.array([[1.0, 2.0, 3.0]])
    w = jnp.array([[0.0, 1.0, 0.0]])
    rgb = jnp.ones((1, 3, 3)) * 0.5
    color, depth, acc = composite(w, rgb, t)
    assert float(depth[0]) == pytest.approx(2.0)
    assert float(acc[0]) == pytest.approx(1.0)
    np.testing.assert_allclose(np.asarray(color[0]), 0.5)


def test_stratified_samples_in_range():
    t = stratified_samples(jax.random.PRNGKey(0), 16, 2.0, 6.0, (4,))
    assert t.shape == (4, 16)
    assert float(t.min()) >= 2.0 and float(t.max()) <= 6.0
    # monotone increasing per ray
    assert np.all(np.diff(np.asarray(t), axis=-1) > 0)


def test_sample_pdf_concentrates_on_peak():
    bins = jnp.linspace(0.0, 1.0, 9)[None, :].repeat(2, 0)  # (2, 9)
    weights = jnp.zeros((2, 8)).at[:, 4].set(100.0)
    samples = sample_pdf(jax.random.PRNGKey(0), bins, weights, 64)
    frac = np.mean((np.asarray(samples) >= 0.5) & (np.asarray(samples) <= 0.625))
    assert frac > 0.9


def test_camera_rays_unit_and_center():
    H, W = 8, 8
    K = jnp.array([[8.0, 0, 4.0], [0, 8.0, 4.0], [0, 0, 1]])
    c2w = jnp.eye(4)
    o, d = camera_rays((H, W), K, c2w)
    norms = jnp.linalg.norm(d, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
    # center pixel ray ~ optical axis (z forward)
    center = np.asarray(d.reshape(H, W, 3)[4, 4])
    assert center[2] > 0.99


@pytest.mark.slow
def test_render_rays_and_image_shapes():
    cfg = NeRFConfig(depth=2, width=16, skip_layer=1, pos_freqs=2, dir_freqs=1,
                     n_coarse=4, n_fine=4, near=2.0, far=6.0)
    model, params = init_nerf(jax.random.PRNGKey(0), cfg)
    o = jnp.zeros((10, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (10, 1))
    out = render_rays(model, params, jax.random.PRNGKey(1), o, d, cfg)
    assert out["rgb"].shape == (10, 3)
    assert out["depth"].shape == (10,)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    # depth bounded by [0 (empty space), far]
    assert float(out["depth"].max()) <= cfg.far + 1e-3

    K = jnp.array([[8.0, 0, 4.0], [0, 8.0, 4.0], [0, 0, 1]])
    img = render_image(model, params, jax.random.PRNGKey(2), (8, 8), K,
                       jnp.eye(4), cfg, chunk=32)
    assert img["rgb"].shape == (8, 8, 3)
    assert img["depth"].shape == (8, 8)


@pytest.mark.slow
def test_nerf_overfits_single_ray_batch():
    """Tiny NeRF must fit a constant-color target quickly."""
    import optax

    cfg = NeRFConfig(depth=2, width=32, skip_layer=1, pos_freqs=4, dir_freqs=2,
                     n_coarse=8, n_fine=8)
    model, params = init_nerf(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(5e-3)
    opt = tx.init(params)
    o = jnp.zeros((32, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (32, 1))
    target = jnp.tile(jnp.array([[0.2, 0.7, 0.4]]), (32, 1))

    @jax.jit
    def step(p, opt_state, key):
        def loss_fn(pp):
            out = render_rays(model, pp, key, o, d, cfg)
            return jnp.mean((out["rgb"] - target) ** 2) + jnp.mean(
                (out["rgb_coarse"] - target) ** 2
            )

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    key = jax.random.PRNGKey(3)
    first = None
    for i in range(80):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.7
    assert np.isfinite(float(loss))
