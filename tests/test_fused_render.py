"""Fused Pallas render kernel vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from spnerf_tpu.models.fused_tiny_nerf import (
    TinyFieldConfig,
    direction_features,
    encode_rays,
    init_params,
    make_encoding,
    render_fused_rays,
    render_xla,
)

CFG = TinyFieldConfig(n_samples=8)


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0))
    d = jax.random.normal(jax.random.PRNGKey(1), (40, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jax.random.normal(jax.random.PRNGKey(2), (40, 3)) * 0.1
    return params, o, d


def test_fused_matches_xla(setup):
    params, o, d = setup
    A, c = make_encoding(CFG)
    oe, de = encode_rays(o, d, A, c)
    df = direction_features(params, d, A, c)
    ref = render_xla(params, oe, de, CFG, df=df)
    got = render_fused_rays(params, o, d, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(ref["rgb"]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=5e-3)


def test_fused_depth_in_range(setup):
    params, o, d = setup
    got = render_fused_rays(params, o, d, CFG, interpret=True)
    depth = np.asarray(got["depth"])
    assert depth.min() >= 0.0
    assert depth.max() <= CFG.far + 1e-3


def test_tiny_field_overfits():
    """The XLA training path fits a constant target; the fused kernel then
    reproduces the trained field."""
    cfg = TinyFieldConfig(n_samples=8)
    params = init_params(jax.random.PRNGKey(0))
    A, c = make_encoding(cfg)
    o = jnp.zeros((64, 3))
    d = jax.random.normal(jax.random.PRNGKey(3), (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    oe, de = encode_rays(o, d, A, c)
    target = jnp.tile(jnp.array([[0.7, 0.2, 0.4]]), (64, 1))
    df_fn = lambda p: direction_features(p, d, A, c)

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, opt_state):
        def loss_fn(pp):
            out = render_xla(pp, oe, de, cfg, df=df_fn(pp))
            return jnp.mean((out["rgb"] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    first = None
    for _ in range(120):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.5

    got = render_fused_rays(params, o, d, cfg, interpret=True)
    ref = render_xla(params, oe, de, cfg, df=df_fn(params))
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(ref["rgb"]),
                               atol=2e-3)


def test_multichunk_matches_xla(setup):
    """Sample chunking (s_chunk < n_samples) must be invisible."""
    params, o, d = setup
    cfg = TinyFieldConfig(n_samples=16)
    A, c = make_encoding(cfg)
    oe, de = encode_rays(o, d, A, c)
    df = direction_features(params, d, A, c)
    ref = render_xla(params, oe, de, cfg, df=df)
    got = render_fused_rays(params, o, d, cfg, s_chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got["rgb"]), np.asarray(ref["rgb"]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=5e-3)


def test_occupancy_skip_is_lossless(setup):
    """Real flags from the field's own density grid: skipped chunks are
    below the alpha threshold, so the render must match dense closely."""
    from spnerf_tpu.ops.occupancy import chunk_flags, field_integral_volume

    params, o, d = setup
    cfg = TinyFieldConfig(n_samples=16)
    ivol = field_integral_volume(params, cfg, resolution=32)
    flags = chunk_flags(o, d, ivol, block=512, n_samples=cfg.n_samples,
                        s_chunk=4, near=cfg.near, far=cfg.far,
                        extent=float(cfg.far))
    dense = render_fused_rays(params, o, d, cfg, s_chunk=4, interpret=True)
    skip = render_fused_rays(params, o, d, cfg, s_chunk=4,
                             occupancy_ivol=ivol, interpret=True)
    np.testing.assert_allclose(np.asarray(skip["rgb"]),
                               np.asarray(dense["rgb"]), atol=5e-3)
    assert flags.shape == (1, 4)


def test_integral_volume_box_counts():
    from spnerf_tpu.ops.occupancy import _box_count, integral_volume

    rng = np.random.default_rng(0)
    occ = jnp.asarray(rng.random((6, 6, 6)) > 0.6)
    ivol = integral_volume(occ)
    occ_np = np.asarray(occ)
    for _ in range(20):
        lo = rng.integers(0, 6, 3)
        hi = np.array([rng.integers(l, 6) for l in lo])
        want = occ_np[lo[0]:hi[0] + 1, lo[1]:hi[1] + 1, lo[2]:hi[2] + 1].sum()
        got = int(_box_count(ivol, jnp.asarray(lo), jnp.asarray(hi)))
        assert got == want, (lo, hi, got, want)


def test_sigma_probe_dominates_view_dependent_sigma():
    """The occupancy probe must upper-bound sigma over ALL view
    directions (sigma is view-dependent: df enters before layer 2), or
    chunk skipping could silently drop occupied chunks."""
    from spnerf_tpu.models.fused_tiny_nerf import (
        direction_features, init_params, make_encoding)
    from spnerf_tpu.ops.occupancy import field_sigma_grid

    cfg = TinyFieldConfig()
    params = init_params(jax.random.PRNGKey(3), scale=0.3)
    A, c = make_encoding(cfg)
    res = 12
    grid = np.asarray(
        field_sigma_grid(params, cfg, resolution=res, method="bound"))
    ext = float(cfg.far)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-ext, ext, (512, 3)).astype(np.float32)
    dirs = rng.normal(size=(512, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    df = direction_features(params, jnp.asarray(dirs), A, c)
    enc = jnp.sin(jnp.asarray(pts) @ A + c)
    h = jax.nn.relu(enc @ params["w1"])
    h = jax.nn.relu(h @ params["w2"] + df)
    sigma = np.asarray((h @ params["w3"])[:, 0])
    # each point's true sigma must not exceed the probe value of any cell
    # covering it (the grid is 2x supersampled + max-pooled, so the cell
    # value bounds the max over its supersample probes; allow the
    # coarse-grid slack by comparing against the covering cell)
    idx = np.clip(((pts + ext) / (2 * ext) * res).astype(int), 0, res - 1)
    cell = grid[idx[:, 0], idx[:, 1], idx[:, 2]]
    # the probe is a bound at its supersample POINTS; at off-probe points
    # a smooth field can exceed it slightly — require the overwhelming
    # majority to be dominated and no gross violation
    frac = float((sigma <= cell + 1e-3).mean())
    assert frac >= 0.95, frac


def test_sampled_sigma_probe_dominates_in_practice():
    """The default probe (max over sampled directions x margin) is a
    quality-gated approximation; on a random field it must still
    dominate the true sigma at unseen random directions for virtually
    all points, and must be strictly tighter than the analytic bound
    (which measures ~100% occupied on trained fields)."""
    from spnerf_tpu.models.fused_tiny_nerf import (
        TinyFieldConfig, direction_features, init_params, make_encoding)
    from spnerf_tpu.ops.occupancy import field_sigma_grid

    cfg = TinyFieldConfig()
    params = init_params(jax.random.PRNGKey(3), scale=0.3)
    A, c = make_encoding(cfg)
    res = 12
    grid = np.asarray(
        field_sigma_grid(params, cfg, resolution=res, method="sampled",
                         n_dirs=32, margin=2.0))
    bound = np.asarray(
        field_sigma_grid(params, cfg, resolution=res, method="bound"))
    assert grid.mean() < bound.mean()  # strictly tighter on average

    ext = float(cfg.far)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-ext, ext, (512, 3)).astype(np.float32)
    dirs = rng.normal(size=(512, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    df = direction_features(params, jnp.asarray(dirs), A, c)
    enc = jnp.sin(jnp.asarray(pts) @ A + c)
    h = jax.nn.relu(enc @ params["w1"])
    h = jax.nn.relu(h @ params["w2"] + df)
    sigma = np.asarray((h @ params["w3"])[:, 0])
    idx = np.clip(((pts + ext) / (2 * ext) * res).astype(int), 0, res - 1)
    cell = grid[idx[:, 0], idx[:, 1], idx[:, 2]]
    # the operative property is missed OCCUPANCY, not raw domination:
    # a point whose true sigma clears the alpha threshold must live in
    # a cell the probe also puts above threshold (before the 1-voxel
    # dilation, which only adds coverage)
    # (before dilation, which only adds coverage)
    cfg16 = TinyFieldConfig(n_samples=16)
    dt = (cfg16.far - cfg16.near) / cfg16.n_samples
    thr = -np.log(1.0 - 1e-3) / dt
    occupied = sigma > thr
    assert occupied.sum() > 0  # the random field has occupied points
    # the pipeline thresholds + dilates (occupancy_grid); check against
    # exactly that product: every truly-occupied point must land in a
    # live cell of the dilated grid
    from spnerf_tpu.ops.occupancy import occupancy_grid

    occ = np.asarray(occupancy_grid(jnp.asarray(grid), dt))
    live = occ[idx[:, 0], idx[:, 1], idx[:, 2]]
    missed = occupied & ~live
    assert missed.sum() <= max(1, 0.01 * occupied.sum()), (
        missed.sum(), occupied.sum())


def test_chunk_flags_per_ray_tightness():
    """A block mixing rays that hit an occupied core with rays that
    miss it must keep chunks needed by ANY ray, and a block whose rays
    all miss must skip."""
    from spnerf_tpu.ops.occupancy import chunk_flags, integral_volume

    res = 16
    occ = np.zeros((res, res, res), bool)
    occ[6:10, 6:10, 6:10] = True  # core at the center of [-4, 4]^3
    ivol = integral_volume(jnp.asarray(occ))
    ext, near, far = 4.0, 1.0, 3.0
    # rays from +x axis toward the center: they traverse the core in
    # the middle chunks only
    o_hit = np.tile(np.array([[3.5, 0.0, 0.0]], np.float32), (4, 1))
    d_hit = np.tile(np.array([[-1.0, 0.0, 0.0]], np.float32), (4, 1))
    # rays far off-axis: never touch the core
    o_miss = np.tile(np.array([[3.5, 3.2, 3.2]], np.float32), (4, 1))
    d_miss = np.tile(np.array([[-1.0, 0.0, 0.0]], np.float32), (4, 1))
    flags_hit = np.asarray(chunk_flags(
        jnp.asarray(o_hit), jnp.asarray(d_hit), ivol, block=4,
        n_samples=8, s_chunk=2, near=near, far=far, extent=ext))
    flags_miss = np.asarray(chunk_flags(
        jnp.asarray(o_miss), jnp.asarray(d_miss), ivol, block=4,
        n_samples=8, s_chunk=2, near=near, far=far, extent=ext))
    assert flags_hit.sum() > 0         # core chunks stay live
    assert flags_miss.sum() == 0       # fully-missing block skips all
    # a mixed block keeps the union of needs
    o_mix = np.concatenate([o_hit[:2], o_miss[:2]])
    d_mix = np.concatenate([d_hit[:2], d_miss[:2]])
    flags_mix = np.asarray(chunk_flags(
        jnp.asarray(o_mix), jnp.asarray(d_mix), ivol, block=4,
        n_samples=8, s_chunk=2, near=near, far=far, extent=ext))
    np.testing.assert_array_equal(flags_mix, flags_hit)


def test_transmittance_early_stop_matches_dense(setup):
    """With a dense (high-sigma) field, rays saturate after the first
    chunks; the early-out must change outputs by at most ~eps."""
    params, o, d = setup
    hot = dict(params)
    # inflate raw density so transmittance collapses quickly
    hot["w3"] = params["w3"].at[:, 0].set(
        jnp.abs(params["w3"][:, 0]) * 50.0 + 2.0)
    cfg = TinyFieldConfig(n_samples=16)
    dense = render_fused_rays(hot, o, d, cfg, s_chunk=4, interpret=True,
                              early_stop_eps=0.0)
    fast = render_fused_rays(hot, o, d, cfg, s_chunk=4, interpret=True,
                             early_stop_eps=1e-3)
    np.testing.assert_allclose(np.asarray(fast["rgb"]),
                               np.asarray(dense["rgb"]), atol=3e-3)
    np.testing.assert_allclose(np.asarray(fast["depth"]),
                               np.asarray(dense["depth"]), atol=2e-2)


def test_int8_render_matches_xla(setup):
    """int8 serving kernel (quantize_field + render_fused_int8) vs the
    f32 XLA reference: per-column weight scales + calibrated activation
    scales keep rgb within ~2% absolute on a random field."""
    from spnerf_tpu.kernels.render_pallas import (
        quantize_field, render_fused_int8)

    params, o, d = setup
    A, c = make_encoding(CFG)
    oe, de = encode_rays(o, d, A, c)
    df = direction_features(params, d, A, c)
    ref = render_xla(params, oe, de, CFG, df=df)
    qf = quantize_field(params, oe, de, df, n_samples=CFG.n_samples,
                        near=CFG.near, far=CFG.far)
    rgb, depth = render_fused_int8(
        oe, de, qf, df, n_samples=CFG.n_samples, near=CFG.near,
        far=CFG.far, block=8, s_chunk=4, interpret=True,
        early_stop_eps=0.0)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref["rgb"]),
                               atol=2.5e-2)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref["depth"]),
                               atol=6e-2)


@pytest.mark.parametrize("width,s_chunk", [(64, 4), (64, 2), (32, 2)])
def test_packed_matches_xla(width, s_chunk):
    """k-packed narrow-width kernel == XLA reference for the same
    width-W field (kernels/render_pallas.render_fused_packed)."""
    cfg = TinyFieldConfig(n_samples=16, width=width)
    params = init_params(jax.random.PRNGKey(0), width=width)
    d = jax.random.normal(jax.random.PRNGKey(1), (40, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jax.random.normal(jax.random.PRNGKey(2), (40, 3)) * 0.1
    A, c = make_encoding(cfg)
    oe, de = encode_rays(o, d, A, c)
    df = direction_features(params, d, A, c)
    ref = render_xla(params, oe, de, cfg, df=df)
    from spnerf_tpu.models.fused_tiny_nerf import render_fused_rays_packed

    got = render_fused_rays_packed(params, o, d, cfg, s_chunk=s_chunk,
                                   interpret=True, early_stop_eps=0.0)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=5e-3)


def test_packed_early_stop_matches_dense():
    """Transmittance early-out in the packed kernel changes outputs by
    <= eps (occlusion culling correctness, mirrors the 128-wide test)."""
    cfg = TinyFieldConfig(n_samples=16, width=64)
    params = init_params(jax.random.PRNGKey(5), width=64)
    # a hot field so rays saturate early: bias sigma up via w3 col 0
    params = dict(params)
    params["w3"] = params["w3"].at[:, 0].add(2.0)
    d = jax.random.normal(jax.random.PRNGKey(6), (24, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((24, 3))
    from spnerf_tpu.models.fused_tiny_nerf import render_fused_rays_packed

    dense = render_fused_rays_packed(params, o, d, cfg, s_chunk=2,
                                     interpret=True, early_stop_eps=0.0)
    fast = render_fused_rays_packed(params, o, d, cfg, s_chunk=2,
                                    interpret=True, early_stop_eps=1e-3)
    np.testing.assert_allclose(np.asarray(fast["rgb"]),
                               np.asarray(dense["rgb"]), atol=3e-3)
    np.testing.assert_allclose(np.asarray(fast["depth"]),
                               np.asarray(dense["depth"]), atol=2e-2)
