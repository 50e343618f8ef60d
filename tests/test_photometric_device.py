"""On-device photometric augmentation (ops/photometric_device.py).

Checks each primitive's distributional contract against the host
version (data/photometric.py, itself the counterpart of reference
data_utils/photometric_augmentation.py:7-118), plus the train_step
integration path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.ops.photometric_device import (
    AUG_FNS,
    PhotometricDeviceConfig,
    additive_gaussian_noise,
    additive_shade,
    additive_speckle_noise,
    motion_blur,
    photometric_augment,
    random_brightness,
    random_contrast,
)

CFG = PhotometricDeviceConfig(
    shade_kernel_size_range=(5, 9),  # small images in tests
    motion_max_kernel_size=7,
)


def _img(B=4, H=24, W=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.3, 0.7, (B, H, W, 1)).astype(np.float32))


def test_brightness_bounds_and_variation():
    img = _img()
    out = random_brightness(img, jax.random.PRNGKey(0), CFG)
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # per-sample deltas differ
    deltas = jnp.mean(out - img, axis=(1, 2, 3))
    assert len(set(np.round(np.asarray(deltas), 4))) > 1
    # zero-range config is the identity
    cfg0 = PhotometricDeviceConfig(brightness_max_abs_change=0.0)
    out0 = random_brightness(img, jax.random.PRNGKey(0), cfg0)
    np.testing.assert_allclose(out0, img, atol=1e-6)


def test_contrast_preserves_mean():
    img = _img()
    out = random_contrast(img, jax.random.PRNGKey(1), CFG)
    # scaling around the per-sample mean keeps the mean (no clipping at
    # these mid-gray levels)
    np.testing.assert_allclose(
        jnp.mean(out, axis=(1, 2, 3)), jnp.mean(img, axis=(1, 2, 3)), atol=2e-3
    )


def test_gaussian_noise_std_matches_draw():
    cfg = PhotometricDeviceConfig(gaussian_stddev_range=(8.0, 8.0))
    img = jnp.full((2, 64, 64, 1), 0.5, jnp.float32)
    out = additive_gaussian_noise(img, jax.random.PRNGKey(2), cfg)
    std = float(jnp.std(out - img))
    assert abs(std - 8.0 / 255.0) < 3e-3


def test_speckle_fractions():
    cfg = PhotometricDeviceConfig(speckle_prob_range=(0.2, 0.2))
    img = jnp.full((2, 64, 64, 1), 0.5, jnp.float32)
    out = additive_speckle_noise(img, jax.random.PRNGKey(3), cfg)
    zeros = float(jnp.mean(out == 0.0))
    ones = float(jnp.mean(out == 1.0))
    assert abs(zeros - 0.2) < 0.03 and abs(ones - 0.2) < 0.03


def test_motion_blur_mass_and_identity():
    img = jnp.zeros((8, 17, 17, 1), jnp.float32).at[:, 8, 8, 0].set(1.0)
    out = motion_blur(img, jax.random.PRNGKey(4), CFG)
    # a normalized line kernel preserves total mass (reflect padding
    # only matters at borders; the impulse is central)
    np.testing.assert_allclose(
        jnp.sum(out, axis=(1, 2, 3)), jnp.ones(8), rtol=1e-5
    )
    # support stays within the 7x7 cap
    assert float(jnp.sum(out[:, :5, :, :])) == 0.0
    # a uniform image is invariant under any normalized blur
    flat = jnp.full((4, 16, 16, 1), 0.25, jnp.float32)
    outf = motion_blur(flat, jax.random.PRNGKey(5), CFG)
    np.testing.assert_allclose(outf, flat, atol=1e-6)


def test_shade_darkens_or_brightens_within_transparency():
    cfg = PhotometricDeviceConfig(
        shade_transparency_range=(0.5, 0.5), shade_kernel_size_range=(5, 9)
    )
    img = jnp.ones((3, 32, 48, 1), jnp.float32)
    out = additive_shade(img, jax.random.PRNGKey(6), cfg)
    assert float(out.max()) <= 1.0 + 1e-6
    # transparency 0.5 bounds the darkening at 50%
    assert float(out.min()) >= 0.5 - 1e-5
    # some shading actually happened
    assert float(out.min()) < 0.999


def test_full_augment_jits_and_stays_in_range():
    img = _img(B=3)
    fn = jax.jit(lambda k, x: photometric_augment(k, x, CFG))
    out = fn(jax.random.PRNGKey(7), img)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # deterministic per key, different across keys
    out2 = fn(jax.random.PRNGKey(7), img)
    np.testing.assert_array_equal(out, out2)
    out3 = fn(jax.random.PRNGKey(8), img)
    assert not np.allclose(out, out3)


def test_from_dict_roundtrip():
    cfg = PhotometricDeviceConfig.from_dict(
        {
            "enable": True,
            "on_device": True,
            "primitives": ["random_brightness", "motion_blur"],
            "params": {
                "random_brightness": {"max_abs_change": 75},
                "motion_blur": {"max_kernel_size": 7},
            },
        }
    )
    assert cfg.primitives == ("random_brightness", "motion_blur")
    assert cfg.brightness_max_abs_change == 75.0
    assert cfg.motion_max_kernel_size == 7
    assert hash(cfg) == hash(cfg)


@pytest.mark.parametrize("name", list(AUG_FNS))
def test_each_primitive_under_jit(name):
    img = _img(B=2, H=16, W=16)
    fn = jax.jit(lambda k, x: AUG_FNS[name](x, k, CFG))
    out = fn(jax.random.PRNGKey(9), img)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_host_device_brightness_distribution_match():
    """Host and device brightness draws share mean/spread (the params
    are in the same 0-255 units)."""
    from spnerf_tpu.data import photometric as host

    rng = np.random.default_rng(0)
    base = rng.uniform(80, 170, (24, 32)).astype(np.float32)
    host_deltas = [
        (host.random_brightness(base, rng, max_abs_change=50) - base).mean()
        for _ in range(300)
    ]
    img = jnp.asarray(base / 255.0)[None, ..., None]
    cfg = PhotometricDeviceConfig(brightness_max_abs_change=50.0)
    dev_deltas = [
        float(jnp.mean(random_brightness(img, jax.random.PRNGKey(i), cfg) - img))
        * 255.0
        for i in range(300)
    ]
    assert abs(np.mean(host_deltas) - np.mean(dev_deltas)) < 4.0
    assert abs(np.std(host_deltas) - np.std(dev_deltas)) < 4.0


def test_train_step_with_device_photometric():
    """MagicPoint + SuperPoint-pair train steps run with the photometric
    stage fused into the jitted step."""
    from spnerf_tpu.models.superpoint import SuperPoint, SuperPointConfig
    from spnerf_tpu.train.loop import StepConfig, create_train_state, train_step
    from spnerf_tpu.geometry.homography import HomographyConfig

    key = jax.random.PRNGKey(0)
    model = SuperPoint(SuperPointConfig(
        vgg_cn=(8, 8, 8, 8, 16, 16, 16, 16), model_name="superpoint",
        detector_dim=(16, 32), descriptor_dim=(16, 24),
    ))
    variables = model.init(key, jnp.zeros((1, 32, 32, 1)), train=False)
    state, tx = create_train_state(variables, 1e-3)
    cfg = StepConfig(
        model=model, pair=True, aug=HomographyConfig(),
        photometric=CFG,
    )
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 1)),
            jnp.float32,
        ),
        "kpts": jnp.asarray(
            np.random.default_rng(1).uniform(0, 31, (2, 16, 2)), jnp.float32
        ),
        "kpts_mask": jnp.ones((2, 16), bool),
    }
    new_state, metrics = train_step(state, batch, key, cfg, tx)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.iteration) == 1
