import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.geometry.homography import HomographyConfig
from spnerf_tpu.models import SuperPointConfig, init_superpoint
from spnerf_tpu.train.loop import (
    StepConfig,
    create_train_state,
    load_checkpoint,
    partial_restore,
    save_checkpoint,
    train_step,
    eval_step,
)
from spnerf_tpu.train.losses import DescriptorLossConfig


H, W, B, N = 32, 32, 4, 16


def _fake_batch(rng, with_pair=False):
    kpts = rng.uniform(2, H - 2, (B, N, 2)).astype(np.float32)
    batch = {
        "image": rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32),
        "kpts": kpts,
        "kpts_mask": np.ones((B, N), bool),
    }
    return batch


@pytest.fixture(scope="module")
def magicpoint_setup():
    cfg = SuperPointConfig(model_name="magicpoint", vgg_cn=(8, 8, 16, 16, 32, 32, 32, 32),
                           detector_dim=(32, 64))
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, H, W, 1))
    step_cfg = StepConfig(model=model, aug=None, include_mask=False)
    return model, variables, step_cfg


def test_magicpoint_train_step_reduces_loss(magicpoint_setup, rng):
    model, variables, step_cfg = magicpoint_setup
    # fresh state per test: train_step donates its input state
    state, tx = create_train_state(variables, 1e-3)
    batch = jax.tree.map(jnp.asarray, _fake_batch(rng))
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(12):
        state, metrics = train_step(state, batch, key, step_cfg, tx)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.iteration) == 12
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_magicpoint_with_device_augmentation(magicpoint_setup, rng):
    model, variables, _ = magicpoint_setup
    state, tx = create_train_state(variables, 1e-3)
    aug = HomographyConfig(patch_ratio=0.8, allow_artifacts=True)
    step_cfg = StepConfig(model=model, aug=aug, erosion=2, include_mask=True)
    batch = jax.tree.map(jnp.asarray, _fake_batch(rng))
    state, metrics = train_step(state, batch, jax.random.PRNGKey(0), step_cfg, tx)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_superpoint_pair_train_step(rng):
    cfg = SuperPointConfig(model_name="superpoint", vgg_cn=(8, 8, 16, 16, 32, 32, 32, 32),
                           detector_dim=(32, 64), descriptor_dim=(32, 64))
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, H, W, 1))
    state, tx = create_train_state(variables, 1e-3)
    step_cfg = StepConfig(
        model=model,
        aug=HomographyConfig(patch_ratio=0.85, allow_artifacts=True),
        erosion=3,
        pair=True,
        desc_cfg=DescriptorLossConfig(),
    )
    batch = jax.tree.map(jnp.asarray, _fake_batch(rng))
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1), step_cfg, tx)
    for k in ("detector_loss", "warped_detector_loss", "descriptor_loss"):
        assert np.isfinite(float(metrics[k])), k
    m = eval_step(state, batch, jax.random.PRNGKey(2), step_cfg)
    assert 0 <= float(m["precision"]) <= 1
    assert 0 <= float(m["recall"]) <= 1


@pytest.mark.slow
def test_checkpoint_roundtrip_and_partial_restore(tmp_path, monkeypatch, rng):
    import spnerf_tpu.train.loop as loop_mod

    monkeypatch.setattr(loop_mod, "CKPT_PATH", tmp_path)
    # small magicpoint
    mp_cfg = SuperPointConfig(model_name="magicpoint", vgg_cn=(8, 8, 16, 16, 32, 32, 32, 32),
                              detector_dim=(32, 64))
    model, variables = init_superpoint(jax.random.PRNGKey(0), mp_cfg, (1, H, W, 1))
    state, tx = create_train_state(variables, 1e-3)
    path = save_checkpoint("mp_test", state)
    assert path.exists()

    data = load_checkpoint(path)
    assert int(data["iteration"]) == 0

    # seed a superpoint (extra descriptor head) from magicpoint weights
    sp_cfg = SuperPointConfig(model_name="superpoint", vgg_cn=(8, 8, 16, 16, 32, 32, 32, 32),
                              detector_dim=(32, 64), descriptor_dim=(32, 64))
    _, sp_vars = init_superpoint(jax.random.PRNGKey(7), sp_cfg, (1, H, W, 1))
    merged = partial_restore(sp_vars["params"], data["params"])

    # backbone weights must equal the magicpoint ones
    a = np.asarray(merged["backbone"]["block1"]["Conv_0"]["kernel"])
    b = np.asarray(data["params"]["backbone"]["block1"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(a, b)
    # descriptor head keeps its fresh init (not present in checkpoint)
    assert "descriptor" in merged
