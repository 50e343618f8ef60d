"""Assembled Pallas serving stack vs the f32 flax model.

bf16 mode must track the float model tightly; int8 mode (calibrated PTQ)
must preserve the decoded probability ranking that drives detection.
Runs in Pallas interpret mode on CPU (auto-selected off-TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.models.superpoint import (
    SuperPoint,
    SuperPointConfig,
    init_superpoint,
)
from spnerf_tpu.ops.detector_decode import decode_detector_logits
from spnerf_tpu.ops.serving import ServingSuperPoint

H, W = 32, 64


@pytest.fixture(scope="module")
def setup():
    cfg = SuperPointConfig(model_name="superpoint")
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, H, W, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, H, W, 1))
    ref = model.apply(variables, x, train=False)
    return cfg, variables, x, ref


@pytest.mark.slow
def test_bf16_serving_matches_float(setup):
    cfg, variables, x, ref = setup
    sp = ServingSuperPoint.build(cfg, variables, mode="bf16")
    out = sp(x)
    assert out["logits"].shape == ref["logits"].shape
    assert out["desc_raw"].shape == ref["desc_raw"].shape
    # bf16 stack: ~1e-2 relative on pre-activation magnitudes
    for key in ("logits", "desc_raw"):
        a = np.asarray(out[key], np.float32)
        b = np.asarray(ref[key], np.float32)
        scale = np.abs(b).max()
        assert np.abs(a - b).max() < 0.05 * scale, key


@pytest.mark.slow
def test_int8_serving_preserves_detection(setup):
    cfg, variables, x, ref = setup
    sp = ServingSuperPoint.build(cfg, variables, calib_images=x, mode="int8")
    out = sp(x)
    prob = np.asarray(decode_detector_logits(
        out["logits"].astype(jnp.float32), cfg.grid_size))
    prob_ref = np.asarray(decode_detector_logits(ref["logits"], cfg.grid_size))
    # decoded heatmaps strongly correlated
    c = np.corrcoef(prob.ravel(), prob_ref.ravel())[0, 1]
    assert c > 0.98, c
    # top-50 cells mostly agree (ranking is what detection consumes)
    k = 50
    top = set(np.argsort(prob.ravel())[-k:])
    top_ref = set(np.argsort(prob_ref.ravel())[-k:])
    assert len(top & top_ref) >= int(0.8 * k)
    # descriptors: cosine similarity per cell stays high after L2 norm
    d = np.array(out["desc_raw"], np.float32).reshape(-1, 256)
    dr = np.array(ref["desc_raw"], np.float32).reshape(-1, 256)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    dr /= np.linalg.norm(dr, axis=1, keepdims=True) + 1e-12
    cos = np.sum(d * dr, axis=1)
    assert cos.mean() > 0.98, cos.mean()


@pytest.mark.slow
def test_magicpoint_variant(setup):
    cfg = SuperPointConfig(model_name="magicpoint")
    model, variables = init_superpoint(jax.random.PRNGKey(2), cfg, (1, H, W, 1))
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 1))
    sp = ServingSuperPoint.build(cfg, variables, calib_images=x, mode="int8")
    out = sp(x)
    assert set(out) == {"logits"}
    assert out["logits"].shape == (1, H // 8, W // 8, 65)


@pytest.mark.slow
def test_mixed_serving_tightens_labels(setup):
    """mixed = int8 backbone + bf16 heads: must sit between int8 and
    bf16 in fidelity, and in particular track the float decode more
    tightly than pure int8 at the ranking level."""
    cfg, variables, x, ref = setup
    sp_mixed = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                       mode="mixed")
    sp_int8 = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                      mode="int8")
    out_m = sp_mixed(x)
    out_i = sp_int8(x)
    assert out_m["logits"].shape == ref["logits"].shape
    prob_ref = np.asarray(decode_detector_logits(ref["logits"],
                                                 cfg.grid_size))

    def topk_overlap(out, k=50):
        prob = np.asarray(decode_detector_logits(
            out["logits"].astype(jnp.float32), cfg.grid_size))
        top = set(np.argsort(prob.ravel())[-k:])
        top_ref = set(np.argsort(prob_ref.ravel())[-k:])
        return len(top & top_ref) / k

    ov_mixed = topk_overlap(out_m)
    ov_int8 = topk_overlap(out_i)
    assert ov_mixed >= ov_int8 - 1e-9, (ov_mixed, ov_int8)
    assert ov_mixed >= 0.9, ov_mixed


@pytest.mark.slow
def test_mixed_serving_nonfused_path(setup):
    """mixed mode through the per-layer (non-fused-tail) kernels."""
    cfg, variables, x, ref = setup
    sp = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                 mode="mixed", fused_tail=False)
    out = sp(x)
    assert out["logits"].shape == ref["logits"].shape
    prob = np.asarray(decode_detector_logits(
        out["logits"].astype(jnp.float32), cfg.grid_size))
    prob_ref = np.asarray(decode_detector_logits(ref["logits"],
                                                 cfg.grid_size))
    c = np.corrcoef(prob.ravel(), prob_ref.ravel())[0, 1]
    assert c > 0.98, c
