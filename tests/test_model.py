import jax
import jax.numpy as jnp
import numpy as np

import pytest

from spnerf_tpu.models import (
    SuperPoint,
    SuperPointConfig,
    init_superpoint,
    superpoint_inference,
)


@pytest.mark.slow
def test_magicpoint_shapes():
    cfg = SuperPointConfig(model_name="magicpoint", nms=0)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (2, 48, 64, 1))
    out = model.apply(variables, jnp.zeros((2, 48, 64, 1)), train=False)
    assert out["logits"].shape == (2, 6, 8, 65)
    assert "desc_raw" not in out


@pytest.mark.slow
def test_superpoint_shapes_and_inference():
    cfg = SuperPointConfig(model_name="superpoint", nms=4, det_thresh=0.001, top_k=50)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, 48, 64, 1))
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 48, 64, 1))
    out = superpoint_inference(model, variables, x)
    assert out["logits"].shape == (1, 6, 8, 65)
    assert out["prob_heatmap"].shape == (1, 48, 64)
    assert out["prob_heatmap_nms"].shape == (1, 48, 64)
    assert out["pred_pts"].shape == (1, 48, 64)
    assert out["desc_raw"].shape == (1, 6, 8, 256)
    assert out["desc"].shape == (1, 48, 64, 256)
    # descriptors are unit length
    norms = jnp.linalg.norm(out["desc"], axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-3)


@pytest.mark.slow
def test_param_count_close_to_reference():
    # reference SuperPoint is ~1.3M weights (SURVEY §5)
    cfg = SuperPointConfig(model_name="superpoint")
    _, variables = init_superpoint(jax.random.PRNGKey(0), cfg)
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert 1.2e6 < n < 1.6e6


@pytest.mark.slow
def test_batchnorm_updates_in_train_mode():
    cfg = SuperPointConfig(model_name="magicpoint")
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (2, 16, 16, 1))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1)) * 3 + 1
    out, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new))
    assert changed


@pytest.mark.slow
def test_probabilities_sum_to_one_per_cell():
    cfg = SuperPointConfig(model_name="magicpoint", nms=0)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, 16, 16, 1))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 1))
    out = superpoint_inference(model, variables, x)
    prob = np.asarray(out["prob_heatmap"])
    raw = model.apply(variables, x, train=False)
    soft = jax.nn.softmax(raw["logits"], axis=-1)
    # per-cell: sum of 64 non-dustbin probs == sum over the 8x8 block
    block = prob.reshape(1, 2, 8, 2, 8).sum((2, 4))
    expected = np.asarray(soft[..., :-1].sum(-1))
    np.testing.assert_allclose(block, expected, rtol=1e-5)
