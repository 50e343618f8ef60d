import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.models.superpoint import (
    SuperPoint,
    SuperPointConfig,
    fold_batch_norm,
    init_superpoint,
)
from spnerf_tpu.ops.quantization import QuantizedSuperPoint, quantize_weights
import pytest


def test_quantize_weights_roundtrip(rng):
    k = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    q, scale = quantize_weights(jnp.asarray(k))
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    assert np.max(np.abs(deq - k)) <= np.max(np.abs(k)) / 127.0 + 1e-6


@pytest.mark.slow
def test_quantized_model_close_to_float(rng):
    cfg = SuperPointConfig(model_name="superpoint",
                           vgg_cn=(8, 8, 16, 16, 32, 32, 32, 32),
                           detector_dim=(32, 64), descriptor_dim=(32, 64))
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, 32, 32, 1))
    x_warm = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    _, upd = model.apply(variables, x_warm, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": upd["batch_stats"]}

    calib = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    q = QuantizedSuperPoint.build(cfg, variables, calib)

    folded = fold_batch_norm(variables)
    fm = SuperPoint(SuperPointConfig(**{**cfg.__dict__, "use_bn": False}))
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    ref = fm.apply(folded, x, train=False)
    got = q(x)
    scale = float(jnp.max(jnp.abs(ref["logits"]))) + 1e-9
    err = float(jnp.max(jnp.abs(got["logits"] - ref["logits"])))
    # int8 PTQ with random weights: within ~10% of the logit range
    assert err / scale < 0.1
    assert got["desc_raw"].shape == ref["desc_raw"].shape
