"""Fast production inference path vs the parity path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.models.superpoint import (
    SuperPoint,
    SuperPointConfig,
    fold_batch_norm,
    init_superpoint,
)
from spnerf_tpu.ops.descriptor_sampling import sample_descriptors
from spnerf_tpu.ops.fast_inference import (
    detect_keypoints,
    sample_descriptors_matmul,
)
from spnerf_tpu.ops.nms import box_nms


@pytest.mark.slow
def test_fold_batch_norm_matches_bn_inference(rng):
    cfg = SuperPointConfig(model_name="superpoint",
                           vgg_cn=(8, 8, 16, 16, 32, 32, 32, 32),
                           detector_dim=(32, 64), descriptor_dim=(32, 64))
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, 32, 32, 1))
    # make running stats non-trivial
    x_warm = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32))
    _, upd = model.apply(variables, x_warm, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": upd["batch_stats"]}

    folded = fold_batch_norm(variables)
    folded_model = SuperPoint(SuperPointConfig(**{**cfg.__dict__, "use_bn": False}))

    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    ref = model.apply(variables, x, train=False)
    got = folded_model.apply(folded, x, train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(ref["logits"]), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["desc_raw"]),
                               np.asarray(ref["desc_raw"]), rtol=1e-3, atol=1e-4)


def test_detect_keypoints_matches_box_nms(rng):
    prob = np.zeros((64, 64), np.float32)
    n = 50
    ys = rng.integers(0, 64, n)
    xs = rng.integers(0, 64, n)
    prob[ys, xs] = rng.uniform(0.05, 1.0, n).astype(np.float32)

    ref = np.asarray(box_nms(jnp.asarray(prob), 4, 0.1, 0.015, 0))
    ref_pts = set(map(tuple, np.argwhere(ref > 0)))

    pts, scores, valid = detect_keypoints(jnp.asarray(prob)[None], 0.015, 4,
                                          0.1, 4096, 64 * 64)
    got_pts = {tuple(p) for p, v in zip(np.asarray(pts[0], int),
                                        np.asarray(valid[0])) if v}
    assert got_pts == ref_pts


def test_detect_keypoints_top_k(rng):
    prob = np.zeros((32, 32), np.float32)
    prob[4, 4], prob[12, 12], prob[20, 20] = 0.9, 0.8, 0.7
    pts, scores, valid = detect_keypoints(jnp.asarray(prob)[None], 0.1, 4,
                                          0.1, 1024, 2)
    assert int(valid.sum()) == 2
    kept = np.asarray(pts[0][np.asarray(valid[0])], int)
    assert {tuple(p) for p in kept} == {(4, 4), (12, 12)}


def test_sample_descriptors_matmul_matches_gather(rng):
    desc_raw = rng.standard_normal((6, 8, 16)).astype(np.float32)
    pts = np.array([[5.0, 7.0], [16.0, 30.0], [47.0, 63.0], [0.0, 0.0]],
                   np.float32)
    ref = np.asarray(sample_descriptors(jnp.asarray(desc_raw),
                                        jnp.asarray(pts), 8))
    got = np.asarray(sample_descriptors_matmul(jnp.asarray(desc_raw),
                                               jnp.asarray(pts), 8))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_detect_from_logits_matches_decode_path(rng):
    from spnerf_tpu.ops.detector_decode import decode_detector_logits
    from spnerf_tpu.ops.fast_inference import detect_from_logits

    logits = jnp.asarray(rng.standard_normal((2, 6, 8, 65)), jnp.float32)
    prob = decode_detector_logits(logits, 8)
    p1, s1, v1 = detect_keypoints(prob, 0.015, 4, top_k=64,
                                  num_candidates=256)
    p2, s2, v2 = detect_from_logits(logits, 8, 0.015, 4, top_k=64,
                                    num_candidates=256)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    m = np.asarray(v1)
    np.testing.assert_allclose(np.asarray(p1)[m], np.asarray(p2)[m])
    np.testing.assert_allclose(np.asarray(s1)[m], np.asarray(s2)[m],
                               rtol=1e-6)


def test_sample_descriptors_onehot_matches_separable(rng):
    from spnerf_tpu.ops.fast_inference import sample_descriptors_onehot

    desc = jnp.asarray(rng.standard_normal((6, 8, 32)), jnp.float32)
    pts = jnp.asarray(rng.uniform(0, [47, 63], (10, 2)), jnp.float32)
    a = sample_descriptors_matmul(desc, pts, 8)
    b = sample_descriptors_onehot(desc, pts, 8, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
