"""Fused tail kernels (blocks 7-8 + heads) vs the unfused serving chain.

kernels/tail_fused_pallas.py collapses the six tail layers (reference
VGG_Backbone.py:60-70 blocks 7-8, heads.py:6-68) into two whole-image
kernels; these tests pin exact int8 numerics against the established
per-layer kernels, the in-kernel softmax against XLA's decode, and the
padded-probs detect path against detect_from_logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.kernels.conv_stack_pallas import (
    conv3x3_pallas,
    dot_bias_act_pallas,
)
from spnerf_tpu.kernels.tail_fused_pallas import (
    double_conv3x3_pallas,
    head_pallas,
)
from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
from spnerf_tpu.ops.fast_inference import (
    detect_from_logits,
    detect_from_probs_padded,
)
from spnerf_tpu.ops.serving import ServingSuperPoint

# >=10s on the 1-core CPU host (r4 timing run); excluded from the
# quick pre-commit tier: pytest -m "not slow"
pytestmark = pytest.mark.slow


def test_double_conv_matches_chain_int8(rng):
    B, H, W, C = 2, 12, 16, 128
    x = jnp.asarray(rng.integers(-5, 5, (B, H, W, C)), jnp.int8)
    wa = jnp.asarray(rng.integers(-3, 3, (3, 3, C, C)), jnp.int8)
    wb = jnp.asarray(rng.integers(-3, 3, (3, 3, C, C)), jnp.int8)
    ma = jnp.asarray(rng.uniform(0.01, 0.02, (C,)), jnp.float32)
    ba = jnp.asarray(rng.uniform(-1, 1, (C,)), jnp.float32)
    mb = jnp.asarray(rng.uniform(0.01, 0.02, (C,)), jnp.float32)
    bb = jnp.asarray(rng.uniform(-1, 1, (C,)), jnp.float32)
    fused = double_conv3x3_pallas(x, wa, ma, ba, wb, mb, bb,
                                  out_dtype=jnp.int8)
    mid = conv3x3_pallas(x, wa, ma, ba, out_dtype=jnp.int8)
    ref = conv3x3_pallas(mid, wb, mb, bb, out_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_head_logits_matches_chain_int8(rng):
    B, H, W, C, Cm = 2, 8, 16, 128, 256
    x = jnp.asarray(rng.integers(-5, 5, (B, H, W, C)), jnp.int8)
    w3 = jnp.asarray(rng.integers(-3, 3, (3, 3, C, Cm)), jnp.int8)
    m3 = jnp.asarray(rng.uniform(0.01, 0.02, (Cm,)), jnp.float32)
    b3 = jnp.asarray(rng.uniform(-1, 1, (Cm,)), jnp.float32)
    w1 = jnp.asarray(rng.integers(-3, 3, (Cm, 128)), jnp.int8)
    m1 = jnp.asarray(rng.uniform(0.005, 0.01, (128,)), jnp.float32)
    b1 = jnp.asarray(rng.uniform(-1, 1, (128,)), jnp.float32)
    fused = head_pallas(x, w3, m3, b3, w1, m1, b1, out_dtype=jnp.bfloat16)
    mid = conv3x3_pallas(x, w3, m3, b3, out_dtype=jnp.int8)
    ref = dot_bias_act_pallas(mid, w1, m1, b1, relu=False,
                              out_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                  np.asarray(ref, np.float32))


def test_head_softmax_matches_xla_decode(rng):
    B, H, W, C, Cm, L = 1, 8, 8, 128, 256, 65
    x = jnp.asarray(rng.integers(-5, 5, (B, H, W, C)), jnp.int8)
    w3 = jnp.asarray(rng.integers(-2, 2, (3, 3, C, Cm)), jnp.int8)
    m3 = jnp.full((Cm,), 0.02, jnp.float32)
    b3 = jnp.zeros((Cm,), jnp.float32)
    w1 = jnp.asarray(rng.integers(-2, 2, (Cm, 128)), jnp.int8)
    m1 = jnp.pad(jnp.full((L,), 0.01, jnp.float32), (0, 128 - L))
    b1 = jnp.pad(jnp.asarray(rng.uniform(-1, 1, (L,)), jnp.float32),
                 (0, 128 - L))
    probs = head_pallas(x, w3, m3, b3, w1, m1, b1, softmax_lanes=L,
                        out_dtype=jnp.bfloat16)
    logits = head_pallas(x, w3, m3, b3, w1, m1, b1,
                         out_dtype=jnp.float32)[..., :L]
    ref = jax.nn.softmax(logits, axis=-1)[..., :-1]
    np.testing.assert_allclose(np.asarray(probs[..., :L - 1], np.float32),
                               np.asarray(ref), atol=5e-3)
    # pad lanes (incl. the dustbin slot) are exactly zero
    np.testing.assert_array_equal(np.asarray(probs[..., L - 1:], np.float32),
                                  np.zeros((B, H, W, 128 - L + 1)))


def test_detect_from_probs_padded_matches_logits(rng):
    B, Hc, Wc = 2, 6, 8
    logits = jnp.asarray(rng.standard_normal((B, Hc, Wc, 65)) * 3,
                         jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)[..., :-1]
    padded = jnp.pad(probs, ((0, 0), (0, 0), (0, 0), (0, 64)))
    ref = detect_from_logits(logits, 8, min_prob=0.015, top_k=50,
                             num_candidates=128)
    out = detect_from_probs_padded(padded, 8, min_prob=0.015, top_k=50,
                                   num_candidates=128)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.fixture(scope="module")
def served():
    cfg = SuperPointConfig(model_name="superpoint")
    _, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, 64, 64, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 1))
    return cfg, variables, x


def test_serving_fused_tail_bit_identical(served):
    cfg, variables, x = served
    sp_f = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                   mode="int8", fused_tail=True)
    sp_u = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                   mode="int8", fused_tail=False)
    of, ou = sp_f(x), sp_u(x)
    np.testing.assert_array_equal(np.asarray(of["logits"], np.float32),
                                  np.asarray(ou["logits"], np.float32))
    np.testing.assert_array_equal(np.asarray(of["desc_raw"], np.float32),
                                  np.asarray(ou["desc_raw"], np.float32))


def test_serving_fused_softmax_pipeline(served):
    """probs_padded through detect_from_probs_padded lands the same
    keypoints as the logits path through detect_from_logits."""
    cfg, variables, x = served
    sp = ServingSuperPoint.build(cfg, variables, calib_images=x, mode="int8")
    probs = sp(x, softmax=True)["probs_padded"]
    logits = sp(x)["logits"]
    pts_p, sc_p, va_p = detect_from_probs_padded(
        probs, 8, min_prob=0.001, top_k=20, num_candidates=64)
    pts_l, sc_l, va_l = detect_from_logits(
        logits, 8, min_prob=0.001, top_k=20, num_candidates=64)
    # bf16 prob rounding may reorder near-ties; demand a large overlap
    # of the selected keypoint sets and matching scores on the overlap
    for b in range(pts_p.shape[0]):
        set_p = {tuple(p) for p, v in zip(np.asarray(pts_p[b]),
                                          np.asarray(va_p[b])) if v}
        set_l = {tuple(p) for p, v in zip(np.asarray(pts_l[b]),
                                          np.asarray(va_l[b])) if v}
        n = max(len(set_l), 1)
        assert len(set_p & set_l) / n >= 0.8, (set_p, set_l)
    np.testing.assert_allclose(np.asarray(sc_p), np.asarray(sc_l),
                               atol=2e-2)


def test_detect_compact_false_same_keypoint_set(rng):
    """compact=False returns the identical valid keypoint set (in
    approx_max_k rank order) as the compacted top-k output whenever
    fewer than top_k candidates survive NMS."""
    logits = jnp.asarray(rng.standard_normal((2, 8, 10, 65)) * 3,
                         jnp.float32)
    probs = jax.nn.softmax(logits, -1)[..., :64]
    padded = jnp.pad(probs, ((0, 0),) * 3 + ((0, 64),))
    pts_c, sc_c, va_c = detect_from_probs_padded(
        padded, 8, min_prob=0.015, top_k=512, num_candidates=512)
    pts_m, sc_m, va_m = detect_from_probs_padded(
        padded, 8, min_prob=0.015, top_k=512, num_candidates=512,
        compact=False)
    for b in range(2):
        ref = {(float(y), float(x), round(float(s), 5))
               for (y, x), s, v in zip(np.asarray(pts_c[b]),
                                       np.asarray(sc_c[b]),
                                       np.asarray(va_c[b])) if v}
        got = {(float(y), float(x), round(float(s), 5))
               for (y, x), s, v in zip(np.asarray(pts_m[b]),
                                       np.asarray(sc_m[b]),
                                       np.asarray(va_m[b])) if v}
        assert got == ref and len(ref) > 0


def test_detect_compact_false_superset_when_survivors_exceed_topk(rng):
    """The documented divergence case (ADVICE r4): with more than top_k
    NMS survivors, compact=False returns up to num_candidates valid
    keypoints — a SUPERSET that must contain the compacted output's
    top-k set."""
    logits = jnp.asarray(rng.standard_normal((1, 8, 10, 65)) * 3,
                         jnp.float32)
    probs = jax.nn.softmax(logits, -1)[..., :64]
    padded = jnp.pad(probs, ((0, 0),) * 3 + ((0, 64),))
    # tiny threshold + top_k << candidates -> survivors exceed top_k
    pts_c, sc_c, va_c = detect_from_probs_padded(
        padded, 8, min_prob=1e-6, top_k=16, num_candidates=64, size=1)
    pts_m, sc_m, va_m = detect_from_probs_padded(
        padded, 8, min_prob=1e-6, top_k=16, num_candidates=64, size=1,
        compact=False)
    compacted = {(float(y), float(x))
                 for (y, x), v in zip(np.asarray(pts_c[0]),
                                      np.asarray(va_c[0])) if v}
    full = {(float(y), float(x))
            for (y, x), v in zip(np.asarray(pts_m[0]),
                                 np.asarray(va_m[0])) if v}
    assert len(compacted) == 16, len(compacted)
    assert len(full) > 16, len(full)  # the divergence actually happens
    assert compacted <= full
