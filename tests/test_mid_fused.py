"""Fused mid-stack double packed conv vs the chained per-layer kernels.

kernels/mid_fused_pallas.py collapses blocks 3-4 and 5-6 (reference
VGG_Backbone.py:47-58) into single kernels; these tests pin exact
numerics against the established packed/plain kernels across band
borders, pooling, channel growth (64->128), both dtypes, and the full
serving graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.kernels.conv_stack_pallas import (
    conv3x3_pallas,
    packed_conv3x3_pallas,
    unpack_pairs,
)
from spnerf_tpu.kernels.mid_fused_pallas import double_packed_conv3x3_pallas
from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
from spnerf_tpu.ops.serving import ServingSuperPoint

# >=10s on the 1-core CPU host (r4 timing run); excluded from the
# quick pre-commit tier: pytest -m "not slow"
pytestmark = pytest.mark.slow


def _rand(rng, B, H, Wp, C2, dtype):
    if dtype == jnp.int8:
        return jnp.asarray(rng.integers(-5, 5, (B, H, Wp, C2)), jnp.int8)
    return jnp.asarray(rng.standard_normal((B, H, Wp, C2)), jnp.bfloat16)


def _wmb(rng, C, Co, dtype):
    if dtype == jnp.int8:
        w = jnp.asarray(rng.integers(-3, 3, (3, 3, C, Co)), jnp.int8)
    else:
        w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.1,
                        jnp.bfloat16)
    m = jnp.asarray(rng.uniform(0.01, 0.02, (Co,)), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, (Co,)), jnp.float32)
    return w, m, b


@pytest.mark.parametrize("pool", [False, True])
@pytest.mark.parametrize("dtype", [jnp.int8, jnp.bfloat16])
def test_double_packed_matches_chain(rng, pool, dtype):
    B, H, Wp, C = 2, 12, 8, 64
    x = _rand(rng, B, H, Wp, 2 * C, dtype)
    wa, ma, ba = _wmb(rng, C, C, dtype)
    wb, mb, bb = _wmb(rng, C, C, dtype)
    fused = double_packed_conv3x3_pallas(x, wa, ma, ba, wb, mb, bb,
                                         out_dtype=dtype, pool=pool)
    mid = packed_conv3x3_pallas(x, wa, ma, ba, out_dtype=dtype)
    ref = packed_conv3x3_pallas(mid, wb, mb, bb, out_dtype=dtype, pool=pool)
    np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                  np.asarray(ref, np.float32))


def test_double_packed_multi_band_borders(rng):
    """Forced small bands: the conv_a halo rows recomputed at band edges
    and the zeroed outside-image rows must match the unfused chain."""
    B, H, Wp, C = 1, 24, 8, 64
    x = _rand(rng, B, H, Wp, 2 * C, jnp.int8)
    wa, ma, ba = _wmb(rng, C, C, jnp.int8)
    wb, mb, bb = _wmb(rng, C, C, jnp.int8)
    mid = packed_conv3x3_pallas(x, wa, ma, ba, out_dtype=jnp.int8)
    ref = packed_conv3x3_pallas(mid, wb, mb, bb, out_dtype=jnp.int8)
    for hb in (4, 8, 12, 24):
        fused = double_packed_conv3x3_pallas(x, wa, ma, ba, wb, mb, bb,
                                             out_dtype=jnp.int8, hb=hb)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref),
                                      err_msg=f"hb={hb}")


def test_double_packed_channel_growth_vs_plain(rng):
    """Blocks 5-6 analogue: packed 64->128 conv then a 128->128 conv with
    pool. The unfused chain unpacks and runs the plain kernel; the fused
    kernel stays packed throughout and unpacks at the end."""
    B, H, Wp, C, Cm = 2, 12, 8, 64, 128
    x = _rand(rng, B, H, Wp, 2 * C, jnp.int8)
    wa, ma, ba = _wmb(rng, C, Cm, jnp.int8)
    wb, mb, bb = _wmb(rng, Cm, Cm, jnp.int8)
    fused = unpack_pairs(double_packed_conv3x3_pallas(
        x, wa, ma, ba, wb, mb, bb, out_dtype=jnp.int8, pool=True))
    mid = unpack_pairs(packed_conv3x3_pallas(x, wa, ma, ba,
                                             out_dtype=jnp.int8))
    ref = conv3x3_pallas(mid, wb, mb, bb, out_dtype=jnp.int8, pool=True)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


@pytest.fixture(scope="module")
def served():
    cfg = SuperPointConfig(model_name="superpoint")
    _, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, 64, 64, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 1))
    return cfg, variables, x


@pytest.mark.parametrize("mode", ["int8", "bf16"])
def test_serving_fused_mid_bit_identical(served, mode):
    cfg, variables, x = served
    sp_f = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                   mode=mode, fused_mid=True)
    sp_u = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                   mode=mode, fused_mid=False)
    of, ou = sp_f(x), sp_u(x)
    np.testing.assert_array_equal(np.asarray(of["logits"], np.float32),
                                  np.asarray(ou["logits"], np.float32))
    np.testing.assert_array_equal(np.asarray(of["desc_raw"], np.float32),
                                  np.asarray(ou["desc_raw"], np.float32))


def test_serving_fused_mid_w8_fallback(served):
    """W % 8 == 0 but W % 16 != 0: the fused mid pair cannot pool packed
    W/8 pairs, so serving silently uses the per-layer kernels and still
    matches them exactly."""
    cfg, variables, _ = served
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 72, 1))
    sp_f = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                   mode="int8", fused_mid=True)
    sp_u = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                   mode="int8", fused_mid=False)
    of, ou = sp_f(x), sp_u(x)
    np.testing.assert_array_equal(np.asarray(of["logits"], np.float32),
                                  np.asarray(ou["logits"], np.float32))
