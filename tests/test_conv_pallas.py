"""Experimental Pallas conv kernel: interpret-mode correctness.

The kernel does not yet compile through Mosaic on real TPUs (see
docs/PERF.md "Attempted and rejected"); these tests pin the math so the
round-2 Mosaic port starts from a verified implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.kernels.conv_pallas import conv3x3_fused


@pytest.mark.parametrize("shape", [(2, 16, 24, 8, 16), (1, 8, 16, 4, 8)])
def test_conv3x3_fused_matches_xla(rng, shape):
    B, H, W, Cin, Cout = shape
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((Cout,)).astype(np.float32))
    ref = jax.nn.relu(
        jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
    )
    got = conv3x3_fused(x, w, b, row_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_conv3x3_fused_no_relu(rng):
    B, H, W, Cin, Cout = 1, 8, 16, 4, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32) * 0.1)
    b = jnp.zeros((Cout,))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_fused(x, w, b, row_tile=4, relu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
