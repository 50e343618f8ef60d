import numpy as np
import pytest

from spnerf_tpu.ops.native_nms import exact_nms, native_available
from test_ops import _greedy_nms_numpy


def test_native_library_builds():
    assert native_available(), "g++ build of native/exact_nms.cpp failed"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    prob = np.zeros((48, 64), np.float32)
    n = 120
    ys = rng.integers(0, 48, n)
    xs = rng.integers(0, 64, n)
    prob[ys, xs] = rng.uniform(0.02, 1.0, n).astype(np.float32)
    expected = _greedy_nms_numpy(prob, size=4, iou=0.1, min_prob=0.015)
    got = exact_nms(prob, size=4, iou=0.1, min_prob=0.015)
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_native_top_k():
    prob = np.zeros((32, 32), np.float32)
    prob[4, 4], prob[12, 12], prob[20, 20] = 0.9, 0.8, 0.7
    out = exact_nms(prob, size=4, iou=0.1, min_prob=0.1, keep_top_k=2)
    assert (out > 0).sum() == 2
    assert out[4, 4] == pytest.approx(0.9)
    assert out[20, 20] == 0.0
