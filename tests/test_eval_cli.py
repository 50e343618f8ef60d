"""On-the-fly eval CLI helpers (spnerf_tpu/eval/on_the_fly.py)."""

import numpy as np

from spnerf_tpu.eval.on_the_fly import bootstrap_ci


def test_bootstrap_ci_contains_mean_and_shrinks():
    rng = np.random.default_rng(0)
    small = rng.uniform(0.4, 0.8, 30)
    large = rng.uniform(0.4, 0.8, 3000)
    lo_s, hi_s = bootstrap_ci(small)
    lo_l, hi_l = bootstrap_ci(large)
    assert lo_s <= small.mean() <= hi_s
    assert lo_l <= large.mean() <= hi_l
    assert (hi_l - lo_l) < (hi_s - lo_s)


def test_bootstrap_ci_degenerate():
    lo, hi = bootstrap_ci([0.5])
    assert np.isnan(lo) and np.isnan(hi)
    lo, hi = bootstrap_ci([0.5, 0.5, 0.5])
    assert lo == hi == 0.5
