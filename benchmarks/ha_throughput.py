"""Homographic-adaptation export throughput on chip.

VERDICT r1 #5: run HA through the BN-folded bf16 graph with batched
images and measure img/s at the reference workload (100 homographies
per image, 240x320; reference export.py:83-114 + magicpoint_coco_export
.yaml). Round-1 number: 7.9 img/s (fp32 unfused graph, batch 8).
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
from spnerf_tpu.ops.homography_adaptation import HAConfig, homography_adaptation
from spnerf_tpu.tasks.export import make_prob_fn

H, W = 240, 320


def main():
    cfg = SuperPointConfig(model_name="magicpoint")
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg,
                                       (1, H, W, 1))
    ha_cfg = HAConfig.from_dict({"num": 100, "chunk": 10})

    # fp32 unfused (the round-1 7.9 img/s configuration) can be added
    # back with (8, False); the fast bf16 path is the production one
    for batch, fast in ((16, True), (32, True)):
        prob_fn = make_prob_fn(model, variables, fast=fast)
        x = jax.random.uniform(jax.random.PRNGKey(1), (batch, H, W, 1))

        def run():
            return homography_adaptation(prob_fn, x, jax.random.PRNGKey(2),
                                         ha_cfg)

        np.asarray(run()[:1])
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            out = run()
        np.asarray(out[:1])
        dt = (time.perf_counter() - t0) / n
        tag = "bf16-folded" if fast else "fp32"
        print(f"batch {batch:3d} {tag:12s}: {batch / dt:6.2f} img/s "
              f"({dt * 1e3:.0f} ms/batch)")


if __name__ == "__main__":
    main()
