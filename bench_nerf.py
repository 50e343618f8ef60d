"""Secondary benchmark: NeRF rendering throughput (rays/sec) on one chip.

Target (BASELINE.md): >= 50M rays/sec/chip on v5e. Classic hierarchical
NeRF (64 coarse + 128 fine samples, 8x256 MLP) — FLOP-bound by design;
this measures the renderer as shipped, bf16 MLP weights.

Prints one JSON line {"metric": "nerf_render_rays_per_sec", ...}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.models.nerf import NeRFConfig, init_nerf, render_rays

N_RAYS = 32768
BASELINE_RAYS = 50e6


def main():
    config = NeRFConfig()
    model, params = init_nerf(jax.random.PRNGKey(0), config)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    @jax.jit
    def render(key, o, d):
        out = render_rays(model, params, key, o, d, config)
        return out["rgb"], out["depth"]

    key = jax.random.PRNGKey(1)
    o = jnp.zeros((N_RAYS, 3))
    d = jax.random.normal(jax.random.PRNGKey(2), (N_RAYS, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    np.asarray(render(key, o, d)[0])  # compile + materialize

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = render(jax.random.fold_in(key, i), o, d)
    np.asarray(out[0])
    dt = time.perf_counter() - t0

    rays_per_sec = N_RAYS * n_iters / dt
    print(json.dumps({
        "metric": "nerf_render_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/sec",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS, 4),
    }))


if __name__ == "__main__":
    main()
