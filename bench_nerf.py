"""Secondary benchmark: NeRF rendering throughput (rays/sec) on one chip.

Target (BASELINE.md): >= 50M rays/sec/chip on v5e.

Headline: the fused Pallas serving renderer (kernels/render_pallas.py) —
positional encoding, MLP and alpha compositing in one kernel, the
production fast-NeRF path (tiny Fourier-feature field, 32 samples/ray,
along-ray depth). The classic hierarchical NeRF (parity renderer,
~250 MFLOP/ray) measures ~0.145M rays/s bf16 at its FLOP ceiling — see
docs/PERF.md.

Prints one JSON line {"metric": "nerf_render_rays_per_sec", ...}.
"""

import json
import time

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.models.fused_tiny_nerf import (
    TinyFieldConfig,
    direction_features,
    encode_rays,
    init_params,
    make_encoding,
)
from spnerf_tpu.kernels.render_pallas import render_fused

N_RAYS = 131072
BASELINE_RAYS = 50e6


def main():
    cfg = TinyFieldConfig(n_samples=32)
    params = init_params(jax.random.PRNGKey(0))
    params = {k: v.astype(jnp.bfloat16) for k, v in params.items()}
    A, c = make_encoding(cfg)

    d = jax.random.normal(jax.random.PRNGKey(1), (N_RAYS, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((N_RAYS, 3))
    oe, de = encode_rays(o, d, A, c)
    df = direction_features(params, d, A, c)

    block = int(os.environ.get("SPNERF_RENDER_BLOCK", "256"))

    @jax.jit
    def render(oe, de, df):
        return render_fused(
            oe, de, params["w1"], params["w2"], params["w3"], df,
            jitter=0.5, n_samples=cfg.n_samples, near=cfg.near, far=cfg.far,
            block=block,
        )

    np.asarray(render(oe, de, df)[0][:1])  # compile + materialize

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = render(oe, de, df)
    np.asarray(out[0][:1])
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
