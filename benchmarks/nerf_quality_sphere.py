"""Quality gate for the fused NeRF serving path: fit an analytic scene,
evaluate THROUGH the Pallas kernel.

Scene: emissive unit sphere at the origin, colored by surface normal,
black background; cameras on a radius-4 shell looking at the origin.
Trains the tiny fused field with the XLA path (numerically identical to
the kernel), then reports held-out PSNR and mean surface-depth error
rendered by kernels/render_pallas.py — proving the rays/s headline
(bench_nerf.py) measures a usable field, not a benchmark prop.

Round-1 anchor: 36.5 dB PSNR / ~5% depth error after 1,500 iters.
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
import optax

from spnerf_tpu.models.fused_tiny_nerf import (
    TinyFieldConfig,
    direction_features,
    encode_rays,
    init_params,
    make_encoding,
    render_fused_rays,
    render_xla,
)


def sphere_scene(key, n, near=2.0, far=6.0, radius=1.0):
    """Rays from a radius-4 camera shell toward a radius-``radius``
    sphere; returns (origins, dirs, rgb, depth) with analytic
    normal-colored hits. radius < 1 makes a genuinely SPARSE scene
    (most sample chunks see empty space) for the occupancy-skipping
    benchmark; aim jitter scales with the radius so rays still hit."""
    k1, k2 = jax.random.split(key)
    o = jax.random.normal(k1, (n, 3))
    o = 4.0 * o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    aim = 0.25 * radius * jax.random.normal(k2, (n, 3))
    d = aim - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # |o + t d|^2 = radius^2
    b = jnp.sum(o * d, axis=-1)
    c = jnp.sum(o * o, axis=-1) - radius * radius
    disc = b * b - c
    hit = disc > 0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where(hit & (t > near) & (t < far), t, far)
    hit = t < far
    p = o + t[:, None] * d
    rgb = jnp.where(hit[:, None], 0.5 * p / radius + 0.5, 0.0)
    return o, d, rgb, t, hit


def main(iters=1500):
    # --width W: gate a narrow packed-serving field (64/32) instead of
    # the 128-wide production field; eval runs THROUGH the packed kernel
    width = 128
    if "--width" in sys.argv:
        width = int(sys.argv[sys.argv.index("--width") + 1])
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    # --interpret: run the Pallas kernel in interpret mode (CPU drive of
    # the packed path; the dB gate only binds on chip)
    interpret = "--interpret" in sys.argv
    # --radius R: scene sphere radius (default 1.0; 0.5 fabricates the
    # sparse scene for the occupancy-skip benchmark, VERDICT r4 #6)
    radius = 1.0
    if "--radius" in sys.argv:
        radius = float(sys.argv[sys.argv.index("--radius") + 1])
    cfg = TinyFieldConfig(n_samples=32, near=2.0, far=6.0, width=width)
    A, c = make_encoding(cfg)
    params = init_params(jax.random.PRNGKey(0), width=width)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    o, d, rgb, t_gt, hit = sphere_scene(jax.random.PRNGKey(1), 1 << 17,
                                        radius=radius)
    oe, de = encode_rays(o, d, A, c)

    # sparsity prior: the sin-encoded field is unconstrained wherever no
    # training ray passes, and leftover fog there defeats occupancy
    # skipping (round 4 measured 37% of the volume above the alpha
    # threshold on a fog-free scene). Penalizing positive raw density at
    # uniform random points drives unobserved space empty — the standard
    # Plenoxels/DVGO-style sparsity loss.
    sparsity = 0.0 if "--no-sparsity" in sys.argv else 3e-3

    @jax.jit
    def step(p, opt_state, key):
        k_idx, k_pts, k_dirs = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (8192,), 0, oe.shape[0])

        def loss_fn(pp):
            out = render_xla(pp, oe[idx], de[idx], cfg, jitter=0.5,
                             df=direction_features(pp, d[idx], A, c))
            loss = jnp.mean((out["rgb"] - rgb[idx]) ** 2)
            if sparsity > 0.0:
                pts = jax.random.uniform(
                    k_pts, (2048, 3), minval=-cfg.far, maxval=cfg.far)
                dirs = jax.random.normal(k_dirs, (2048, 3))
                dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
                enc = jnp.sin(pts @ A + c)
                h = jax.nn.relu(enc @ pp["w1"])
                h = jax.nn.relu(h @ pp["w2"]
                                + direction_features(pp, dirs, A, c))
                sigma = h @ pp["w3"][:, 0]
                loss = loss + sparsity * jnp.mean(jax.nn.relu(sigma))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    key = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        if i == 0:
            print(f"first step (compile) {time.perf_counter() - t0:.1f}s",
                  flush=True)
    loss = float(loss)
    print(f"trained {iters} iters in {time.perf_counter() - t0:.1f}s, "
          f"final loss {loss:.5f}")

    if "--save" in sys.argv:
        name = ("sphere_field.npz" if width == 128
                else f"sphere_field_w{width}.npz")
        if radius != 1.0:
            name = "sphere_field_sparse.npz"
        out = Path(__file__).parent / "data" / name
        out.parent.mkdir(exist_ok=True)
        np.savez(out, **{k: np.asarray(v) for k, v in params.items()})
        print(f"saved trained field -> {out}")

    # held-out eval THROUGH the fused kernel — dense, then with real
    # occupancy-skip flags (the production path; the gate must hold for
    # BOTH, proving skipping is lossless)
    from spnerf_tpu.ops.occupancy import chunk_flags, field_integral_volume

    ot, dt, rgb_t, tt, hit_t = sphere_scene(jax.random.PRNGKey(9), 1 << 16,
                                            radius=radius)
    bp = {k: v.astype(jnp.bfloat16) for k, v in params.items()}
    if width != 128:
        # narrow field: the serving path is the k-packed kernel; the
        # occupancy/int8 stages are 128-wide-only and are skipped
        from spnerf_tpu.models.fused_tiny_nerf import (
            render_fused_rays_packed)

        for eps, name in ((0.0, "packed-dense"), (1e-3, "packed-early-stop")):
            out_k = render_fused_rays_packed(bp, ot, dt, cfg,
                                             early_stop_eps=eps,
                                             interpret=interpret)
            score2 = out_k
            mse = float(jnp.mean((out_k["rgb"] - rgb_t) ** 2))
            psnr = -10.0 * np.log10(mse)
            derr = jnp.abs(out_k["depth"] - tt) / tt
            mean_derr = float(jnp.mean(jnp.where(hit_t, derr, 0.0))
                              / jnp.mean(hit_t.astype(jnp.float32)))
            print(f"held-out PSNR through PACKED kernel (w={width}) "
                  f"[{name}]: {psnr:.1f} dB; mean surface-depth error "
                  f"{mean_derr * 100:.1f}%")
        return
    ivol = field_integral_volume(params, cfg)
    res = ivol.shape[0] - 1
    occ_frac = float(ivol[-1, -1, -1]) / res**3
    print(f"occupancy grid: {occ_frac * 100:.1f}% of the volume live "
          f"(sparsity weight {sparsity})")
    flags = chunk_flags(ot, dt, ivol, block=512, n_samples=cfg.n_samples,
                        s_chunk=8, near=cfg.near, far=cfg.far,
                        extent=float(cfg.far))
    live = float(jnp.mean(flags.astype(jnp.float32)))
    def score(rgb_k, depth_k, name):
        mse = float(jnp.mean((rgb_k - rgb_t) ** 2))
        psnr = -10.0 * np.log10(mse)
        derr = jnp.abs(depth_k - tt) / tt
        mean_derr = float(jnp.mean(jnp.where(hit_t, derr, 0.0))
                          / jnp.mean(hit_t.astype(jnp.float32)))
        print(f"held-out PSNR through fused kernel [{name}]: {psnr:.1f} dB; "
              f"mean surface-depth error {mean_derr * 100:.1f}%")

    for name, iv in (("dense", None), ("occupancy-skip", ivol)):
        out_k = render_fused_rays(bp, ot, dt, cfg, occupancy_ivol=iv)
        score(out_k["rgb"], out_k["depth"], name)
    print(f"live chunk fraction: {live * 100:.1f}% "
          f"(skipped {100 * (1 - live):.1f}% of sample chunks)")

    # int8 serving path (kernels/render_pallas.render_fused_int8): same
    # gate, proving the 2x-MXU-rate path renders a usable field
    from spnerf_tpu.kernels.render_pallas import (
        quantize_field, render_fused_int8)

    oe_t, de_t = encode_rays(ot, dt, A, c)
    df_t = direction_features(params, dt, A, c)
    qf = quantize_field(params, oe_t[:4096], de_t[:4096], df_t[:4096],
                        n_samples=cfg.n_samples, near=cfg.near, far=cfg.far)
    rgb_q, depth_q = render_fused_int8(
        oe_t, de_t, qf, df_t, jitter=0.5, n_samples=cfg.n_samples,
        near=cfg.near, far=cfg.far, early_stop_eps=1e-3)
    score(rgb_q, depth_q, "int8")


if __name__ == "__main__":
    main()
