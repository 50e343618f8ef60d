"""Secondary benchmark: NeRF rendering throughput (rays/sec) on one chip.

Target (BASELINE.md): >= 50M rays/sec/chip on v5e.

Headline (the LAST printed line): the k-packed narrow-width fused
Pallas renderer (kernels/render_pallas.render_fused_packed) at width
32 — 4 samples per 128-lane row, single packed rgb+depth output,
triangular-matmul transmittance prefix — quality-gated at 39.5 dB
through the same kernel (benchmarks/nerf_quality_sphere.py --width 32).
Round-5 capture: 26.3M rays/s vs 15.2M for the width-128 dense kernel
(docs/PERF.md round-5 stage budget: MLP term scales exactly 1/pack;
the 28.6 ns/ray non-MLP floor caps packing at ~35M on this chip).
Also reported: w128 dense / early-stop (the round-4 production mode,
at its bf16 MXU speed of light per docs/PERF.md), packed-w64,
occupancy chunk-skipping (in-loop and cached-flag variants; only pays
on scenes sparser than this benchmark's), and, opt-in via
SPNERF_RENDER_INT8=1, the int8 twin (measured slower on v5e; kept for
the record). Falls back to w128 early-stop as headline when no gated
narrow field is on disk.

Protocol: a trained sphere field (benchmarks/data/sphere_field.npz,
written by benchmarks/nerf_quality_sphere.py --save; quality gate
>= 39 dB PSNR runs THROUGH this kernel) rendered from an orbit
camera. Falls back to dense rendering when no trained field is on
disk.

Prints one JSON line {"metric": "nerf_render_rays_per_sec", ...}.
"""

import json
import os
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.kernels.render_pallas import render_fused
from spnerf_tpu.models.fused_tiny_nerf import (
    TinyFieldConfig,
    direction_features,
    encode_rays,
    init_params,
    make_encoding,
)

N_RAYS = int(os.environ.get("SPNERF_BENCH_NERF_RAYS", "131072"))
BASELINE_RAYS = 50e6
# SPNERF_RENDER_FIELD selects a different trained field (e.g.
# sphere_field_sparse.npz for the occupancy-skipping benchmark)
FIELD_PATH = Path(__file__).parent / "benchmarks" / "data" / os.environ.get(
    "SPNERF_RENDER_FIELD", "sphere_field.npz")


def orbit_rays(n_rays, key):
    """Camera-like ray bundle: origin ring at radius 4 looking inward."""
    from spnerf_tpu.data.nerf_dataset import camera_intrinsics
    from spnerf_tpu.models.nerf import camera_rays
    from spnerf_tpu.tasks.nerf_task import pose_orbit

    H = W = int(np.sqrt(n_rays))
    K = camera_intrinsics((H, W), 60.0)
    pose = pose_orbit(8, radius=4.0, height=0.4)[0]
    o, d = camera_rays((H, W), jnp.asarray(K), jnp.asarray(pose))
    pad = n_rays - H * W
    return (jnp.concatenate([o, o[:pad]]), jnp.concatenate([d, d[:pad]]))


def main():
    cfg = TinyFieldConfig(n_samples=32)
    if FIELD_PATH.exists():
        data = np.load(FIELD_PATH)
        params = {k: jnp.asarray(data[k], jnp.bfloat16) for k in data.files}
        mode = "sphere_field+occupancy"
    else:
        params = init_params(jax.random.PRNGKey(0))
        params = {k: v.astype(jnp.bfloat16) for k, v in params.items()}
        mode = "dense(untrained)"
    A, c = make_encoding(cfg)

    o, d = orbit_rays(N_RAYS, jax.random.PRNGKey(1))
    oe, de = encode_rays(o, d, A, c)
    df = direction_features(params, d, A, c)

    block = int(os.environ.get("SPNERF_RENDER_BLOCK", "1024"))
    s_chunk = int(os.environ.get("SPNERF_RENDER_CHUNK", "16"))

    ivol = None
    live_frac = None
    if mode.startswith("sphere"):
        from spnerf_tpu.ops.occupancy import chunk_flags, field_integral_volume

        # field-dependent, camera-independent: built once per field
        ivol = jax.block_until_ready(field_integral_volume(
            {k: v.astype(jnp.float32) for k, v in params.items()}, cfg))
        fl = chunk_flags(o, d, ivol, block=block, n_samples=cfg.n_samples,
                         s_chunk=s_chunk, near=cfg.near, far=cfg.far,
                         extent=float(cfg.far))
        live_frac = round(float(jnp.mean(fl.astype(jnp.float32))), 4)

    def make_render(use_occ: bool, es_eps: float):
        @jax.jit
        def render(oe, de, df, o, d):
            flags = None
            if use_occ and ivol is not None:
                # camera-dependent: belongs in the timed region
                flags = chunk_flags(o, d, ivol, block=block,
                                    n_samples=cfg.n_samples, s_chunk=s_chunk,
                                    near=cfg.near, far=cfg.far,
                                    extent=float(cfg.far))
            return render_fused(
                oe, de, params["w1"], params["w2"], params["w3"], df,
                jitter=0.5, n_samples=cfg.n_samples, near=cfg.near,
                far=cfg.far, block=block, s_chunk=s_chunk, flags=flags,
                early_stop_eps=es_eps,
            )

        return render

    def make_render_int8(qf, use_occ: bool, es_eps: float):
        from spnerf_tpu.kernels.render_pallas import render_fused_int8

        @jax.jit
        def render(oe, de, df, o, d):
            flags = None
            if use_occ and ivol is not None:
                flags = chunk_flags(o, d, ivol, block=block,
                                    n_samples=cfg.n_samples, s_chunk=s_chunk,
                                    near=cfg.near, far=cfg.far,
                                    extent=float(cfg.far))
            return render_fused_int8(
                oe, de, qf, df, jitter=0.5, n_samples=cfg.n_samples,
                near=cfg.near, far=cfg.far, block=block, s_chunk=s_chunk,
                flags=flags, early_stop_eps=es_eps,
            )

        return render

    # production mode LAST: evidence tooling takes the final JSON line.
    # bf16 early-stop is the production default: the kernel is
    # matmul-bound at the chip's measured bf16 MXU rate (docs/PERF.md
    # round-4 SoL analysis); int8 measured SLOWER (no MXU rate win on
    # v5e + quantize VPU cost) and occupancy flags only pay on scenes
    # far sparser than this benchmark's (live_frac ~0.8-1.0 here).
    variants = [
        ("dense", make_render(False, 0.0)),
    ]
    if ivol is not None:
        variants += [
            ("occupancy+early-stop", make_render(True, 1e-3)),
        ]
        # fixed-camera serving: flags prebuilt once per (field, camera)
        # and amortized over frames — only the render is in the timed
        # region (VERDICT r4 #6: flag caching)
        fl_cached = jax.block_until_ready(chunk_flags(
            o, d, ivol, block=block, n_samples=cfg.n_samples,
            s_chunk=s_chunk, near=cfg.near, far=cfg.far,
            extent=float(cfg.far)))

        @jax.jit
        def render_occ_cached(oe, de, df, o, d):
            return render_fused(
                oe, de, params["w1"], params["w2"], params["w3"], df,
                jitter=0.5, n_samples=cfg.n_samples, near=cfg.near,
                far=cfg.far, block=block, s_chunk=s_chunk,
                flags=fl_cached, early_stop_eps=1e-3)

        variants += [("occupancy-cached+early-stop", render_occ_cached)]

    # k-packed narrow-width serving fields (VERDICT r4 #2): trained by
    # nerf_quality_sphere.py --width {64,32} --save, quality-gated
    # through the SAME packed kernel (39.5 dB at both widths, round 5).
    # Best measured configs per width (docs/PERF.md round-5 packed
    # stage budget). packed-w32 is the PRODUCTION headline when its
    # gated field exists: 25.2M rays/s vs 15.4M dense on this chip.
    packed_variants = []
    from spnerf_tpu.kernels.render_pallas import render_fused_packed

    for pw, p_chunk, p_block in ((64, 16, 512), (32, 8, 2048)):
        fp = FIELD_PATH.parent / f"sphere_field_w{pw}.npz"
        if not fp.exists():
            continue
        pdata = np.load(fp)
        pparams = {k: jnp.asarray(pdata[k], jnp.bfloat16)
                   for k in pdata.files}
        pcfg = TinyFieldConfig(n_samples=32, width=pw)
        pA, pc = make_encoding(pcfg)
        poe, pde = encode_rays(o, d, pA, pc)
        pdf = direction_features(pparams, d, pA, pc)

        def make_packed(pparams=pparams, poe=poe, pde=pde, pdf=pdf,
                        pw=pw, p_chunk=p_chunk, p_block=p_block,
                        pcfg=pcfg):
            @jax.jit
            def render(oe, de, df, o, d):
                return render_fused_packed(
                    poe, pde, pparams["w1"], pparams["w2"],
                    pparams["w3"], pdf, jitter=0.5, width=pw,
                    n_samples=pcfg.n_samples, near=pcfg.near,
                    far=pcfg.far, block=p_block, s_chunk=p_chunk,
                    early_stop_eps=1e-3)
            return render

        packed_variants += [(f"packed-w{pw}", make_packed())]
    if os.environ.get("SPNERF_RENDER_INT8", "0") != "0":
        from spnerf_tpu.kernels.render_pallas import quantize_field

        fparams = {k: v.astype(jnp.float32) for k, v in params.items()}
        calib = slice(0, 4096)
        qf = quantize_field(fparams, oe[calib], de[calib], df[calib],
                            n_samples=cfg.n_samples, near=cfg.near,
                            far=cfg.far)
        variants += [("int8+early-stop", make_render_int8(qf, False, 1e-3))]
    # the w128 early-stop path stays last (headline) unless a gated
    # packed field is present, in which case packed-w32/-w64 take over
    variants += [("early-stop", make_render(False, 1e-3))]
    variants += packed_variants

    n_iters = 10
    for name, render in variants:
        np.asarray(render(oe, de, df, o, d)[0][:1])  # compile + materialize
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = render(oe, de, df, o, d)
        np.asarray(out[0][:1])
        dt = time.perf_counter() - t0
        rays_per_sec = N_RAYS * n_iters / dt
        rec = {
            "metric": "nerf_render_rays_per_sec",
            "value": round(rays_per_sec, 1),
            "unit": "rays/sec",
            "vs_baseline": round(rays_per_sec / BASELINE_RAYS, 4),
            "mode": f"{mode}:{name}", "block": block, "s_chunk": s_chunk,
        }
        if live_frac is not None and "occupancy" in name:
            rec["live_chunk_frac"] = live_frac
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
