"""Occupancy grid + per-(ray-block, sample-chunk) skip flags for the
fused NeRF renderer.

The fused render kernel is FLOP-bound: every sample costs three
128x128 matmuls whether or not the sample lands in empty space. For
typical scenes 60-85%% of samples are empty, so the renderer's own
roadmap item (README) is density-grid skipping: a coarse occupancy
grid of the trained field, reduced per ray block x sample chunk to an
int32 flag; the kernel then skips encoding + MLP + compositing for
dead chunks (``pl.when``), which is exact — an empty chunk contributes
alpha = 0 and leaves the compositing state unchanged.

Probe construction (sigma in the tiny field is view-dependent: df is
added before layer 2, models/fused_tiny_nerf.py):

  - ``method="sampled"`` (default): sigma probed at 2x grid resolution
    as the MAX over a Fibonacci-sphere set of view directions, scaled
    by a safety ``margin`` (sigma domain), then max-pooled and dilated
    by one voxel. This is an APPROXIMATION, not a proof: a direction
    between the probes could exceed the max. It is held to the >= 39 dB
    PSNR quality gate (benchmarks/nerf_quality_sphere.py), which runs
    skip-vs-dense through the real kernel.
  - ``method="bound"``: the provable direction-robust bound. Since
    df = sin(d@A+c) @ wd and |sin| <= 1, each feature satisfies
    |df_j| <= sum_i |wd[i,j]| =: m_j, so h2_j = relu(z_j + df_j) lies in
    [relu(z_j - m_j), relu(z_j + m_j)] and sigma = h2 @ w3[:,0] is
    maximised endpoint-wise. Provably conservative for ANY field — but
    in practice so loose it marks ~100% of space occupied on trained
    fields (measured round 4), disabling skipping entirely; kept as the
    option for callers that need the guarantee.

Flags are per (ray-block, sample-chunk): each RAY's chunk segment gets
the axis box of its two endpoints (a segment lies in the box of its
endpoints — tight for thin boxes), queried against the grid via a 3-D
integral image; the block's flag is the OR over its rays. Boxes leaving
the grid extent count as occupied (the sin-encoded field is periodic,
so nothing can be asserted outside the probed extent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.models.fused_tiny_nerf import HID, TinyFieldConfig, make_encoding


def fibonacci_sphere(n: int) -> jnp.ndarray:
    """(n, 3) well-spread unit directions (golden-angle spiral)."""
    i = jnp.arange(n, dtype=jnp.float32) + 0.5
    phi = jnp.arccos(1.0 - 2.0 * i / n)
    theta = jnp.pi * (1.0 + np.sqrt(5.0)) * i
    return jnp.stack([
        jnp.sin(phi) * jnp.cos(theta),
        jnp.sin(phi) * jnp.sin(theta),
        jnp.cos(phi),
    ], axis=-1)


def field_sigma_grid(params, config: TinyFieldConfig, resolution: int = 96,
                     extent: float | None = None, method: str = "sampled",
                     n_dirs: int = 32, margin: float = 2.0) -> jnp.ndarray:
    """Upper estimate of the raw density of the tiny fused field on a
    (res, res, res) grid over [-extent, extent]^3 (cell centers, 2x
    supersampled + max-pooled).

    sigma is view-dependent (df added before layer 2). ``method``:

    - "sampled": max over ``n_dirs`` Fibonacci-sphere directions, times
      ``margin``. Quality-gated approximation (see module docstring).
    - "bound": provable max over ALL directions via
      |df_j| <= sum_i |wd[i,j]| — conservative but loose enough to mark
      ~everything occupied on trained fields.
    """
    ext = float(extent if extent is not None else config.far)
    A, c = make_encoding(config)
    r2 = resolution * 2
    xs = (jnp.arange(r2) + 0.5) / r2 * (2 * ext) - ext
    w3_sigma = params["w3"][:, 0]

    if method == "bound":
        dmax = jnp.abs(params["wd"]).sum(axis=0)  # (HID,): |df_j| bound
        pos = jnp.maximum(w3_sigma, 0.0)
        neg = jnp.minimum(w3_sigma, 0.0)

        def head(z):
            hi = jax.nn.relu(z + dmax)  # upper end of h2 over directions
            lo = jax.nn.relu(z - dmax)  # lower end
            return hi @ pos + lo @ neg
    elif method == "sampled":
        from spnerf_tpu.models.fused_tiny_nerf import direction_features

        dirs = fibonacci_sphere(n_dirs)
        dfs = direction_features(params, dirs, A, c)  # (n_dirs, HID)

        def head(z):
            def one_dir(df):
                return jax.nn.relu(z + df) @ w3_sigma

            sig = jax.lax.map(one_dir, dfs).max(axis=0)  # (P,)
            # inflate only the positive part: occupancy thresholds are
            # positive, and scaling negative raw densities would SHRINK
            # the probe exactly where caution is needed
            return jnp.where(sig > 0, margin * sig, sig)
    else:
        raise ValueError(f"unknown occupancy probe method: {method!r}")

    def sigma_plane(x):
        yy, zz = jnp.meshgrid(xs, xs, indexing="ij")
        pts = jnp.stack([jnp.full_like(yy, x), yy, zz], -1).reshape(-1, 3)
        enc = jnp.sin(pts @ A + c)
        h = jax.nn.relu(enc @ params["w1"])
        z = h @ params["w2"]
        return head(z).reshape(r2, r2)

    sig = jax.lax.map(sigma_plane, xs)  # (r2, r2, r2)
    # 2x2x2 max-pool back to resolution
    sig = sig.reshape(resolution, 2, resolution, 2, resolution, 2)
    return sig.max(axis=(1, 3, 5))


def occupancy_grid(sigma_grid: jnp.ndarray, dt: float,
                   alpha_thresh: float = 1e-3) -> jnp.ndarray:
    """bool (res, res, res): cells whose density contributes more than
    ``alpha_thresh`` alpha over one sample step, dilated by one voxel."""
    sigma_thresh = -np.log(1.0 - alpha_thresh) / dt
    occ = sigma_grid > sigma_thresh
    # 3^3 dilation as three axis-wise max-pools
    f = occ.astype(jnp.float32)
    for axis in range(3):
        f = jnp.maximum(f, jnp.maximum(jnp.roll(f, 1, axis),
                                       jnp.roll(f, -1, axis)))
    return f > 0.5


def integral_volume(occ: jnp.ndarray) -> jnp.ndarray:
    """(res+1,)^3 3-D summed-area table of the bool grid."""
    s = occ.astype(jnp.int32)
    for axis in range(3):
        s = jnp.cumsum(s, axis=axis)
    return jnp.pad(s, ((1, 0), (1, 0), (1, 0)))


def _box_count(ivol, lo, hi):
    """Occupied-voxel count in [lo, hi] (inclusive voxel ranges, (..., 3)).

    The 8 summed-area-table corners are fetched with FLAT 1-D takes
    (index arithmetic outside the gather): XLA lowers 3-D advanced
    indexing to a multi-dim gather that runs ~3x slower on TPU than the
    linearized form (measured round 4: 47 -> 17.5ms for the 131k-ray
    flag build at block=512/s_chunk=16). Even linearized, per-frame
    flags only pay when the scene is sparse enough that the skipped
    chunks outweigh the build (dense render is ~8ms at 131k rays)."""
    h = hi + 1
    S = ivol.shape[0]
    flat = ivol.reshape(-1)

    def at(ix, iy, iz):
        return jnp.take(flat, (ix * S + iy) * S + iz)

    x0, y0, z0 = lo[..., 0], lo[..., 1], lo[..., 2]
    x1, y1, z1 = h[..., 0], h[..., 1], h[..., 2]
    return (at(x1, y1, z1) - at(x0, y1, z1) - at(x1, y0, z1)
            - at(x1, y1, z0) + at(x0, y0, z1) + at(x0, y1, z0)
            + at(x1, y0, z0) - at(x0, y0, z0))


@functools.partial(jax.jit, static_argnames=("block", "n_samples", "s_chunk",
                                             "near", "far", "extent"))
def chunk_flags(origins: jnp.ndarray, directions: jnp.ndarray,
                ivol: jnp.ndarray, *, block: int, n_samples: int,
                s_chunk: int, near: float, far: float,
                extent: float) -> jnp.ndarray:
    """int32 (n_blocks, n_chunks) skip flags for ``render_fused``.

    Rays are grouped exactly as the kernel grid groups them (consecutive
    rows of ``block`` rays, padded by repeating the last ray). Each RAY
    tests its own thin segment-endpoint box against the grid; the block
    flag is the OR over its rays — one fat AABB over a whole camera-fan
    block would sweep most of the scene and skip nothing."""
    N = origins.shape[0]
    pad = (-N) % block
    o = jnp.concatenate([origins, jnp.repeat(origins[-1:], pad, 0)])
    d = jnp.concatenate([directions, jnp.repeat(directions[-1:], pad, 0)])
    nb = (N + pad) // block
    nc = n_samples // s_chunk
    o = o.reshape(nb, block, 3)
    d = d.reshape(nb, block, 3)
    # chunk boundary distances (nc+1,)
    ts = near + jnp.arange(nc + 1) * ((far - near) / nc)
    pts = o[:, None] + ts[None, :, None, None] * d[:, None]  # (nb,nc+1,B,3)
    blo = jnp.minimum(pts[:, :-1], pts[:, 1:])  # (nb, nc, B, 3) per ray
    bhi = jnp.maximum(pts[:, :-1], pts[:, 1:])
    res = ivol.shape[0] - 1
    scale = res / (2.0 * extent)
    vlo = jnp.clip(jnp.floor((blo + extent) * scale), 0, res - 1).astype(jnp.int32)
    vhi = jnp.clip(jnp.floor((bhi + extent) * scale), 0, res - 1).astype(jnp.int32)
    outside = jnp.any((blo < -extent) | (bhi > extent), axis=-1)
    count = _box_count(ivol, vlo, vhi)  # (nb, nc, B)
    live = (count > 0) | outside
    return jnp.any(live, axis=-1).astype(jnp.int32)


def build_render_flags(params, origins, directions,
                       config: TinyFieldConfig, *, block: int,
                       s_chunk: int, resolution: int = 96,
                       extent: float | None = None):
    """One-stop: sigma grid -> occupancy -> integral -> per-render flags.
    The grid/integral depend only on the field; cache ``ivol`` across
    renders of the same field via ``field_integral_volume``."""
    ivol = field_integral_volume(params, config, resolution, extent)
    ext = float(extent if extent is not None else config.far)
    return chunk_flags(origins, directions, ivol, block=block,
                       n_samples=config.n_samples, s_chunk=s_chunk,
                       near=config.near, far=config.far, extent=ext)


def field_integral_volume(params, config: TinyFieldConfig,
                          resolution: int = 96,
                          extent: float | None = None) -> jnp.ndarray:
    dt = (config.far - config.near) / config.n_samples
    sig = field_sigma_grid(params, config, resolution, extent)
    return integral_volume(occupancy_grid(sig, dt))
