"""In-framework NeRF: positional encoding, MLP, hierarchical sampling,
volume rendering with ALONG-RAY depth.

The reference delegates NeRF entirely to NerfStudio + tiny-cuda-nn
(colmap/colmap.py:117-155, dependencies/*.bat); the NeRF dataset then
consumes rendered images / camera_transforms / depth from disk
(NeRF_dataset.py:30-48). Here the renderer is in-framework and
TPU-native: everything is batched matmul work on the MXU, sampling is
fixed-size (64 coarse + 128 fine), and the renderer emits *along-ray*
(Euclidean) depth — the exact convention ``warp_points_nerf`` consumes
(kp_utils.py:115-117 normalizes rays to unit length then scales by
depth).

Architecture follows the classic NeRF recipe (BASELINE.json config 4):
8x256 MLP with a skip connection at layer 4, 10-frequency positional
encoding for positions, 4 for view directions, sigma + view-dependent
RGB heads.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def positional_encoding(x: jnp.ndarray, num_freqs: int, include_input: bool = True):
    """gamma(x): [x, sin/cos(2^k x)] for k in [0, num_freqs).

    Layout-aware: works on a WIDE last dim (2*D*F) with a single fused
    sin (cos(v) = sin(v + pi/2)). Computing per-frequency on a last-dim-3
    tensor wastes 125 of 128 vector lanes and is ~30x slower on TPU.
    """
    xf = x @ jnp.asarray(_expand_matrix(x.shape[-1], num_freqs,
                                        include_input), x.dtype)
    return _finish_encoding(xf, x.shape[-1] if include_input else 0)


def _expand_matrix(D: int, F: int, include_input: bool = True) -> np.ndarray:
    """(D, [D +] D*F) selection-and-scale matrix: x @ E = [x, 2^k x_d...].

    Elementwise ops on last-dim-3 tensors pad 3 -> 128 vector lanes (42x
    wasted bandwidth); routing the frequency expansion through one matmul
    keeps narrow tensors on the MXU only.
    """
    freqs = 2.0 ** np.arange(F, dtype=np.float32)
    expand = np.zeros((D, D * F), np.float32)
    for d in range(D):
        expand[d, d * F : (d + 1) * F] = freqs
    if include_input:
        expand = np.concatenate([np.eye(D, dtype=np.float32), expand], axis=1)
    return expand


def _finish_encoding(xf: jnp.ndarray, d_input: int) -> jnp.ndarray:
    """[x, 2^k x_d...] -> [x, sin(2^k x_d), cos(2^k x_d)] (wide, fused sin)."""
    raw, freqpart = xf[..., :d_input], xf[..., d_input:]
    phases = jnp.concatenate([freqpart, freqpart + jnp.pi / 2], axis=-1)
    return jnp.concatenate([raw, jnp.sin(phases)], axis=-1)


def encode_ray_points(origins, directions, t_vals, num_freqs):
    """Positional-encode o + t*d without ever materializing (N, S, 3).

    The expansion matmul distributes over the ray equation:
    (o + t d) @ E = o@E + t * (d@E), so the (N, S, *) tensors are all
    encoding-width (wide lanes). origins/directions: (N, 3),
    t_vals: (N, S) -> (N, S, 3 + 6*num_freqs).
    """
    E = jnp.asarray(_expand_matrix(3, num_freqs, True), origins.dtype)
    oE = origins @ E  # (N, E)
    dE = directions @ E
    xf = oE[:, None, :] + dE[:, None, :] * t_vals[..., None]
    return _finish_encoding(xf, 3)


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    depth: int = 8
    width: int = 256
    skip_layer: int = 4
    pos_freqs: int = 10
    dir_freqs: int = 4
    n_coarse: int = 64
    n_fine: int = 128
    near: float = 2.0
    far: float = 6.0
    white_background: bool = False
    # matmul compute dtype ("bfloat16" runs the MXU at full rate —
    # f32 matmuls run at 1/4-1/8; params/accumulation stay f32)
    compute_dtype: str = "float32"


class NeRFMLP(nn.Module):
    """Classic NeRF MLP. Inputs are already positionally encoded."""

    config: NeRFConfig = NeRFConfig()

    @nn.compact
    def __call__(self, pos_enc: jnp.ndarray, dir_enc: jnp.ndarray):
        cfg = self.config
        dt = jnp.dtype(cfg.compute_dtype)
        x = pos_enc
        for i in range(cfg.depth):
            x = nn.Dense(cfg.width, name=f"layer{i}", dtype=dt)(x)
            x = nn.relu(x)
            if i + 1 == cfg.skip_layer:
                x = jnp.concatenate([x, pos_enc.astype(x.dtype)], axis=-1)
        sigma = nn.Dense(1, name="sigma", dtype=dt)(x)[..., 0]
        feat = nn.Dense(cfg.width, name="feature", dtype=dt)(x)
        h = jnp.concatenate([feat, dir_enc.astype(feat.dtype)], axis=-1)
        h = nn.relu(nn.Dense(cfg.width // 2, name="view1", dtype=dt)(h))
        rgb = nn.sigmoid(nn.Dense(3, name="rgb", dtype=dt)(h))
        # composite in f32: alpha/cumprod chains are precision-sensitive
        return sigma.astype(jnp.float32), rgb.astype(jnp.float32)


class NeRF(nn.Module):
    """Coarse + fine field pair (hierarchical NeRF)."""

    config: NeRFConfig = NeRFConfig()

    def setup(self):
        self.coarse = NeRFMLP(self.config)
        self.fine = NeRFMLP(self.config)

    def query(self, level: str, positions, directions):
        cfg = self.config
        batch_shape = positions.shape[:-1]
        pos_enc = positional_encoding(positions.reshape(-1, 3), cfg.pos_freqs)
        dir_enc = positional_encoding(directions, cfg.dir_freqs)
        # broadcast per-ray dirs over samples
        if dir_enc.ndim == positions.ndim - 1:
            dir_enc = jnp.broadcast_to(
                dir_enc[..., None, :],
                batch_shape + (dir_enc.shape[-1],),
            )
        dir_enc = dir_enc.reshape(-1, dir_enc.shape[-1])
        mlp = self.coarse if level == "coarse" else self.fine
        # run the MLP on flat (M, C) tensors: clean 2-D MXU layouts
        sigma, rgb = mlp(pos_enc, dir_enc)
        return sigma.reshape(batch_shape), rgb.reshape(*batch_shape, 3)

    def encoded(self, pos_enc, dir_enc, level: str = "coarse"):
        """Query with precomputed encodings (see encode_ray_points)."""
        mlp = self.coarse if level == "coarse" else self.fine
        batch = pos_enc.shape[:-1]
        sigma, rgb = mlp(
            pos_enc.reshape(-1, pos_enc.shape[-1]),
            dir_enc.reshape(-1, dir_enc.shape[-1]),
        )
        return sigma.reshape(batch), rgb.reshape(*batch, 3)

    def __call__(self, positions, directions, level: str | None = "coarse"):
        if level is None:  # init path: touch both branches
            c = self.query("coarse", positions, directions)
            f = self.query("fine", positions, directions)
            return c, f
        return self.query(level, positions, directions)


# ------------------------------------------------------------------ rendering


def render_weights(sigma: jnp.ndarray, t_vals: jnp.ndarray) -> jnp.ndarray:
    """Alpha-composite weights from densities.

    sigma: (..., S); t_vals: (..., S) sample distances along (unit) rays.
    """
    deltas = jnp.diff(t_vals, axis=-1)
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], 1e10)], axis=-1
    )
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * deltas)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    return alpha * trans


def composite(weights: jnp.ndarray, rgb: jnp.ndarray, t_vals: jnp.ndarray,
              white_background: bool = False):
    """weights (..., S), rgb (..., S, 3), t_vals (..., S) ->
    (rgb (..., 3), depth (...), acc (...)).

    Depth is the weighted mean sample distance — along-ray Euclidean
    distance when ray directions are unit length.
    """
    acc = weights.sum(-1)
    # channel-leading layout: (..., S, 3) elementwise would pad 3 -> 128
    # vector lanes; (3, ..., S) keeps the reduction wide
    rgb_t = jnp.moveaxis(rgb, -1, 0)  # (3, ..., S)
    color = jnp.moveaxis((weights[None] * rgb_t).sum(-1), 0, -1)  # (..., 3)
    depth = (weights * t_vals).sum(-1)
    if white_background:
        color = color + (1.0 - acc[..., None])
    return color, depth, acc


def stratified_samples(key, n_samples: int, near: float, far: float, shape):
    """Jittered uniform samples in [near, far]; shape = ray batch dims."""
    bins = jnp.linspace(0.0, 1.0, n_samples + 1)
    lower, upper = bins[:-1], bins[1:]
    u = jax.random.uniform(key, shape + (n_samples,))
    t = lower + (upper - lower) * u
    return near + t * (far - near)


def sample_pdf(key, bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int):
    """Inverse-CDF sampling of the coarse weight distribution
    (hierarchical NeRF). bins: (..., B+1) edges; weights: (..., B)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))
    # batched searchsorted as a broadcast comparison-count (vmapping
    # jnp.searchsorted over many rows compiles pathologically)
    nb = cdf.shape[-1]
    idx = jnp.sum(u[..., :, None] >= cdf[..., None, :], axis=-1)
    below = jnp.clip(idx - 1, 0, nb - 1)
    above = jnp.clip(idx, 0, nb - 1)

    # gather-free interpolation: one-hot weighted sums stay on wide lanes
    # (take_along_axis gathers dominate this function's runtime on TPU)
    grid = jnp.arange(nb)
    oh_b = (below[..., :, None] == grid).astype(cdf.dtype)  # (..., S, B+1)
    oh_a = (above[..., :, None] == grid).astype(cdf.dtype)
    cdf_b = (oh_b * cdf[..., None, :]).sum(-1)
    cdf_a = (oh_a * cdf[..., None, :]).sum(-1)
    bins_pad = jnp.concatenate(
        [bins, jnp.broadcast_to(bins[..., -1:], bins.shape[:-1] + (nb - bins.shape[-1],))],
        axis=-1,
    ) if bins.shape[-1] < nb else bins[..., :nb]
    bins_b = (oh_b * bins_pad[..., None, :]).sum(-1)
    bins_a = (oh_a * bins_pad[..., None, :]).sum(-1)

    denom = jnp.where(cdf_a - cdf_b < 1e-8, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def render_rays(
    model: NeRF,
    variables,
    key,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    config: NeRFConfig,
):
    """Hierarchical render of (N, 3) rays -> dict of coarse/fine outputs.

    directions must be UNIT LENGTH so t is along-ray distance (the depth
    convention the keypoint pipeline expects).
    """
    k_strat, k_fine = jax.random.split(key)
    n_rays = origins.shape[0]

    t_coarse = stratified_samples(
        k_strat, config.n_coarse, config.near, config.far, (n_rays,)
    )
    # encode without materializing (N, S, 3) point tensors (narrow-lane
    # layouts are ~40x slower on TPU); directions encoded once per ray
    dir_enc = positional_encoding(directions, config.dir_freqs)

    def run(level, t_vals):
        pos_enc = encode_ray_points(origins, directions, t_vals,
                                    config.pos_freqs)
        d = jnp.broadcast_to(dir_enc[:, None, :],
                             pos_enc.shape[:-1] + (dir_enc.shape[-1],))
        return model.apply(variables, pos_enc, d, level, method=NeRF.encoded)

    sigma_c, rgb_c = run("coarse", t_coarse)
    w_c = render_weights(sigma_c, t_coarse)
    color_c, depth_c, acc_c = composite(w_c, rgb_c, t_coarse,
                                        config.white_background)

    # hierarchical: resample around the coarse distribution
    mids = 0.5 * (t_coarse[..., 1:] + t_coarse[..., :-1])
    edges = jnp.concatenate(
        [t_coarse[..., :1], mids, t_coarse[..., -1:]], axis=-1
    )
    t_fine = sample_pdf(k_fine, edges, w_c, config.n_fine)
    t_all = jnp.sort(jnp.concatenate([t_coarse, t_fine], axis=-1), axis=-1)

    sigma_f, rgb_f = run("fine", t_all)
    w_f = render_weights(sigma_f, t_all)
    color_f, depth_f, acc_f = composite(w_f, rgb_f, t_all,
                                        config.white_background)

    return {
        "rgb_coarse": color_c,
        "depth_coarse": depth_c,
        "acc_coarse": acc_c,
        "rgb": color_f,
        "depth": depth_f,
        "acc": acc_f,
    }


def camera_rays(shape, intrinsics: jnp.ndarray, cam_to_world: jnp.ndarray):
    """Unit-length rays for every pixel of an (H, W) image.

    OpenCV camera convention (x right, y down, z forward); cam_to_world
    is (4, 4). NerfStudio-convention transforms must be converted first
    with ``geometry.nerfstudio_to_cv``. Returns (origins (H*W, 3),
    directions (H*W, 3) unit length).
    """
    H, W = shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    pix = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(H * W)], axis=-1)
    K_inv = jnp.linalg.inv(intrinsics)
    dirs_cam = pix @ K_inv.T
    R = cam_to_world[:3, :3]
    t = cam_to_world[:3, 3]
    dirs = dirs_cam @ R.T
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(t, dirs.shape)
    return origins, dirs


@partial(jax.jit, static_argnames=("model", "shape", "config", "chunk"))
def render_image(
    model: NeRF,
    variables,
    key,
    shape: tuple[int, int],
    intrinsics: jnp.ndarray,
    cam_to_world: jnp.ndarray,
    config: NeRFConfig,
    chunk: int = 4096,
):
    """Full-image render via lax.map over ray chunks.

    Returns {"rgb": (H, W, 3), "depth": (H, W), "acc": (H, W)} — depth
    is along-ray distance, ready for the NeRF dataset layout.
    """
    H, W = shape
    origins, dirs = camera_rays(shape, intrinsics, cam_to_world)
    n = H * W
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    origins = jnp.pad(origins, ((0, pad), (0, 0)))
    dirs = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    keys = jax.random.split(key, n_chunks)

    def render_chunk(args):
        k, o, d = args
        out = render_rays(model, variables, k, o, d, config)
        return out["rgb"], out["depth"], out["acc"]

    rgb, depth, acc = jax.lax.map(
        render_chunk,
        (keys, origins.reshape(n_chunks, chunk, 3), dirs.reshape(n_chunks, chunk, 3)),
    )
    rgb = rgb.reshape(-1, 3)[:n].reshape(H, W, 3)
    depth = depth.reshape(-1)[:n].reshape(H, W)
    acc = acc.reshape(-1)[:n].reshape(H, W)
    return {"rgb": rgb, "depth": depth, "acc": acc}


def init_nerf(key, config: NeRFConfig = NeRFConfig()):
    model = NeRF(config)
    init_fn = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 1, 3)), jnp.zeros((1, 3)), None)
    )
    variables = init_fn(key)
    return model, variables
