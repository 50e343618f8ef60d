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
from flax import linen as nn


def positional_encoding(x: jnp.ndarray, num_freqs: int, include_input: bool = True):
    """gamma(x): [x, sin(2^k x), cos(2^k x)] for k in [0, num_freqs)."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # (F,)
    xb = x[..., None, :] * freqs[:, None]  # (..., F, D)
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


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


class NeRFMLP(nn.Module):
    """Classic NeRF MLP. Inputs are already positionally encoded."""

    config: NeRFConfig = NeRFConfig()

    @nn.compact
    def __call__(self, pos_enc: jnp.ndarray, dir_enc: jnp.ndarray):
        cfg = self.config
        x = pos_enc
        for i in range(cfg.depth):
            x = nn.Dense(cfg.width, name=f"layer{i}")(x)
            x = nn.relu(x)
            if i + 1 == cfg.skip_layer:
                x = jnp.concatenate([x, pos_enc], axis=-1)
        sigma = nn.Dense(1, name="sigma")(x)[..., 0]
        feat = nn.Dense(cfg.width, name="feature")(x)
        h = jnp.concatenate([feat, dir_enc], axis=-1)
        h = nn.relu(nn.Dense(cfg.width // 2, name="view1")(h))
        rgb = nn.sigmoid(nn.Dense(3, name="rgb")(h))
        return sigma, rgb


class NeRF(nn.Module):
    """Coarse + fine field pair (hierarchical NeRF)."""

    config: NeRFConfig = NeRFConfig()

    def setup(self):
        self.coarse = NeRFMLP(self.config)
        self.fine = NeRFMLP(self.config)

    def query(self, level: str, positions, directions):
        cfg = self.config
        pos_enc = positional_encoding(positions, cfg.pos_freqs)
        dir_enc = positional_encoding(directions, cfg.dir_freqs)
        # broadcast per-ray dirs over samples
        if dir_enc.ndim == pos_enc.ndim - 1:
            dir_enc = jnp.broadcast_to(
                dir_enc[..., None, :], pos_enc.shape[:-1] + (dir_enc.shape[-1],)
            )
        mlp = self.coarse if level == "coarse" else self.fine
        return mlp(pos_enc, dir_enc)

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
    color = (weights[..., None] * rgb).sum(-2)
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
    # vectorized searchsorted over batch dims
    idx = jax.vmap(jnp.searchsorted, in_axes=(0, 0))(
        cdf.reshape(-1, cdf.shape[-1]), u.reshape(-1, n_samples)
    ).reshape(u.shape)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, jnp.clip(below, 0, bins.shape[-1] - 1), axis=-1)
    bins_a = jnp.take_along_axis(bins, jnp.clip(above, 0, bins.shape[-1] - 1), axis=-1)

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
    pos_c = origins[:, None, :] + directions[:, None, :] * t_coarse[..., None]
    sigma_c, rgb_c = model.apply(variables, pos_c, directions, "coarse")
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

    pos_f = origins[:, None, :] + directions[:, None, :] * t_all[..., None]
    sigma_f, rgb_f = model.apply(variables, pos_f, directions, "fine")
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
