"""Tiny fused-renderable NeRF field (Lambertian, 128-wide).

The field family served by ``kernels/render_pallas.render_fused``: a
Fourier-feature encoding folded into a single affine map (3->128, with a
constant-one bias lane), two 128-wide ReLU layers and a 128-wide head
whose column 0 is raw density and columns 1..3 are RGB logits.
View dependence enters as a per-ray direction feature vector
(sin(d @ Ad + cd) @ wd) added before the second layer.

Training runs through the numerically identical XLA path
(``render_xla``); the Pallas kernel serves. ``test_fused_render.py``
pins kernel == XLA parity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

ENC = 128
HID = 128


@dataclasses.dataclass(frozen=True)
class TinyFieldConfig:
    num_freqs: int = 16
    near: float = 2.0
    far: float = 6.0
    n_samples: int = 32
    bound: float = 4.0  # frequency base scale ~ scene extent
    # Field width (ENC == HID == width). 128 is the production default;
    # 64/32 are the packed serving widths (kernels/render_pallas.
    # render_fused_packed runs k = 128//width samples per lane row, so
    # matmul FLOP/ray scales with width at constant MXU utilization).
    width: int = 128


def make_encoding(config: TinyFieldConfig):
    """(A (3, W), c (W,)) with sin(x @ A + c) the feature map, W the
    config width.

    Features: sin/cos of 2^f * x_d / bound for f < num_freqs, d < 3
    (2*3*F columns), one constant-one bias lane (c = pi/2, A col 0), the
    rest dead zeros. num_freqs is clamped to what the width can hold
    ((W-1)//6), so narrow fields automatically drop the highest
    frequencies.
    """
    W = config.width
    F = min(config.num_freqs, (W - 1) // 6)
    A = np.zeros((3, W), np.float32)
    c = np.zeros((W,), np.float32)
    c[0] = np.pi / 2  # sin(pi/2) = 1: constant bias lane
    col = 1
    for d in range(3):
        for f in range(F):
            freq = (2.0**f) / config.bound
            A[d, col] = freq  # sin
            col += 1
            A[d, col] = freq  # cos via phase
            c[col] = np.pi / 2
            col += 1
    assert col <= W
    return jnp.asarray(A), jnp.asarray(c)


def encode_rays(origins, directions, A, c):
    """-> (oe, de) with sample encoding sin(oe + t * de)."""
    hi = jax.lax.Precision.HIGHEST
    oe = jnp.dot(origins, A, precision=hi) + c
    de = jnp.dot(directions, A, precision=hi)
    return oe, de


def init_params(key, scale: float = 0.1, width: int = ENC):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w1": jax.random.normal(k1, (width, width)) * scale,
        "w2": jax.random.normal(k2, (width, width)) * scale,
        "w3": jax.random.normal(k3, (width, width)) * scale,
        "wd": jax.random.normal(k4, (width, width)) * scale,
    }


def direction_features(params, directions, A, c):
    """Per-ray view features injected before layer 2 (computed once)."""
    hi = jax.lax.Precision.HIGHEST
    denc = jnp.sin(jnp.dot(directions, A, precision=hi) + c)
    return jnp.dot(denc, params["wd"], precision=hi)


def render_xla(params, oe, de, config: TinyFieldConfig, jitter: float = 0.5,
               df=None):
    """Reference renderer, op-for-op the Pallas kernel's math."""
    cfg = config
    dt = (cfg.far - cfg.near) / cfg.n_samples
    R = oe.shape[0]
    rgb_acc = jnp.zeros((R, 3))
    depth_acc = jnp.zeros((R,))
    trans = jnp.ones((R,))
    acc = jnp.zeros((R,))
    df = jnp.zeros((R, params["w2"].shape[1])) if df is None else df
    for s in range(cfg.n_samples):
        t_s = cfg.near + (s + jitter) * dt
        enc = jnp.sin(oe + t_s * de)
        h = jax.nn.relu(enc @ params["w1"])
        h = jax.nn.relu(h @ params["w2"] + df)
        head = h @ params["w3"]
        sigma = head[:, 0]
        alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dt)
        rgb = jax.nn.sigmoid(head[:, 1:4])
        w = trans * alpha
        rgb_acc = rgb_acc + w[:, None] * rgb
        depth_acc = depth_acc + w * t_s
        acc = acc + w
        trans = trans * (1.0 - alpha)
    return {"rgb": rgb_acc, "depth": depth_acc, "acc": acc}


def render_fused_rays(params, origins, directions, config: TinyFieldConfig,
                      A=None, c=None, jitter: float = 0.5,
                      block: int = 512, s_chunk: int = 8,
                      occupancy_ivol=None, interpret: bool = False,
                      early_stop_eps: float = 1e-3):
    """Serving path: encode + fused Pallas render. Pass the field's
    integral occupancy volume (ops.occupancy.field_integral_volume) to
    skip empty sample chunks."""
    from spnerf_tpu.kernels.render_pallas import render_fused

    if A is None or c is None:
        A, c = make_encoding(config)
    oe, de = encode_rays(origins, directions, A, c)
    df = direction_features(params, directions, A, c)
    flags = None
    if occupancy_ivol is not None:
        from spnerf_tpu.ops.occupancy import chunk_flags

        flags = chunk_flags(origins, directions, occupancy_ivol,
                            block=block, n_samples=config.n_samples,
                            s_chunk=s_chunk, near=config.near,
                            far=config.far, extent=float(config.far))
    rgb, depth = render_fused(
        oe, de, params["w1"], params["w2"], params["w3"], df,
        jitter=jitter, n_samples=config.n_samples,
        near=config.near, far=config.far, block=block, s_chunk=s_chunk,
        flags=flags, interpret=interpret, early_stop_eps=early_stop_eps,
    )
    return {"rgb": rgb, "depth": depth}


def render_fused_rays_packed(params, origins, directions,
                             config: TinyFieldConfig, A=None, c=None,
                             jitter: float = 0.5, block: int = 512,
                             s_chunk: int = 8, interpret: bool = False,
                             early_stop_eps: float = 1e-3):
    """Serving path for narrow fields (config.width in {64, 32}):
    encode + k-packed fused Pallas render (k = 128 // width samples per
    lane row). Numerically the same field as ``render_xla`` with these
    params; see kernels/render_pallas.render_fused_packed."""
    from spnerf_tpu.kernels.render_pallas import render_fused_packed

    if A is None or c is None:
        A, c = make_encoding(config)
    oe, de = encode_rays(origins, directions, A, c)
    df = direction_features(params, directions, A, c)
    rgb, depth = render_fused_packed(
        oe, de, params["w1"], params["w2"], params["w3"], df,
        jitter=jitter, width=config.width, n_samples=config.n_samples,
        near=config.near, far=config.far, block=block, s_chunk=s_chunk,
        interpret=interpret, early_stop_eps=early_stop_eps,
    )
    return {"rgb": rgb, "depth": depth}
