"""Instant-NGP-style hash-grid NeRF (fast field family).

The classic hierarchical NeRF costs ~250 MFLOP/ray — its single-chip
ceiling is ~0.4M rays/s (docs/PERF.md), far from the 50M rays/s target.
This family replaces the deep MLP with a multiresolution hash encoding
plus a tiny MLP (~1 MFLOP/ray at 32 samples), the standard fast-NeRF
recipe (Mueller et al., Instant Neural Graphics Primitives).

TPU status: the encoding is gather-bound (8 corners x L levels per
sample); XLA gathers run at ~90M elements/s on the current chip, so
this JAX implementation is a correctness-complete foundation. The once
"planned" fused Pallas kernel (tables resident in VMEM, fused
sample->hash->interp->MLP) was probed and is NOT viable on this
toolchain (benchmarks/mosaic_gather_probe.py, jax 0.9 Mosaic): random
sublane gathers do not lower (compiler crash), 1-D/2-D ``jnp.take``
forms are rejected, and the one supported form — per-element LANE
gather — yields only 1/128 useful lanes for per-ray scalar fetches
(~2M rays/s bound, measured arithmetic in docs/PERF.md round 4+).
The fast serving family is therefore the fused tiny field
(models/fused_tiny_nerf.py + kernels/render_pallas.py), whose
throughput/quality knob is MLP width via sample packing.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# large primes for spatial hashing (Instant-NGP's choice)
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashNeRFConfig:
    n_levels: int = 12
    features_per_level: int = 2
    log2_table_size: int = 17
    base_resolution: int = 16
    max_resolution: int = 1024
    mlp_width: int = 64
    geo_features: int = 15
    dir_freqs: int = 2
    n_samples: int = 48
    near: float = 2.0
    far: float = 6.0
    # scene bound: positions are normalized from [-bound, bound] to [0, 1]
    bound: float = 4.0


class HashGridEncoding(nn.Module):
    """Multiresolution hash encoding: (N, 3) in [0,1] -> (N, L*F)."""

    config: HashNeRFConfig

    @nn.compact
    def __call__(self, x01: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        L = cfg.n_levels
        F = cfg.features_per_level
        T = 1 << cfg.log2_table_size
        growth = np.exp(
            (np.log(cfg.max_resolution) - np.log(cfg.base_resolution))
            / max(L - 1, 1)
        )
        table = self.param(
            "table",
            lambda k, shape: jax.random.uniform(k, shape, minval=-1e-4,
                                                maxval=1e-4),
            (L, T, F),
        )

        outs = []
        for lvl in range(L):
            res = int(np.floor(cfg.base_resolution * growth**lvl))
            pos = x01 * res
            base = jnp.floor(pos).astype(jnp.int32)  # (N, 3)
            frac = pos - base
            feats = 0.0
            for corner in range(8):
                off = jnp.array(
                    [(corner >> 0) & 1, (corner >> 1) & 1, (corner >> 2) & 1],
                    jnp.int32,
                )
                c = base + off  # (N, 3)
                if (res + 1) ** 3 <= T:
                    # dense indexing when the level fits the table
                    idx = (c[:, 0] * (res + 1) + c[:, 1]) * (res + 1) + c[:, 2]
                    idx = jnp.remainder(idx, T)
                else:
                    # spatial hash in uint32 (primes exceed int32 range)
                    cu = c.astype(jnp.uint32)
                    idx = (
                        cu[:, 0] * jnp.uint32(_PRIMES[0])
                        ^ cu[:, 1] * jnp.uint32(_PRIMES[1])
                        ^ cu[:, 2] * jnp.uint32(_PRIMES[2])
                    )
                    idx = jnp.remainder(idx, jnp.uint32(T)).astype(jnp.int32)
                w = jnp.prod(
                    jnp.where(off[None, :] == 1, frac, 1.0 - frac), axis=-1
                )  # (N,)
                feats = feats + w[:, None] * jnp.take(table[lvl], idx, axis=0)
            outs.append(feats)
        return jnp.concatenate(outs, axis=-1)  # (N, L*F)


class HashNeRF(nn.Module):
    """Hash encoding + tiny sigma/color MLPs."""

    config: HashNeRFConfig = HashNeRFConfig()

    @nn.compact
    def __call__(self, positions: jnp.ndarray, directions: jnp.ndarray):
        """positions (..., 3) world coords, directions (..., 3) unit.

        Returns (sigma (...,), rgb (..., 3)).
        """
        from spnerf_tpu.models.nerf import positional_encoding

        cfg = self.config
        batch_shape = positions.shape[:-1]
        x = positions.reshape(-1, 3)
        x01 = jnp.clip((x + cfg.bound) / (2 * cfg.bound), 0.0, 1.0)

        enc = HashGridEncoding(cfg, name="grid")(x01)
        h = nn.Dense(cfg.mlp_width, name="sigma1")(enc)
        h = nn.relu(h)
        h = nn.Dense(1 + cfg.geo_features, name="sigma2")(h)
        sigma = h[..., 0]
        geo = h[..., 1:]

        d = directions.reshape(-1, 3) if directions.ndim == positions.ndim \
            else jnp.broadcast_to(
                directions[..., None, :], positions.shape
            ).reshape(-1, 3)
        dir_enc = positional_encoding(d, cfg.dir_freqs)
        c = jnp.concatenate([geo, dir_enc], axis=-1)
        c = nn.relu(nn.Dense(cfg.mlp_width, name="color1")(c))
        rgb = nn.sigmoid(nn.Dense(3, name="color2")(c))
        return sigma.reshape(batch_shape), rgb.reshape(*batch_shape, 3)


def render_rays_hash(
    model: HashNeRF,
    variables,
    key,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    config: HashNeRFConfig,
):
    """Single-pass stratified render (no hierarchical stage): the hash
    grid resolves detail that the classic NeRF needs importance sampling
    for. Returns {"rgb", "depth", "acc"} with along-ray depth."""
    from spnerf_tpu.models.nerf import (
        composite,
        render_weights,
        stratified_samples,
    )

    n_rays = origins.shape[0]
    t = stratified_samples(key, config.n_samples, config.near, config.far,
                           (n_rays,))
    pos = origins[:, None, :] + directions[:, None, :] * t[..., None]
    sigma, rgb = model.apply(variables, pos, directions)
    w = render_weights(sigma, t)
    color, depth, acc = composite(w, rgb, t)
    return {"rgb": color, "depth": depth, "acc": acc}


def init_hash_nerf(key, config: HashNeRFConfig = HashNeRFConfig()):
    model = HashNeRF(config)
    init_fn = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 1, 3)), jnp.zeros((1, 3)))
    )
    return model, init_fn(key)
