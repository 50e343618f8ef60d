"""Homography sampling and point warping — pure JAX, fully vmappable.

Replicates the semantics of the reference's host-side, data-dependent
sampler (reference homographic_augmentation.py:21-106) as a fixed-shape
masked program:

- perspective/scale perturbations are truncated normals,
- scaling/rotation candidates are sampled in fixed-size banks and a
  valid candidate is picked by masked categorical choice (the reference
  rejects invalid candidates with data-dependent ``np.where``),
- the 4-point homography solve is an 8x8 DLT linear system (the
  reference calls ``cv2.getPerspectiveTransform``),
- the returned matrix is the INVERSE transform, exactly like the
  reference (homographic_augmentation.py:104-106), so that
  ``warp_image(img, H)`` (dst(p) = src(H^-1 p)) and
  ``warp_points(pts, H)`` (p' = H p) are consistent.

Point convention: keypoints are (row, col) = (y, x) like the reference;
homographies act on (x, y) homogeneous coordinates; ``warp_points``
does the flip internally (reference kp_utils.py:47-63).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HomographyConfig:
    """Sampling parameters (defaults mirror reference defaults)."""

    translation: bool = True
    rotation: bool = True
    scaling: bool = True
    perspective: bool = True
    scaling_amplitude: float = 0.1
    n_scales: int = 5
    n_angles: int = 25
    perspective_amplitude_x: float = 0.1
    perspective_amplitude_y: float = 0.1
    patch_ratio: float = 0.5
    max_angle: float = 1.57
    allow_artifacts: bool = False
    translation_overflow: float = 0.0

    @classmethod
    def from_dict(cls, d: dict | None) -> "HomographyConfig":
        d = dict(d or {})
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


def _normalizing_transform(pts: jnp.ndarray) -> jnp.ndarray:
    """Hartley normalization: translate centroid to origin, scale to ~unit.

    Keeps the fp32 DLT solve well-conditioned for pixel-scale inputs.
    """
    center = jnp.mean(pts, axis=0)
    scale = jnp.mean(jnp.abs(pts - center)) + 1e-8
    inv_s = 1.0 / scale
    return jnp.array(
        [[inv_s, 0.0, -center[0] * inv_s],
         [0.0, inv_s, -center[1] * inv_s],
         [0.0, 0.0, 1.0]],
        pts.dtype,
    )


def homography_from_corners(pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """Solve the 3x3 homography H with H @ [x1,y1,1]^T ~ [x2,y2,1]^T.

    pts1, pts2: (4, 2) in (x, y). Equivalent of cv2.getPerspectiveTransform,
    with Hartley-normalized coordinates for fp32 robustness.
    """
    T1 = _normalizing_transform(pts1)
    T2 = _normalizing_transform(pts2)
    pts1 = pts1 @ T1[:2, :2].T + T1[:2, 2]
    pts2 = pts2 @ T2[:2, :2].T + T2[:2, 2]

    x, y = pts1[:, 0], pts1[:, 1]
    u, v = pts2[:, 0], pts2[:, 1]
    zeros = jnp.zeros(4, pts1.dtype)
    ones = jnp.ones(4, pts1.dtype)
    ax = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=-1)
    ay = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([ax, ay], axis=0)  # (8, 8)
    b = jnp.concatenate([u, v], axis=0)  # (8,)
    h = jnp.linalg.solve(A, b)
    H_norm = jnp.concatenate([h, jnp.ones(1, h.dtype)]).reshape(3, 3)
    H = jnp.linalg.inv(T2) @ H_norm @ T1
    return H / H[2, 2]


def _truncated_normal(key, shape, scale, bound=2.0):
    """Truncated normal on [-bound, bound] * scale (std = scale within)."""
    return jax.random.truncated_normal(key, -bound, bound, shape) * scale


def _masked_choice(key, candidates: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Uniformly pick one index among valid candidates; returns candidates[idx].

    Falls back to index 0 when nothing is valid (the reference prepends a
    known-safe candidate at index 0 for exactly this reason).
    """
    logits = jnp.where(valid, 0.0, -jnp.inf)
    # if all invalid -> pick index 0 deterministically
    any_valid = jnp.any(valid)
    logits = jnp.where(any_valid, logits, logits.at[0].set(0.0))
    idx = jax.random.categorical(key, logits)
    return candidates[idx]


def sample_homography(
    key: jax.Array,
    shape: tuple[int, int],
    config: HomographyConfig = HomographyConfig(),
) -> jnp.ndarray:
    """Sample one (3, 3) inverse homography for an (H, W) image.

    Jit/vmap-friendly: all shapes static, candidate rejection is masked.
    """
    cfg = config
    k_persp, k_scale_v, k_scale_p, k_trans, k_rot = jax.random.split(key, 5)

    margin = (1.0 - cfg.patch_ratio) / 2.0
    pr = cfg.patch_ratio
    pts1 = margin + jnp.array(
        [[0.0, 0.0], [0.0, pr], [pr, pr], [pr, 0.0]], jnp.float32
    )
    pts2 = pts1

    if cfg.perspective:
        ax = cfg.perspective_amplitude_x
        ay = cfg.perspective_amplitude_y
        if not cfg.allow_artifacts:
            ax = min(ax, margin)
            ay = min(ay, margin)
        kp1, kp2, kp3 = jax.random.split(k_persp, 3)
        persp = _truncated_normal(kp1, (), ay / 2.0)
        left = _truncated_normal(kp2, (), ax / 2.0)
        right = _truncated_normal(kp3, (), ax / 2.0)
        pts2 = pts2 + jnp.stack(
            [
                jnp.stack([left, persp]),
                jnp.stack([left, -persp]),
                jnp.stack([right, persp]),
                jnp.stack([right, -persp]),
            ]
        )

    if cfg.scaling:
        scales = 1.0 + _truncated_normal(
            k_scale_v, (cfg.n_scales,), cfg.scaling_amplitude / 2.0
        )
        scales = jnp.concatenate([jnp.ones(1), scales])  # safe candidate first
        center = jnp.mean(pts2, axis=0, keepdims=True)
        scaled = (pts2 - center)[None] * scales[:, None, None] + center
        if cfg.allow_artifacts:
            valid = jnp.arange(cfg.n_scales + 1) >= 1
        else:
            valid = jnp.all((scaled >= 0.0) & (scaled <= 1.0), axis=(1, 2))
        pts2 = _masked_choice(k_scale_p, scaled, valid)

    if cfg.translation:
        t_min = jnp.min(pts2, axis=0)
        t_max = jnp.min(1.0 - pts2, axis=0)
        if cfg.allow_artifacts:
            t_min = t_min + cfg.translation_overflow
            t_max = t_max + cfg.translation_overflow
        u = jax.random.uniform(k_trans, (2,))
        shift = -t_min + u * (t_max + t_min)
        pts2 = pts2 + shift[None, :]

    if cfg.rotation:
        kr1, kr2 = jax.random.split(k_rot)
        angles = jnp.linspace(-cfg.max_angle, cfg.max_angle, cfg.n_angles)
        angles = jnp.concatenate([jnp.zeros(1), angles])  # safe candidate first
        center = jnp.mean(pts2, axis=0, keepdims=True)
        rot = jnp.stack(
            [
                jnp.stack([jnp.cos(angles), -jnp.sin(angles)], axis=-1),
                jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1),
            ],
            axis=-2,
        )  # (n+1, 2, 2)
        rotated = (
            jnp.einsum("pc,ncd->npd", pts2 - center, rot,
                       precision=jax.lax.Precision.HIGHEST)
            + center
        )
        if cfg.allow_artifacts:
            valid = jnp.arange(cfg.n_angles + 1) >= 1
        else:
            valid = jnp.all((rotated >= 0.0) & (rotated <= 1.0), axis=(1, 2))
        pts2 = _masked_choice(kr2, rotated, valid)
        del kr1

    # rescale unit square -> pixel coords (x, y); shape is (H, W)
    size_xy = jnp.array([shape[1], shape[0]], jnp.float32)
    H = homography_from_corners(pts1 * size_xy[None], pts2 * size_xy[None])
    return jnp.linalg.inv(H)


def sample_homographies(key, n, shape, config=HomographyConfig()):
    """(n, 3, 3) batch of sampled inverse homographies."""
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: sample_homography(k, shape, config))(keys)


def warp_points(points: jnp.ndarray, homography: jnp.ndarray) -> jnp.ndarray:
    """Warp (..., N, 2) (y, x) points by (..., 3, 3) homographies.

    Matches reference kp_utils.py:38-66: flips to (x, y), applies H,
    dehomogenizes, flips back. Broadcasts over leading batch dims.
    """
    pts_xy = points[..., ::-1]
    ones = jnp.ones(pts_xy.shape[:-1] + (1,), pts_xy.dtype)
    homog = jnp.concatenate([pts_xy, ones], axis=-1)  # (..., N, 3)
    warped = jnp.einsum("...ij,...nj->...ni", homography, homog,
                        precision=jax.lax.Precision.HIGHEST)
    warped = warped[..., :2] / (warped[..., 2:3])
    return warped[..., ::-1]


def adapt_homography_to_resize(H: jnp.ndarray, orig_shape, new_shape) -> jnp.ndarray:
    """Conjugate a GT homography by the (possibly anisotropic) resize scaling.

    Mirrors the behavior needed by HPatches evaluation
    (reference HPatches.py:74-100): if S maps original to resized pixel
    coords (diagonal scale in x, y), the resized-coords homography is
    S @ H @ S^-1.
    """
    sy = new_shape[0] / orig_shape[0]
    sx = new_shape[1] / orig_shape[1]
    S = jnp.diag(jnp.array([sx, sy, 1.0], jnp.float32))
    S_inv = jnp.diag(jnp.array([1.0 / sx, 1.0 / sy, 1.0], jnp.float32))
    return S @ H @ S_inv
