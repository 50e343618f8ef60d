"""NeRF scene training + novel-view dataset rendering.

Replaces the reference's external NerfStudio/COLMAP toolchain
(colmap/colmap.py:84-155, dependencies/*.bat): train an in-framework
NeRF on posed images, then render novel views WITH along-ray depth and
camera poses into exactly the directory layout the NeRF dataset
consumes (NeRF_dataset.py:30-48):

    DATA_PATH/NeRF/<scene>/{images,camera_transforms,depth}/<split>/

so the downstream export_NeRF_labels / NeRF-SuperPoint training loop is
fully self-contained.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from spnerf_tpu.models.nerf import (
    NeRF,
    NeRFConfig,
    init_nerf,
    render_image,
    render_rays,
    camera_rays,
)
from spnerf_tpu.settings import DATA_PATH


@partial(jax.jit, static_argnames=("model", "tx", "config_static"),
         donate_argnames=("params", "opt_state"))
def nerf_train_step(model, params, opt_state, tx, key, origins, dirs, target_rgb,
                    config_static):
    """One photometric MSE step over a ray batch (coarse + fine)."""

    def loss_fn(p):
        out = render_rays(model, p, key, origins, dirs, config_static)
        loss_c = jnp.mean((out["rgb_coarse"] - target_rgb) ** 2)
        loss_f = jnp.mean((out["rgb"] - target_rgb) ** 2)
        return loss_c + loss_f, (loss_c, loss_f)

    (loss, (lc, lf)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": loss, "coarse": lc, "fine": lf}


def train_nerf_scene(
    images: np.ndarray,  # (N, H, W, 3) in [0, 1]
    cam_to_worlds: np.ndarray,  # (N, 4, 4) OpenCV convention
    intrinsics: np.ndarray,  # (3, 3)
    config: NeRFConfig = NeRFConfig(),
    num_iters: int = 20000,
    ray_batch: int = 1024,
    learning_rate: float = 5e-4,
    seed: int = 0,
    log_every: int = 500,
):
    """Train a hierarchical NeRF on a posed image set. Returns
    (model, params)."""
    N, H, W, _ = images.shape
    model, variables = init_nerf(jax.random.PRNGKey(seed), config)
    params = variables
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    # precompute all rays once (host memory): (N*H*W, 3) each
    all_o, all_d, all_rgb = [], [], []
    for i in range(N):
        o, d = camera_rays((H, W), jnp.asarray(intrinsics),
                           jnp.asarray(cam_to_worlds[i]))
        all_o.append(np.asarray(o))
        all_d.append(np.asarray(d))
        all_rgb.append(images[i].reshape(-1, 3))
    all_o = np.concatenate(all_o)
    all_d = np.concatenate(all_d)
    all_rgb = np.concatenate(all_rgb).astype(np.float32)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    history = []
    for it in range(num_iters):
        idx = rng.integers(0, len(all_o), ray_batch)
        key, sub = jax.random.split(key)
        params, opt_state, metrics = nerf_train_step(
            model, params, opt_state, tx, sub,
            jnp.asarray(all_o[idx]), jnp.asarray(all_d[idx]),
            jnp.asarray(all_rgb[idx]), config,
        )
        if (it + 1) % log_every == 0:
            history.append(float(metrics["loss"]))
    return model, params, history


def pose_orbit(n_frames: int, radius: float = 4.0, height: float = 0.5,
               look_at=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Simple orbit of OpenCV-convention cam-to-world poses for novel-view
    rendering around a scene center."""
    poses = []
    center = np.asarray(look_at, np.float64)
    for i in range(n_frames):
        theta = 2 * np.pi * i / n_frames
        eye = np.array([radius * np.cos(theta), height, radius * np.sin(theta)])
        forward = center - eye
        forward = forward / np.linalg.norm(forward)
        tmp_up = np.array([0.0, -1.0, 0.0])  # OpenCV: y down
        right = np.cross(tmp_up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        T = np.eye(4)
        T[:3, 0] = right
        T[:3, 1] = down
        T[:3, 2] = forward
        T[:3, 3] = eye
        poses.append(T)
    return np.stack(poses).astype(np.float32)


def render_dataset(
    model: NeRF,
    params,
    scene_name: str,
    poses: np.ndarray,  # (N, 4, 4) OpenCV-convention cam-to-world
    shape: tuple[int, int],
    intrinsics: np.ndarray,
    config: NeRFConfig = NeRFConfig(),
    splits: dict | None = None,  # {"training": [idx...], ...}
    seed: int = 0,
) -> Path:
    """Render novel views + along-ray depth + poses into the NeRF dataset
    layout. Stored camera transforms use the NerfStudio axis convention
    (the dataset flips them back, NeRF_dataset.py:86-93)."""
    root = Path(DATA_PATH, "NeRF", scene_name)
    n = len(poses)
    splits = splits or {"training": list(range(n))}
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    key = jax.random.PRNGKey(seed)
    for split, indices in splits.items():
        for sub in ("images", "camera_transforms", "depth"):
            (root / sub / split).mkdir(parents=True, exist_ok=True)
        for j, idx in enumerate(indices):
            key, k = jax.random.split(key)
            out = render_image(
                model, params, k, shape, jnp.asarray(intrinsics),
                jnp.asarray(poses[idx]), config,
            )
            rgb = np.asarray(out["rgb"])
            depth = np.asarray(out["depth"])
            gray = np.clip(rgb.mean(-1) * 255.0, 0, 255).astype(np.uint8)
            cv2.imwrite(str(root / "images" / split / f"{j}.png"), gray)
            # store NerfStudio-convention transforms (dataset flips back)
            np.save(root / "camera_transforms" / split / f"{j}.npy",
                    poses[idx] @ flip)
            np.save(root / "depth" / split / f"{j}.npy", depth)
    return root
