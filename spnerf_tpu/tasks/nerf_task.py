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


@partial(jax.jit,
         static_argnames=("model", "tx", "config_static", "ray_batch",
                          "n_steps"),
         donate_argnames=("params", "opt_state"))
def nerf_train_scan(model, params, opt_state, tx, key, it0, all_o, all_d,
                    all_rgb, config_static, ray_batch, n_steps):
    """``n_steps`` training steps in ONE dispatch, sampling ray batches
    ON DEVICE from the resident ray pool.

    The tunneled chip charges a ~55 ms floor per host->device transfer
    (docs/PERF.md), so the per-iteration host-sampled batches of
    ``nerf_train_step`` dominate wall-clock; keeping the whole ray pool
    on device (a 240x320x46-view scene is ~130 MB) and scanning steps
    removes both the transfers and the per-step dispatch."""
    n_rays = all_o.shape[0]

    def body(carry, i):
        params, opt_state = carry
        k = jax.random.fold_in(key, it0 + i)
        k_idx, k_step = jax.random.split(k)
        idx = jax.random.randint(k_idx, (ray_batch,), 0, n_rays)
        o, d, rgb_t = all_o[idx], all_d[idx], all_rgb[idx]

        def loss_fn(p):
            out = render_rays(model, p, k_step, o, d, config_static)
            loss_c = jnp.mean((out["rgb_coarse"] - rgb_t) ** 2)
            loss_f = jnp.mean((out["rgb"] - rgb_t) ** 2)
            return loss_c + loss_f, (loss_c, loss_f)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_opt), loss

    (params, opt_state), losses = jax.lax.scan(
        body, (params, opt_state), jnp.arange(n_steps))
    return params, opt_state, losses


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

    # precompute all rays ONCE, resident on device: (N*H*W, 3) each —
    # the scan step then samples batches without any per-iter transfer
    all_o, all_d, all_rgb = [], [], []
    for i in range(N):
        o, d = camera_rays((H, W), jnp.asarray(intrinsics),
                           jnp.asarray(cam_to_worlds[i]))
        all_o.append(np.asarray(o))
        all_d.append(np.asarray(d))
        all_rgb.append(images[i].reshape(-1, 3))
    all_o = jnp.asarray(np.concatenate(all_o))
    all_d = jnp.asarray(np.concatenate(all_d))
    all_rgb = jnp.asarray(np.concatenate(all_rgb).astype(np.float32))

    key = jax.random.PRNGKey(seed + 1)
    history = []
    # chunk so there are at most two compiled step programs (full chunk
    # + one remainder) and log_every boundaries stay observable
    chunk = min(log_every, 100)
    it = 0
    while it < num_iters:
        n_steps = min(chunk, num_iters - it)
        params, opt_state, losses = nerf_train_scan(
            model, params, opt_state, tx, key, it,
            all_o, all_d, all_rgb, config, ray_batch, n_steps,
        )
        if (it + n_steps) % log_every == 0 or it + n_steps == num_iters:
            history.append(float(losses[-1]))
        it += n_steps
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
