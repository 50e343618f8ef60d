"""On-device batch preparation: heatmaps, homographic augmentation, pairs.

The reference builds warped pairs, keypoint heatmaps and valid masks
per-sample on CPU inside ``Dataset.__getitem__`` (COCO.py:109-134,
Synthetic_dataset.py:170-200). Here the host ships only (image, padded
keypoints) and everything geometric happens batched on device inside
the jitted train step — warps ride the VPU/MXU and nothing blocks the
input pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spnerf_tpu.geometry.homography import (
    HomographyConfig,
    sample_homography,
    warp_points,
)
from spnerf_tpu.geometry.keypoints import compute_keypoint_map, filter_points_mask
from spnerf_tpu.geometry.reprojection import warp_points_nerf
from spnerf_tpu.ops.image_warp import (
    compute_valid_mask,
    warp_image,
    warp_image_matmul,
)


def make_heatmaps(kpts: jnp.ndarray, kpts_mask: jnp.ndarray, shape) -> jnp.ndarray:
    """(B, N, 2) padded points + (B, N) mask -> (B, H, W) binary maps."""
    return jax.vmap(lambda p, m: compute_keypoint_map(p, shape, m))(
        kpts, kpts_mask
    )


def homographic_augment(
    key: jax.Array,
    images: jnp.ndarray,
    kpts: jnp.ndarray,
    kpts_mask: jnp.ndarray,
    config: HomographyConfig,
    erosion: int = 0,
):
    """Batched homographic augmentation (reference Homographic_aug.__call__,
    homographic_augmentation.py:128-150), fully on device.

    Returns dict with warped image/kpts/heatmap/valid_mask + homography.
    """
    B, H, W, _ = images.shape
    keys = jax.random.split(key, B)
    homographies = jax.vmap(lambda k: sample_homography(k, (H, W), config))(keys)

    if images.shape[-1] == 1:
        warped_images = warp_image_matmul(images, homographies)
    else:
        warped_images = warp_image(images, homographies, mode="bilinear")

    # warp_points broadcasts: kpts (B, N, 2) with (B, 3, 3) -> (B, N, 2)
    warped_kpts = warp_points(kpts, homographies)
    in_bounds = filter_points_mask(warped_kpts, (H, W))
    warped_mask = kpts_mask & in_bounds

    heatmap = make_heatmaps(warped_kpts, warped_mask, (H, W))

    valid = compute_valid_mask((H, W), homographies, erosion)

    return {
        "image": warped_images,
        "kpts": warped_kpts,
        "kpts_mask": warped_mask,
        "kpts_heatmap": heatmap,
        "valid_mask": valid,
        "homography": homographies,
    }


def prepare_detector_batch(
    key: jax.Array,
    batch: dict,
    aug_config: HomographyConfig | None,
    erosion: int = 0,
):
    """MagicPoint-style batch: heatmap labels (+ optional homographic
    self-augmentation, which REPLACES the raw view like the reference
    Synthetic_dataset.py:191-200 / COCO.py:124-134).

    batch: {"image": (B,H,W,1), "kpts": (B,N,2), "kpts_mask": (B,N)}.
    Returns {"image", "kpts_heatmap", "valid_mask"}.
    """
    B, H, W, _ = batch["image"].shape
    if aug_config is None:
        heatmap = make_heatmaps(batch["kpts"], batch["kpts_mask"], (H, W))
        return {
            "image": batch["image"],
            "kpts_heatmap": heatmap,
            "valid_mask": jnp.ones((B, H, W), jnp.int32),
        }
    warp = homographic_augment(
        key, batch["image"], batch["kpts"], batch["kpts_mask"], aug_config, erosion
    )
    return {
        "image": warp["image"],
        "kpts_heatmap": warp["kpts_heatmap"],
        "valid_mask": warp["valid_mask"],
    }


def prepare_superpoint_batch(
    key: jax.Array,
    batch: dict,
    pair_config: HomographyConfig,
    erosion: int = 0,
):
    """SuperPoint-style batch: raw view + warped pair + pair homography
    (reference COCO.py:109-120). Returns dict with "raw", "warp",
    "homography"."""
    B, H, W, _ = batch["image"].shape
    raw_heatmap = make_heatmaps(batch["kpts"], batch["kpts_mask"], (H, W))
    # the warped view may come from an independently photometric-augmented
    # copy of the image (see data/coco.py)
    warp_src = batch.get("image_warp_src", batch["image"])
    warp = homographic_augment(
        key, warp_src, batch["kpts"], batch["kpts_mask"], pair_config, erosion
    )
    return {
        "raw": {
            "image": batch["image"],
            "kpts_heatmap": raw_heatmap,
            "valid_mask": jnp.ones((B, H, W), jnp.int32),
        },
        "warp": {
            "image": warp["image"],
            "kpts_heatmap": warp["kpts_heatmap"],
            "valid_mask": warp["valid_mask"],
        },
        "homography": warp["homography"],
    }


def prepare_nerf_batch(batch: dict):
    """NeRF warped-pair batch: GT keypoints of the warped view come from
    true 3D reprojection through rendered depth (reference
    NeRF_dataset.py:217-229), computed batched on device instead of the
    reference's per-point CPU loop.

    batch (host): {"image", "image_warp", "depth", "rotation",
    "translation", "rotation_warp", "translation_warp", "intrinsics",
    "kpts", "kpts_mask"}.

    Returns the pair structure consumed by ``superpoint_loss_fn`` with
    nerf_desc=True.
    """
    B, H, W, _ = batch["image"].shape
    raw_heatmap = make_heatmaps(batch["kpts"], batch["kpts_mask"], (H, W))

    # reproject each sample's keypoints into its warped frame
    def warp_one(kpts, depth, K, R, t, Rw, tw):
        return warp_points_nerf(
            kpts, depth[None], K[None], R[None], t[None], Rw[None], tw[None]
        )[0]

    warped_kpts = jax.vmap(warp_one)(
        batch["kpts"], batch["depth"], batch["intrinsics"],
        batch["rotation"], batch["translation"],
        batch["rotation_warp"], batch["translation_warp"],
    )
    warped_mask = batch["kpts_mask"] & filter_points_mask(warped_kpts, (H, W))
    warp_heatmap = make_heatmaps(warped_kpts, warped_mask, (H, W))

    ones = jnp.ones((B, H, W), jnp.int32)
    return {
        "raw": {
            "image": batch["image"],
            "kpts_heatmap": raw_heatmap,
            "valid_mask": ones,
            "depth": batch["depth"],
            "rotation": batch["rotation"],
            "translation": batch["translation"],
        },
        "warp": {
            "image": batch["image_warp"],
            "kpts_heatmap": warp_heatmap,
            "valid_mask": ones,
            "rotation": batch["rotation_warp"],
            "translation": batch["translation_warp"],
        },
        "intrinsics": batch["intrinsics"],
    }
