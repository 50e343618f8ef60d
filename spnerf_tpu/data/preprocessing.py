"""Host-side image preprocessing shared by datasets."""

from __future__ import annotations

import cv2
import numpy as np


def ratio_preserving_resize(image: np.ndarray, target_size) -> np.ndarray:
    """Scale-to-cover + center-crop (reference COCO.py:67-76).

    image: (H, W) array; target_size: (H_t, W_t).
    """
    th, tw = int(target_size[0]), int(target_size[1])
    h, w = image.shape[:2]
    s = max(th / h, tw / w)
    nh, nw = int(h * s), int(w * s)
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    y0 = (nh - th) // 2
    x0 = (nw - tw) // 2
    return resized[y0 : y0 + th, x0 : x0 + tw]


def adapt_homography_to_ratio_resize(
    homography: np.ndarray,
    image_shape,
    warped_image_shape,
    target_size,
) -> np.ndarray:
    """Conjugate a GT homography by the ratio-preserving resize + crop of
    both images (reference HPatches.py:74-100)."""
    target = np.asarray(target_size, np.float32)
    src = np.asarray(image_shape, np.float32)
    wsrc = np.asarray(warped_image_shape, np.float32)

    s = float(np.max(target / src))
    up_scale = np.diag([1.0 / s, 1.0 / s, 1.0]).astype(np.float32)
    ws = float(np.max(target / wsrc))
    down_scale = np.diag([ws, ws, 1.0]).astype(np.float32)

    pad_y = int((src[0] * s - target[0]) / 2.0)
    pad_x = int((src[1] * s - target[1]) / 2.0)
    translation = np.eye(3, dtype=np.float32)
    translation[0, 2] = pad_x
    translation[1, 2] = pad_y

    wpad_y = int((wsrc[0] * ws - target[0]) / 2.0)
    wpad_x = int((wsrc[1] * ws - target[1]) / 2.0)
    warped_translation = np.eye(3, dtype=np.float32)
    warped_translation[0, 2] = -wpad_x
    warped_translation[1, 2] = -wpad_y

    return (
        warped_translation @ down_scale @ homography.astype(np.float32)
        @ up_scale @ translation
    )
