"""NeRF-rendered multi-view dataset (reference data/NeRF_dataset.py:13-314).

Scene layout on disk (produced by tasks/nerf_task.py ``render_dataset``
or by any NerfStudio-compatible exporter):

    DATA_PATH/NeRF/<scene>/images/<split>/<i>.png
    DATA_PATH/NeRF/<scene>/camera_transforms/<split>/<i>.npy   (4x4 c2w)
    DATA_PATH/NeRF/<scene>/depth/<split>/<i>.npy               (H, W) along-ray

Host side loads the frame pair + geometry; the warped view's GT
keypoints (3D reprojection through depth) are computed ON DEVICE in
``train/pipeline.prepare_nerf_batch`` — the reference does this
per-sample on CPU with a Python double loop (kp_utils.py:86-108).

Pair selection: a frame 7-15%% of the sequence length away, either side
(reference NeRF_dataset.py:106-135).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from spnerf_tpu.data.photometric import PhotometricAug
from spnerf_tpu.data.rng import ThreadLocalRNG, stable_seed
from spnerf_tpu.settings import DATA_PATH, EXPER_PATH

MAX_KPTS = 1024


def camera_intrinsics(shape, fov_degrees: float) -> np.ndarray:
    H, W = shape
    c_x, c_y = W // 2, H // 2
    f = c_y / np.tan(np.deg2rad(fov_degrees) / 2.0)
    return np.array([[f, 0, c_x], [0, f, c_y], [0, 0, 1]], np.float32)


def axis_transform(cam_matrix: np.ndarray) -> np.ndarray:
    """NerfStudio -> OpenCV axis flip (reference NeRF_dataset.py:86-93)."""
    return cam_matrix @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(cam_matrix.dtype)


class NeRFDataset:
    def __init__(self, data_config: dict, task: str = "training"):
        self.config = data_config
        self.split = (
            "training" if task == "training"
            else "validation" if task == "validation"
            else "test"
        )
        self.samples = self._init_dataset()
        photo = self.config.get("augmentation", {}).get("photometric", {})
        self.photometric = (
            PhotometricAug(photo)
            if photo.get("enable") and not photo.get("on_device")
            else None
        )
        self.warped_pair = bool(self.config.get("warped_pair"))
        self._rng = ThreadLocalRNG(stable_seed("nerf", self.split))

    def _init_dataset(self):
        scene = Path(DATA_PATH, self.config.get("name", "NeRF"),
                     self.config["data_dir"])
        img_dir = scene / "images" / self.split
        cam_dir = scene / "camera_transforms" / self.split
        depth_dir = scene / "depth" / self.split
        image_paths = sorted(img_dir.glob("*"), key=lambda p: p.stem) if img_dir.exists() else []
        names = [p.stem for p in image_paths]
        files = {
            "image_paths": [str(p) for p in image_paths],
            "names": names,
            "camera_transform_paths": [str(cam_dir / f"{n}.npy") for n in names],
            "depth_paths": [str(depth_dir / f"{n}.npy") for n in names],
        }
        if self.config.get("has_labels"):
            label_dir = Path(EXPER_PATH, self.config["has_labels"], self.split)
            files["label_paths"] = [str(label_dir / f"{n}.npy") for n in names]
        return files

    def __len__(self):
        return len(self.samples["image_paths"])

    def _random_partner(self, index: int) -> int:
        """Frame 7-15%% of the sequence away (reference :106-135)."""
        n = len(self)
        lo, hi = max(1, int(0.07 * n)), max(2, int(0.15 * n))
        offsets = np.arange(lo, hi)
        candidates = []
        for off in offsets:
            if index - off >= 0:
                candidates.append(index - off)
            if index + off < n:
                candidates.append(index + off)
        if not candidates:
            candidates = [i for i in range(n) if i != index] or [index]
        return int(self._rng.get().choice(candidates))

    def _load_frame(self, index: int):
        img = cv2.imread(self.samples["image_paths"][index], cv2.IMREAD_GRAYSCALE)
        T = axis_transform(np.load(self.samples["camera_transform_paths"][index]))
        R = T[:3, :3].astype(np.float32)
        t = T[:3, 3:4].astype(np.float32)
        return img.astype(np.float32), R, t

    def __getitem__(self, index: int) -> dict:
        img, R, t = self._load_frame(index)
        depth = np.load(self.samples["depth_paths"][index]).astype(np.float32)
        H, W = img.shape
        K = camera_intrinsics((H, W), self.config.get("fov", 60.0))

        out = {
            "name": self.samples["names"][index],
            "depth": depth,
            "rotation": R,
            "translation": t,
            "intrinsics": K,
        }

        if "label_paths" in self.samples:
            points = np.load(self.samples["label_paths"][index]).reshape(-1, 2)
            kpts = np.zeros((MAX_KPTS, 2), np.float32)
            mask = np.zeros((MAX_KPTS,), bool)
            n = min(len(points), MAX_KPTS)
            kpts[:n] = points[:n]
            mask[:n] = True
            out["kpts"] = kpts
            out["kpts_mask"] = mask

        aug = self.photometric is not None and self.split == "training"
        raw = self.photometric(img, self._rng.get()) if aug else img

        if self.warped_pair:
            j = self._random_partner(index)
            wimg, Rw, tw = self._load_frame(j)
            if aug:
                wimg = self.photometric(wimg, self._rng.get())
            out["image_warp"] = (wimg / 255.0)[..., None].astype(np.float32)
            out["rotation_warp"] = Rw
            out["translation_warp"] = tw
            out["warped_name"] = self.samples["names"][j]

        # random-crop downsample of all aligned tensors
        # (reference NeRF_dataset.py:138-160); intrinsics recomputed from
        # the crop size like the reference
        ds = self.config.get("downsample")
        if ds and self.split == "training":
            dh, dw = self.config["downsample_size"]
            i0 = int(self._rng.get().integers(0, max(H - dh, 0) + 1))
            j0 = int(self._rng.get().integers(0, max(W - dw, 0) + 1))
            raw = raw[i0 : i0 + dh, j0 : j0 + dw]
            out["depth"] = out["depth"][i0 : i0 + dh, j0 : j0 + dw]
            if "image_warp" in out:
                out["image_warp"] = out["image_warp"][i0 : i0 + dh, j0 : j0 + dw]
            if "kpts" in out:
                shifted = out["kpts"] - np.array([i0, j0], np.float32)
                inside = (
                    (shifted[:, 0] >= 0) & (shifted[:, 0] < dh)
                    & (shifted[:, 1] >= 0) & (shifted[:, 1] < dw)
                )
                out["kpts"] = np.where(inside[:, None], shifted, 0.0).astype(np.float32)
                out["kpts_mask"] = out["kpts_mask"] & inside
            out["intrinsics"] = camera_intrinsics(
                (dh, dw), self.config.get("fov", 60.0)
            )

        out["image"] = (raw / 255.0)[..., None].astype(np.float32)
        return out
