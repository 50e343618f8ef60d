"""COCO dataset: images + optional exported pseudo-labels.

Counterpart of reference data/COCO.py:14-184. Host side only reads,
resizes and photometric-augments; keypoint heatmaps, valid masks and
the warped pair are built on device (train/pipeline.py).

Three modes, like the reference:
- export (has_labels=False): {"image", "name"} for pseudo-label export;
- MagicPoint train (has_labels, warped_pair=False): photometric +
  (on-device) homographic self-augmentation;
- SuperPoint train (warped_pair=True): ships a second, independently
  photometric-augmented copy of the image ("image_warp_src") that the
  device warps into the pair — preserving the reference's independent
  photometric draws for raw and warped views (COCO.py:109-134).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from spnerf_tpu.data.photometric import PhotometricAug
from spnerf_tpu.data.rng import ThreadLocalRNG, stable_seed
from spnerf_tpu.data.preprocessing import ratio_preserving_resize
from spnerf_tpu.settings import DATA_PATH, EXPER_PATH

MAX_KPTS = 1024


class COCO:
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
        self._rng = ThreadLocalRNG(stable_seed("coco", self.split))

    def _init_dataset(self):
        data_dir = Path(DATA_PATH, self.config.get("name", "COCO"), "images", self.split)
        image_paths = sorted(data_dir.iterdir()) if data_dir.exists() else []
        truncate = self.config.get("truncate")
        if truncate:
            image_paths = image_paths[: int(truncate * len(image_paths))]
        # multi-process export sharding: "auto" -> this jax process's
        # contiguous block, or an explicit [k, n]. Contiguous blocks
        # (not strides) keep every image's GLOBAL dataset index — and
        # therefore its fold_in(seed, index) warp keys — identical to
        # the unsharded enumeration, so the merged multi-process
        # artifact set is bit-identical to a single-process export.
        # ``shard_offset`` is the block's global start index; consumers
        # (tasks/export.py) seed their image cursor from it.
        self.shard_offset = 0
        shard = self.config.get("shard")
        if shard:
            if shard == "auto":
                import jax

                k, n = jax.process_index(), jax.process_count()
            else:
                k, n = int(shard[0]), int(shard[1])
            if not 0 <= k < n:
                raise ValueError(f"bad shard {shard}")
            starts = [round(i * len(image_paths) / n) for i in range(n + 1)]
            self.shard_offset = starts[k]
            image_paths = image_paths[starts[k]:starts[k + 1]]
        names = [p.stem for p in image_paths]
        files = {"image_paths": [str(p) for p in image_paths], "names": names}
        if self.config.get("has_labels"):
            label_dir = Path(EXPER_PATH, self.config["has_labels"], self.split)
            files["label_paths"] = [str(label_dir / f"{n}.npy") for n in names]
        return files

    def __len__(self):
        return len(self.samples["image_paths"])

    def __getitem__(self, idx: int) -> dict:
        img = cv2.imread(self.samples["image_paths"][idx], cv2.IMREAD_GRAYSCALE)
        img = ratio_preserving_resize(
            img, self.config["preprocessing"]["resize"]
        ).astype(np.float32)

        out = {"name": self.samples["names"][idx]}

        if "label_paths" in self.samples:
            points = np.load(self.samples["label_paths"][idx]).reshape(-1, 2)
            kpts = np.zeros((MAX_KPTS, 2), np.float32)
            mask = np.zeros((MAX_KPTS,), bool)
            n = min(len(points), MAX_KPTS)
            kpts[:n] = points[:n]
            mask[:n] = True
            out["kpts"] = kpts
            out["kpts_mask"] = mask

        aug = self.photometric is not None and self.split == "training"
        raw = self.photometric(img, self._rng.get()) if aug else img
        out["image"] = (raw / 255.0)[..., None].astype(np.float32)

        if self.warped_pair and aug:
            # independent photometric draw for the to-be-warped view.
            # Without host augmentation this would be a byte-identical
            # copy of "image" (prepare_superpoint_batch falls back to
            # it), so it is only shipped when it actually differs —
            # on-device photometric mode draws its own pair on chip.
            warp_src = self.photometric(img, self._rng.get())
            out["image_warp_src"] = (warp_src / 255.0)[..., None].astype(np.float32)

        return out
