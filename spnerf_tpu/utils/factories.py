"""Config-string-driven model / dataset factories.

Counterpart of the reference's importlib reflection (utils/get_model.py:
4-11, utils/data_loaders.py:4-102), with an explicit registry instead of
module-path reflection.
"""

from __future__ import annotations

from pathlib import Path

from spnerf_tpu.data.loader import DataLoader
from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
from spnerf_tpu.settings import DATA_PATH


def get_model(model_config: dict, key, input_shape=(1, 120, 160, 1)):
    """Build (model, variables) from a config dict (reference
    get_model.py:4-11)."""
    name = model_config.get("class_name", "SuperPoint")
    if name != "SuperPoint":
        raise ValueError(f"Unknown model class: {name}")
    cfg = SuperPointConfig.from_dict(model_config)
    return init_superpoint(key, cfg, input_shape)


def get_dataset(data_config: dict, task: str = "training"):
    name = data_config.get("class_name", data_config.get("name"))
    if name == "SyntheticShapes":
        from spnerf_tpu.data.synthetic_shapes import SyntheticShapes

        return SyntheticShapes(data_config, task)
    if name == "COCO":
        from spnerf_tpu.data.coco import COCO

        return COCO(data_config, task)
    if name == "NeRF":
        from spnerf_tpu.data.nerf_dataset import NeRFDataset

        return NeRFDataset(data_config, task)
    if name == "HPatches":
        from spnerf_tpu.data.hpatches import HPatches

        return HPatches(data_config)
    raise ValueError(f"Unknown dataset class: {name}")


def get_loaders(config: dict, task: str, nerf_train: bool = False):
    """Build train/val loaders (reference data_loaders.py:4-102).

    For ``nerf_train`` builds one loader per scene directory listed in
    ``data.all_data_dirs`` (reference data_loaders.py:37-69).
    """
    data_cfg = dict(config["data"])
    batch_size = data_cfg.get("batch_size", 1)

    num_workers = data_cfg.get("num_workers", 0)

    def mk(ds, split):
        return DataLoader(
            ds,
            batch_size=batch_size,
            shuffle=(split == "training"),
            drop_last=(split == "training"),
            num_workers=num_workers,
        )

    if nerf_train:
        loaders = {"train": [], "validation": []}
        all_dirs = data_cfg.get("all_data_dirs") or []
        all_labels = data_cfg.get("all_label_dirs") or [None] * len(all_dirs)
        for d, l in zip(all_dirs, all_labels):
            scene_cfg = dict(data_cfg)
            scene_cfg["data_dir"] = d
            if l is not None:
                scene_cfg["has_labels"] = l
            loaders["train"].append(mk(get_dataset(scene_cfg, "training"), "training"))
            loaders["validation"].append(
                mk(get_dataset(scene_cfg, "validation"), "validation")
            )
        return loaders

    if task in ("train", "training"):
        return {
            "train": mk(get_dataset(data_cfg, "training"), "training"),
            "validation": mk(get_dataset(data_cfg, "validation"), "validation"),
        }
    return {task: mk(get_dataset(data_cfg, task), task)}
