"""Task dispatcher CLI — the public entry point.

Mirrors the reference engine (engine.py:14-208):

    python -m spnerf_tpu.cli --config-path cfg.yaml --task train \
        [--validate-training] [--no-include-mask-loss] [--nerf-loss] \
        [--train-nerf] [--no-enable-homography-adaptation] [--split training]

Tasks: train, export_pseudo_labels, export_NeRF_labels,
export_HPatches_Repeatability, export_HPatches_Descriptors.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from spnerf_tpu.settings import CKPT_PATH
from spnerf_tpu.utils.config import apply_overrides, load_config

TASKS = (
    "train",
    "export_pseudo_labels",
    "export_NeRF_labels",
    "export_HPatches_Repeatability",
    "export_HPatches_Descriptors",
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-path", required=True)
    p.add_argument("--task", required=True, choices=TASKS)
    # training options (reference engine.py:14-27)
    p.add_argument("--validate-training", action="store_true", default=False)
    p.add_argument("--include-mask-loss", dest="include_mask_loss",
                   action="store_true", default=True)
    p.add_argument("--no-include-mask-loss", dest="include_mask_loss",
                   action="store_false")
    p.add_argument("--nerf-loss", action="store_true", default=False)
    p.add_argument("--train-nerf", action="store_true", default=False)
    # export options (reference engine.py:30-39)
    p.add_argument("--enable-homography-adaptation", dest="enable_ha",
                   action="store_true", default=True)
    p.add_argument("--no-enable-homography-adaptation", dest="enable_ha",
                   action="store_false")
    p.add_argument("--split", default="training",
                   choices=("training", "validation", "test"))
    p.add_argument("--seed", type=int, default=0)
    # dotted-key config overrides, reference tyro ergonomics (engine.py:14-43):
    #   --set train.learning_rate=1e-4 --set model.detector_head.nms=8
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="override a config key by dotted path; value parsed "
                        "as YAML; repeatable")
    return p


def _load_model_for_inference(config, input_shape):
    from spnerf_tpu.tasks.train_task import restore_pretrained
    from spnerf_tpu.utils.factories import get_model

    model, variables = get_model(
        config["model"], jax.random.PRNGKey(0), input_shape
    )
    variables, _ = restore_pretrained(config, variables)
    return model, variables


def main(argv=None):
    from spnerf_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    args = build_parser().parse_args(argv)
    config = apply_overrides(load_config(args.config_path), args.overrides)

    if args.task == "train":
        from spnerf_tpu.tasks.train_task import train

        return train(
            config,
            validate_training=args.validate_training,
            include_mask_loss=args.include_mask_loss,
            nerf_loss=args.nerf_loss,
            train_nerf=args.train_nerf,
            seed=args.seed,
        )

    resize = config["data"].get("preprocessing", {}).get("resize", (240, 320))
    input_shape = (1, int(resize[0]), int(resize[1]), 1)
    model, variables = _load_model_for_inference(config, input_shape)

    if args.task == "export_pseudo_labels":
        from spnerf_tpu.data.loader import DataLoader
        from spnerf_tpu.tasks.export import export_pseudo_labels
        from spnerf_tpu.utils.factories import get_dataset

        ds = get_dataset(config["data"], args.split)
        loader = DataLoader(ds, batch_size=config["data"].get("batch_size", 1),
                            shuffle=False, drop_last=False)
        return export_pseudo_labels(
            config, model, variables, loader,
            split=args.split, enable_ha=args.enable_ha, seed=args.seed,
        )

    if args.task in ("export_HPatches_Repeatability", "export_HPatches_Descriptors"):
        from spnerf_tpu.data.hpatches import HPatches
        from spnerf_tpu.data.loader import DataLoader
        from spnerf_tpu.tasks.export import export_hpatches

        ds = HPatches(config["data"])
        loader = DataLoader(ds, batch_size=config["data"].get("batch_size", 1),
                            shuffle=False, drop_last=False)
        return export_hpatches(
            config, model, variables, loader,
            with_descriptors=(args.task == "export_HPatches_Descriptors"),
        )

    if args.task == "export_NeRF_labels":
        from spnerf_tpu.tasks.export_nerf import export_nerf_labels

        return export_nerf_labels(config, model, variables, seed=args.seed)

    raise ValueError(f"Unhandled task {args.task}")


if __name__ == "__main__":
    main()
