"""Config merge + dotted-key CLI overrides (reference engine.py:14-43)."""

import pytest

from spnerf_tpu.utils.config import (
    apply_overrides,
    dict_update,
    set_by_dotted_key,
)


def test_dict_update_nested():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    out = dict_update(base, {"a": {"b": 10}})
    assert out == {"a": {"b": 10, "c": 2}, "d": 3}
    assert base["a"]["b"] == 1  # non-mutating


def test_dotted_override_types():
    cfg = {"train": {"learning_rate": 0.001, "num_iters": 100}}
    cfg = set_by_dotted_key(cfg, "train.learning_rate", "1e-4")
    assert cfg["train"]["learning_rate"] == pytest.approx(1e-4)
    cfg = set_by_dotted_key(cfg, "train.num_iters", "500")
    assert cfg["train"]["num_iters"] == 500
    cfg = set_by_dotted_key(cfg, "model.vgg_cn", "[8, 8, 16]")
    assert cfg["model"]["vgg_cn"] == [8, 8, 16]
    cfg = set_by_dotted_key(cfg, "pretrained", "null")
    assert cfg["pretrained"] is None
    cfg = set_by_dotted_key(cfg, "data.name", "coco")
    assert cfg["data"]["name"] == "coco"


def test_apply_overrides_list():
    cfg = apply_overrides(
        {"train": {"lr": 1.0}},
        ["train.lr=0.5", "train.pallas_desc_loss=true"],
    )
    assert cfg["train"]["lr"] == 0.5
    assert cfg["train"]["pallas_desc_loss"] is True


def test_apply_overrides_rejects_missing_equals():
    with pytest.raises(ValueError):
        apply_overrides({}, ["train.lr"])


def test_cli_parser_accepts_set():
    from spnerf_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["--config-path", "x.yaml", "--task", "train",
         "--set", "train.lr=2", "--set", "a.b=c"]
    )
    assert args.overrides == ["train.lr=2", "a.b=c"]
