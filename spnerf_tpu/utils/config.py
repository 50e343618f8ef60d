"""Config loading and merging (reference data_utils/config_update.py:5-25,
engine.py:61-62)."""

from __future__ import annotations

from pathlib import Path

import yaml


def dict_update(base: dict, updates: dict) -> dict:
    """Recursive nested-dict merge; ``updates`` wins. Returns a new dict."""
    out = dict(base)
    for k, v in (updates or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = dict_update(out[k], v)
        else:
            out[k] = v
    return out


def parse_primitives(names, all_primitives):
    """'all' or a validated list of primitive names."""
    if names == "all" or names is None:
        return list(all_primitives)
    if isinstance(names, str):
        names = [names]
    unknown = [n for n in names if n not in all_primitives]
    if unknown:
        raise ValueError(f"Unknown primitives: {unknown}")
    return list(names)


def load_config(path: str | Path) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def set_by_dotted_key(config: dict, dotted: str, value) -> dict:
    """Apply one ``a.b.c=value`` override onto a nested config (new dict).

    The value string is parsed as YAML, so ``--set train.num_iters=500``,
    ``--set model.vgg_cn=[8,8,16,16]`` and ``--set pretrained=null`` all
    produce properly typed values. Counterpart of the reference's
    tyro-generated dotted CLI overrides (engine.py:14-43).
    """
    keys = dotted.split(".")
    update = yaml.safe_load(value) if isinstance(value, str) else value
    if isinstance(update, str):
        # YAML 1.1 won't parse "1e-4" as a float; scientific notation from
        # the command line should still come through numeric
        try:
            update = float(update)
        except ValueError:
            pass
    for k in reversed(keys):
        update = {k: update}
    return dict_update(config, update)


def apply_overrides(config: dict, overrides) -> dict:
    """Apply a list of ``dotted.key=value`` strings onto a config."""
    for item in overrides or ():
        if "=" not in item:
            raise ValueError(
                f"--set expects dotted.key=value, got {item!r}"
            )
        dotted, value = item.split("=", 1)
        config = set_by_dotted_key(config, dotted.strip(), value)
    return config
