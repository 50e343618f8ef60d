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
