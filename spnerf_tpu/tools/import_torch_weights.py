"""PyTorch-reference checkpoint -> flax variables bridge.

The reference ships/produces torch state dicts with the layout
(reference models/model_utils/VGG_Backbone.py:40-58, heads.py:11-15,55,
SuperPoint.py:9-15):

    backbone.block_{1..8}.conv2d.{weight,bias}
    backbone.block_{1..8}.norm.{weight,bias,running_mean,running_var}
    detector_head.conv{Pa,Pb}.{conv2d,norm}.*
    descriptor_head.conv{Da,Db}.{conv2d,norm}.*

and loads them by *partial merge* — only keys present in the target
model are copied (engine.py:86-90), which is how MagicPoint weights
seed a SuperPoint model. This module maps that layout onto the flax
SuperPoint (models/superpoint.py) so reference-trained weights run in
this framework and HPatches parity can be measured directly:

    torch conv weight (O, I, kh, kw)  ->  flax kernel (kh, kw, I, O)
    norm.weight/bias                  ->  BatchNorm_0 scale/bias
    norm.running_mean/var             ->  batch_stats mean/var

Usage (CLI):
    python -m spnerf_tpu.tools.import_torch_weights model.pth out.ckpt \
        [--model-name superpoint]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

# torch module path -> (flax collection path in params / batch_stats)
_BLOCKS = (
    [(f"backbone.block_{i}", ("backbone", f"block{i}")) for i in range(1, 9)]
    + [
        ("detector_head.convPa", ("detector", "convPa")),
        ("detector_head.convPb", ("detector", "convPb")),
        ("descriptor_head.convDa", ("descriptor", "convDa")),
        ("descriptor_head.convDb", ("descriptor", "convDb")),
    ]
)


def torch_state_dict_to_flax(state_dict) -> dict:
    """Map a reference-layout torch state dict (tensors or ndarrays) to
    flax {'params', 'batch_stats'}; absent blocks are skipped (partial
    dicts — e.g. MagicPoint without a descriptor head — stay partial)."""

    def arr(key):
        v = state_dict.get(key)
        if v is None:
            return None
        if hasattr(v, "detach"):  # torch tensor without importing torch
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    params: dict = {}
    stats: dict = {}
    for torch_prefix, flax_path in _BLOCKS:
        w = arr(f"{torch_prefix}.conv2d.weight")
        if w is None:
            continue
        head, leaf = flax_path
        block_p = {"Conv_0": {"kernel": w.transpose(2, 3, 1, 0)}}
        b = arr(f"{torch_prefix}.conv2d.bias")
        if b is not None:
            block_p["Conv_0"]["bias"] = b
        gamma = arr(f"{torch_prefix}.norm.weight")
        if gamma is not None:
            block_p["BatchNorm_0"] = {
                "scale": gamma,
                "bias": arr(f"{torch_prefix}.norm.bias"),
            }
            stats.setdefault(head, {})[leaf] = {
                "BatchNorm_0": {
                    "mean": arr(f"{torch_prefix}.norm.running_mean"),
                    "var": arr(f"{torch_prefix}.norm.running_var"),
                }
            }
        params.setdefault(head, {})[leaf] = block_p
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str | Path) -> dict:
    """Load a .pth checkpoint (handles the reference's
    {'iteration', 'model_state_dict'} wrapper, train.py:137-139) and
    return flax variables."""
    import torch

    payload = torch.load(str(path), map_location="cpu", weights_only=True)
    state_dict = payload.get("model_state_dict", payload) \
        if isinstance(payload, dict) else payload
    return torch_state_dict_to_flax(state_dict)


def import_into(variables: dict, torch_variables: dict) -> dict:
    """Partial-merge converted torch weights into existing flax
    variables (engine.py:86-90 semantics: path+shape matches only)."""
    from spnerf_tpu.train.loop import partial_restore

    out = dict(variables)
    out["params"] = partial_restore(variables["params"],
                                    torch_variables["params"])
    if "batch_stats" in variables:
        out["batch_stats"] = partial_restore(
            variables["batch_stats"], torch_variables["batch_stats"])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("torch_ckpt", help=".pth file in reference layout")
    ap.add_argument("out", help="output .ckpt (framework msgpack format)")
    ap.add_argument("--model-name", default="superpoint",
                    choices=["superpoint", "magicpoint"])
    args = ap.parse_args(argv)

    import jax
    from flax import serialization

    from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint

    torch_vars = load_torch_checkpoint(args.torch_ckpt)
    cfg = SuperPointConfig(model_name=args.model_name)
    _, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, 64, 64, 1))
    merged = import_into(variables, torch_vars)
    payload = {
        "iteration": np.asarray(0),
        "params": serialization.to_state_dict(jax.device_get(merged["params"])),
        "batch_stats": serialization.to_state_dict(
            jax.device_get(merged["batch_stats"])),
    }
    payload = jax.tree.map(np.asarray, payload)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_bytes(serialization.msgpack_serialize(payload))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
