"""Training loop: jitted data-parallel steps, Adam, checkpointing.

Counterpart of reference engine_solvers/train.py:12-221, redesigned:

- the whole step (on-device augmentation + both forwards + losses +
  backward + Adam update + BN stat update) is ONE jitted program;
- data parallel over a ``jax.sharding.Mesh`` (reference: single GPU);
- checkpoints include optimizer state (reference loses it,
  SURVEY §5 "checkpoint/resume") while keeping the reference's
  partial-merge restore semantics that seed SuperPoint from MagicPoint
  weights (engine.py:86-90).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization
from flax.core import unfreeze

from spnerf_tpu.geometry.homography import HomographyConfig
from spnerf_tpu.models.superpoint import SuperPoint, SuperPointConfig
from spnerf_tpu.ops.photometric_device import (
    PhotometricDeviceConfig,
    photometric_augment,
)
from spnerf_tpu.settings import CKPT_PATH
from spnerf_tpu.train.losses import (
    DescriptorLossConfig,
    descriptor_loss,
    descriptor_loss_nerf,
    detector_loss,
)
from spnerf_tpu.train.metrics import precision_recall
from spnerf_tpu.train.pipeline import (
    prepare_detector_batch,
    prepare_nerf_batch,
    prepare_superpoint_batch,
)


def _prepare_pair(batch, key, cfg):
    if cfg.nerf_desc and "depth" in batch:
        return prepare_nerf_batch(batch)
    if cfg.aug is not None and "kpts" in batch:
        return prepare_superpoint_batch(key, batch, cfg.aug, cfg.erosion)
    return batch


@dataclasses.dataclass
class TrainState:
    """Model + optimizer state as a simple pytree."""

    params: Any
    batch_stats: Any
    opt_state: Any
    iteration: jnp.ndarray  # scalar int32

    def tree_flatten(self):
        return (self.params, self.batch_stats, self.opt_state, self.iteration), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: s.tree_flatten(),
    TrainState.tree_unflatten,
)


def create_train_state(variables, learning_rate: float) -> tuple[TrainState, Any]:
    tx = optax.adam(learning_rate)
    # copy: train_step donates the state's buffers, and the caller's
    # ``variables`` must not be invalidated by that donation
    params = jax.tree.map(jnp.array, variables["params"])
    batch_stats = jax.tree.map(jnp.array, variables["batch_stats"])
    return (
        TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            iteration=jnp.zeros((), jnp.int32),
        ),
        tx,
    )


# --------------------------------------------------------------------- steps


def magicpoint_loss_fn(
    params, batch_stats, model: SuperPoint, data: dict, key, grid_size: int,
    include_mask: bool, train: bool = True,
):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, updates = model.apply(
            variables, data["image"], train=True, mutable=["batch_stats"]
        )
        new_bs = updates["batch_stats"]
    else:
        out = model.apply(variables, data["image"], train=False)
        new_bs = batch_stats
    loss = detector_loss(
        key,
        out["logits"],
        data["kpts_heatmap"],
        data["valid_mask"] if include_mask else None,
        grid_size,
    )
    return loss, (new_bs, {"detector_loss": loss})


def superpoint_loss_fn(
    params, batch_stats, model: SuperPoint, data: dict, key,
    grid_size: int, include_mask: bool, desc_cfg: DescriptorLossConfig,
    nerf_desc: bool = False, train: bool = True, pallas_desc: bool = False,
):
    k1, k2 = jax.random.split(key)

    def fwd(image, bs):
        if train:
            out, upd = model.apply(
                {"params": params, "batch_stats": bs}, image, train=True,
                mutable=["batch_stats"],
            )
            return out, upd["batch_stats"]
        return model.apply({"params": params, "batch_stats": bs}, image,
                           train=False), bs

    out, bs1 = fwd(data["raw"]["image"], batch_stats)
    warped_out, bs2 = fwd(data["warp"]["image"], bs1)

    det = detector_loss(
        k1, out["logits"], data["raw"]["kpts_heatmap"],
        data["raw"]["valid_mask"] if include_mask else None, grid_size,
    )
    det_warped = detector_loss(
        k2, warped_out["logits"], data["warp"]["kpts_heatmap"],
        data["warp"]["valid_mask"] if include_mask else None, grid_size,
    )
    wmask = data["warp"]["valid_mask"] if include_mask else None
    if pallas_desc:
        from spnerf_tpu.geometry.homography import warp_points
        from spnerf_tpu.geometry.reprojection import warp_points_nerf
        from spnerf_tpu.kernels.descriptor_loss_pallas import (
            descriptor_loss_pallas,
        )
        from spnerf_tpu.train.losses import (
            cell_grid_coords,
            descriptor_loss_normalised_blockwise,
        )

        B, Hc, Wc, _ = out["desc_raw"].shape
        cells = cell_grid_coords(Hc, Wc, desc_cfg.grid_size)
        if nerf_desc:
            warped_cells = warp_points_nerf(
                cells, data["raw"]["depth"], data["intrinsics"],
                data["raw"]["rotation"], data["raw"]["translation"],
                data["warp"]["rotation"], data["warp"]["translation"],
            )
        else:
            warped_cells = warp_points(cells, data["homography"])
        if desc_cfg.normalise_descriptors:
            # global row/col volume norms don't fit the streaming
            # kernel; checkpointed-scan path keeps memory O(tile*N)
            desc, pos, neg = descriptor_loss_normalised_blockwise(
                out["desc_raw"], warped_out["desc_raw"], warped_cells,
                desc_cfg, wmask,
            )
        else:
            desc, pos, neg = descriptor_loss_pallas(
                out["desc_raw"], warped_out["desc_raw"], warped_cells,
                desc_cfg, wmask,
            )
    elif nerf_desc:
        desc, pos, neg = descriptor_loss_nerf(
            out["desc_raw"], warped_out["desc_raw"],
            data["raw"]["depth"], data["intrinsics"],
            data["raw"]["rotation"], data["raw"]["translation"],
            data["warp"]["rotation"], data["warp"]["translation"],
            desc_cfg, wmask,
        )
    else:
        desc, pos, neg = descriptor_loss(
            out["desc_raw"], warped_out["desc_raw"], data["homography"],
            desc_cfg, wmask,
        )
    loss = det + det_warped + desc
    metrics = {
        "detector_loss": det,
        "warped_detector_loss": det_warped,
        "descriptor_loss": desc,
        "positive_dist": pos,
        "negative_dist": neg,
        "loss": loss,
    }
    return loss, (bs2, metrics)


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration captured by the jitted step."""

    model: SuperPoint
    grid_size: int = 8
    include_mask: bool = True
    desc_cfg: DescriptorLossConfig = DescriptorLossConfig()
    nerf_desc: bool = False
    # on-device augmentation
    aug: HomographyConfig | None = None
    erosion: int = 0
    pair: bool = False  # SuperPoint warped-pair mode
    # on-device photometric augmentation (None = host-side or disabled);
    # applied in train_step only — validation stays unaugmented, matching
    # the datasets' split == "training" gate
    photometric: PhotometricDeviceConfig | None = None
    # blockwise descriptor loss: Pallas streaming kernel
    # (normalise=False) or checkpointed-scan path (normalise=True);
    # the dense MXU-matmul path is used when False
    pallas_desc: bool = False
    # detection threshold for validation precision/recall (reference
    # train.py:190 uses the config det_thresh)
    det_thresh: float = 0.015

    def __hash__(self):  # SuperPoint module is hashable (frozen dataclass cfg)
        return hash((id(self.model), self.grid_size, self.include_mask,
                     self.desc_cfg, self.nerf_desc, self.aug, self.erosion,
                     self.pair, self.pallas_desc, self.det_thresh,
                     self.photometric))


@partial(jax.jit, static_argnames=("cfg", "tx"), donate_argnames=("state",))
def train_step(state: TrainState, batch: dict, key: jax.Array,
               cfg: StepConfig, tx) -> tuple[TrainState, dict]:
    k_ph, k_aug, k_loss = jax.random.split(
        jax.random.fold_in(key, state.iteration), 3
    )

    if cfg.photometric is not None:
        batch = dict(batch)
        if cfg.nerf_desc and "depth" in batch:
            # two real views: independent draws on each
            k1, k2 = jax.random.split(k_ph)
            batch["image"] = photometric_augment(
                k1, batch["image"], cfg.photometric)
            batch["image_warp"] = photometric_augment(
                k2, batch["image_warp"], cfg.photometric)
        elif cfg.pair:
            # raw view + to-be-warped view: independent draws from the
            # same base image (host counterpart: data/coco.py:80-87)
            k1, k2 = jax.random.split(k_ph)
            base = batch["image"]
            batch["image"] = photometric_augment(k1, base, cfg.photometric)
            batch["image_warp_src"] = photometric_augment(
                k2, base, cfg.photometric)
        else:
            batch["image"] = photometric_augment(
                k_ph, batch["image"], cfg.photometric)

    if cfg.pair:
        data = _prepare_pair(batch, k_aug, cfg)
        loss_fn = lambda p: superpoint_loss_fn(
            p, state.batch_stats, cfg.model, data, k_loss, cfg.grid_size,
            cfg.include_mask, cfg.desc_cfg, cfg.nerf_desc, True,
            cfg.pallas_desc,
        )
    else:
        data = prepare_detector_batch(k_aug, batch, cfg.aug, cfg.erosion) \
            if ("kpts" in batch) else batch
        loss_fn = lambda p: magicpoint_loss_fn(
            p, state.batch_stats, cfg.model, data, k_loss, cfg.grid_size,
            cfg.include_mask, True,
        )

    (loss, (new_bs, metrics)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=new_params,
        batch_stats=new_bs,
        opt_state=new_opt,
        iteration=state.iteration + 1,
    )
    metrics["loss"] = loss
    return new_state, metrics


@partial(jax.jit, static_argnames=("cfg",))
def eval_step(state: TrainState, batch: dict, key: jax.Array, cfg: StepConfig):
    """Validation: loss + precision/recall (reference train.py:157-221)."""
    k_aug, k_loss = jax.random.split(key)
    if cfg.pair:
        data = _prepare_pair(batch, k_aug, cfg)
        loss, (_, metrics) = superpoint_loss_fn(
            state.params, state.batch_stats, cfg.model, data, k_loss,
            cfg.grid_size, cfg.include_mask, cfg.desc_cfg, cfg.nerf_desc, False,
            cfg.pallas_desc,
        )
        image = data["raw"]["image"]
        heatmap = data["raw"]["kpts_heatmap"]
    else:
        data = prepare_detector_batch(k_aug, batch, cfg.aug, cfg.erosion) \
            if ("kpts" in batch) else batch
        loss, (_, metrics) = magicpoint_loss_fn(
            state.params, state.batch_stats, cfg.model, data, k_loss,
            cfg.grid_size, cfg.include_mask, False,
        )
        image = data["image"]
        heatmap = data["kpts_heatmap"]

    out = cfg.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        image, train=False,
    )
    from spnerf_tpu.ops.detector_decode import decode_detector_logits

    prob = decode_detector_logits(out["logits"], cfg.grid_size)
    pred = (prob >= cfg.det_thresh).astype(jnp.int32)
    precision, recall = precision_recall(pred, heatmap)
    metrics = dict(metrics)
    metrics.update({"val_loss": loss, "precision": precision, "recall": recall})
    return metrics


# --------------------------------------------------------------- checkpoints


def save_checkpoint(ckpt_name: str, state: TrainState, step: int | None = None):
    """Serialize {iteration, params, batch_stats, opt_state} to msgpack.

    ``to_state_dict`` turns optax namedtuple states into plain dicts so
    the checkpoint is self-describing; unlike the reference
    (train.py:137-139) the optimizer state IS checkpointed.
    """
    step = int(state.iteration) if step is None else step
    path = Path(CKPT_PATH, ckpt_name)
    path.mkdir(parents=True, exist_ok=True)
    payload = {
        "iteration": np.asarray(state.iteration),
        "params": serialization.to_state_dict(jax.device_get(state.params)),
        "batch_stats": serialization.to_state_dict(
            jax.device_get(state.batch_stats)
        ),
        "opt_state": serialization.to_state_dict(jax.device_get(state.opt_state)),
    }
    payload = jax.tree.map(np.asarray, payload)
    out = path / f"{ckpt_name}_{step}.ckpt"
    out.write_bytes(serialization.msgpack_serialize(payload))
    return out


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def partial_restore(target_params, saved_params):
    """Copy saved leaves into the target wherever path AND shape match —
    the reference's partial state-dict merge (engine.py:86-90), which is
    how MagicPoint weights seed a SuperPoint model."""
    saved = dict(_flatten(saved_params))
    target = unfreeze(target_params) if hasattr(target_params, "unfreeze") else target_params

    def visit(node, prefix):
        for k in list(node.keys()):
            v = node[k]
            if isinstance(v, dict):
                visit(v, prefix + (k,))
            else:
                s = saved.get(prefix + (k,))
                if s is not None and np.shape(s) == np.shape(v):
                    node[k] = jnp.asarray(s)

    visit(target, ())
    return target


def load_checkpoint(path: str | Path) -> dict:
    data = serialization.msgpack_restore(Path(path).read_bytes())
    return data
