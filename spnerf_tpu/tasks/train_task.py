"""Config-driven training task (reference engine.py:67-95 +
engine_solvers/train.py:12-221).

One jitted step does augmentation + forward(s) + losses + update; the
loop handles checkpointing (with optimizer state), validation and
metric logging, data-parallel over the local device mesh.
"""

from __future__ import annotations

import itertools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.geometry.homography import HomographyConfig
from spnerf_tpu.ops.photometric_device import PhotometricDeviceConfig
from spnerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from spnerf_tpu.settings import CKPT_PATH
from spnerf_tpu.train.loop import (
    StepConfig,
    TrainState,
    create_train_state,
    eval_step,
    load_checkpoint,
    partial_restore,
    save_checkpoint,
    train_step,
)
from spnerf_tpu.train.losses import DescriptorLossConfig
from spnerf_tpu.utils.factories import get_loaders, get_model
from spnerf_tpu.utils.logging import MetricWriter


def build_step_config(config: dict, model, include_mask: bool,
                      nerf_desc: bool = False) -> StepConfig:
    data_cfg = config.get("data", {})
    aug_cfg = data_cfg.get("augmentation", {})
    model_cfg = config["model"]
    is_pair = model_cfg.get("model_name") != "magicpoint"

    aug = None
    erosion = 0
    if is_pair and aug_cfg.get("pair_homography"):
        aug = HomographyConfig.from_dict(aug_cfg["pair_homography"].get("params", {}))
        erosion = aug_cfg["pair_homography"].get("valid_border_margin", 0)
    elif not is_pair and aug_cfg.get("homographic", {}).get("enable"):
        aug = HomographyConfig.from_dict(aug_cfg["homographic"].get("params", {}))
        erosion = aug_cfg["homographic"].get("valid_border_margin", 0)

    pcfg = aug_cfg.get("photometric", {}) or {}
    photometric = (
        PhotometricDeviceConfig.from_dict(pcfg)
        if pcfg.get("enable") and pcfg.get("on_device")
        else None
    )

    desc_cfg = DescriptorLossConfig.from_dict(model_cfg.get("descriptor_head", {}))
    return StepConfig(
        model=model,
        grid_size=model_cfg.get("detector_head", {}).get("grid_size", 8),
        include_mask=include_mask,
        desc_cfg=desc_cfg,
        nerf_desc=nerf_desc,
        aug=aug,
        erosion=erosion,
        pair=is_pair,
        pallas_desc=bool(config.get("train", {}).get("pallas_desc_loss", False)),
        det_thresh=float(
            model_cfg.get("detector_head", {}).get("det_thresh", 0.015)
        ),
        photometric=photometric,
    )


def restore_pretrained(config: dict, variables: dict):
    """Reference partial checkpoint load (engine.py:79-93)."""
    pretrained = config.get("pretrained")
    iteration = 0
    if pretrained:
        path = Path(CKPT_PATH, pretrained)
        data = load_checkpoint(path)
        variables = dict(variables)
        variables["params"] = partial_restore(variables["params"], data["params"])
        if "batch_stats" in data:
            variables["batch_stats"] = partial_restore(
                variables["batch_stats"], data["batch_stats"]
            )
        if config.get("continue_training"):
            iteration = int(data["iteration"])
    return variables, iteration


def train(
    config: dict,
    validate_training: bool = False,
    include_mask_loss: bool = True,
    nerf_loss: bool = False,
    train_nerf: bool = False,
    seed: int = 0,
):
    """The ``--task train`` entry point."""
    resize = config["data"].get("preprocessing", {}).get("resize", (120, 160))
    input_shape = (1, int(resize[0]), int(resize[1]), 1)

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    model, variables = get_model(config["model"], k_init, input_shape)
    variables, iteration = restore_pretrained(config, variables)

    loaders = get_loaders(config, "train", nerf_train=train_nerf)

    state, tx = create_train_state(variables, config["train"]["learning_rate"])
    if iteration:
        state = TrainState(
            params=state.params, batch_stats=state.batch_stats,
            opt_state=state.opt_state,
            iteration=jnp.asarray(iteration, jnp.int32),
        )

    mesh = make_mesh()
    multi_device = len(mesh.devices.ravel()) > 1
    if multi_device:
        state = replicate(state, mesh)

    step_cfg = build_step_config(config, model, include_mask_loss, nerf_loss)

    ckpt_name = config["ckpt_name"]
    writer = MetricWriter(Path(CKPT_PATH, ckpt_name, "logs"))
    num_iters = config["train"]["num_iters"]
    interval = config.get("save_or_validation_interval", 1000)

    if train_nerf:
        train_streams = itertools.cycle(
            [iter_forever(l) for l in loaders["train"]]
        )
        get_batch = lambda: next(next(train_streams))
    else:
        stream = iter_forever(loaders["train"])
        get_batch = lambda: next(stream)
    # overlap H2D with device compute: the tunneled chip charges a
    # ~55 ms floor PER transfer (docs/PERF.md) and a batch is 3+ arrays,
    # so issuing transfers from the training thread serializes ~150+ ms
    # behind every step. A depth-2 device-side prefetch hides it.
    device_stream = device_prefetch(
        get_batch, mesh if multi_device else None)
    get_device_batch = lambda: next(device_stream)

    log_every = int(config.get("log_every", 50))
    profile_cfg = config.get("profile", {}) or {}
    from spnerf_tpu.utils.profiling import StepTimer

    timer = StepTimer(window=log_every)
    running = []
    it = int(state.iteration)
    while it < num_iters:
        if profile_cfg.get("enable") and it == profile_cfg.get("start", 10):
            jax.profiler.start_trace(
                profile_cfg.get("logdir", str(Path(CKPT_PATH, ckpt_name, "trace")))
            )
        if profile_cfg.get("enable") and it == (
            profile_cfg.get("start", 10) + profile_cfg.get("num_steps", 20)
        ):
            jax.profiler.stop_trace()
        batch = get_device_batch()
        key, k_step = jax.random.split(key)
        state, metrics = train_step(state, batch, k_step, step_cfg, tx)
        it += 1
        # materialize metrics only periodically: a float() every iteration
        # would force a device sync per step
        sps = timer.tick()
        if sps is not None:
            writer.scalar("perf/steps_per_sec", sps, it)
        if it % log_every == 0 or it % interval == 0 or it >= num_iters:
            host_metrics = {k: float(v) for k, v in metrics.items()}
            running.append(host_metrics["loss"])
            writer.scalars(host_metrics, it, prefix="iter_loss/")

        if it % interval == 0 or it >= num_iters:
            if running:
                writer.scalar("running_loss/train", float(np.mean(running)), it)
            running = []
            if validate_training and loaders.get("validation") is not None:
                val_loader = loaders["validation"]
                if train_nerf:
                    val_loader = val_loader[0]
                # full validation pass like the reference (train.py:157-221);
                # train.val_batches bounds it for quick runs (0 = full)
                val_batches = int(config.get("train", {}).get("val_batches", 0))
                val_iter = iter(val_loader)
                if val_batches > 0:
                    val_iter = itertools.islice(val_iter, val_batches)
                vals = []
                for vb in val_iter:
                    key, k_val = jax.random.split(key)
                    m = eval_step(state, _to_device(vb, None), k_val, step_cfg)
                    vals.append({k: float(v) for k, v in m.items()})
                if vals:
                    agg = {k: float(np.mean([v[k] for v in vals])) for k in vals[0]}
                    writer.scalars(agg, it, prefix="val/")
            save_checkpoint(ckpt_name, state, it)
            writer.flush()

    writer.close()
    return state


def iter_forever(loader):
    while True:
        yield from loader


def device_prefetch(get_batch, mesh, depth: int = 2):
    """Generator of ON-DEVICE batches, produced by a worker thread so
    host batch assembly + the tunnel's per-transfer latency overlap the
    jitted step running on device. FIFO single worker: batch order (and
    the datasets' thread-local RNG streams) stay deterministic."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)

    def worker():
        try:
            while True:
                q.put(_to_device(get_batch(), mesh))
        except BaseException as e:  # propagate into the training thread
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if isinstance(item, BaseException):
            raise item
        yield item


def _to_device(batch: dict, mesh):
    # drop host-only fields: string arrays (e.g. "name"/"warped_name"
    # from the collator) never go to the device
    batch = {
        k: v for k, v in batch.items()
        if not (isinstance(v, np.ndarray) and v.dtype.kind in "USO")
        and not isinstance(v, (str, bytes))
    }
    arrays = jax.tree.map(jnp.asarray, batch)
    if mesh is not None:
        arrays = shard_batch(arrays, mesh)
    return arrays
