"""Worker process for the 2-process jax.distributed (multi-host) test.

Launched by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set. Each process owns 2 virtual CPU
devices, so the global mesh is 4-wide across 2 processes — the DP
gradient psum crosses the process boundary (gloo collectives), which is
exactly the DCN topology of a multi-host TPU export sweep (SURVEY §5
"distributed communication backend").

Steps executed (mirrors the single-process dryrun in __graft_entry__):
1. maybe_initialize_distributed() from the standard env;
2. one full data-parallel SuperPoint training step on the global mesh
   (cross-process grad psum);
3. one homography-adaptation shard: each process runs its local slice
   of the image batch through the jitted HA program and writes its own
   pseudo-label .npy artifacts (the multi-host HA export pattern).

Writes "<out_dir>/proc<i>.json" with the loss and artifact names so the
parent test can assert cross-process agreement.
"""

import json
import os
import sys


def main() -> None:
    out_dir = sys.argv[1]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from spnerf_tpu.parallel.distributed import (
        maybe_initialize_distributed,
        process_local_batch_slice,
    )

    assert maybe_initialize_distributed(), "distributed env not picked up"
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.devices()
    assert len(devices) == 4, f"global device count {len(devices)}"
    mesh = Mesh(np.asarray(devices), ("data",))
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    # --- 1 DP training step over the global mesh -----------------------
    from spnerf_tpu.geometry.homography import HomographyConfig
    from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
    from spnerf_tpu.train.loop import StepConfig, create_train_state, train_step
    from spnerf_tpu.train.losses import DescriptorLossConfig

    H = W = 32
    B = 4  # one sample per global device
    cfg = SuperPointConfig(
        model_name="superpoint",
        vgg_cn=(8, 8, 16, 16, 32, 32, 32, 32),
        detector_dim=(32, 64),
        descriptor_dim=(32, 64),
    )
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, H, W, 1))
    state, tx = create_train_state(variables, 1e-3)
    # replicate: every process holds the full (identical) params
    state = jax.tree.map(
        lambda x: jax.make_array_from_callback(
            x.shape, replicated, lambda idx: np.asarray(x)[idx]),
        state,
    )

    step_cfg = StepConfig(
        model=model,
        aug=HomographyConfig(patch_ratio=0.85, allow_artifacts=True),
        erosion=2,
        pair=True,
        desc_cfg=DescriptorLossConfig(),
    )

    rng = np.random.default_rng(0)  # same seed on both hosts
    host_batch = {
        "image": rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32),
        "kpts": rng.uniform(2, H - 2, (B, 16, 2)).astype(np.float32),
        "kpts_mask": np.ones((B, 16), bool),
    }
    start, size = process_local_batch_slice(B)
    batch = {
        k: jax.make_array_from_process_local_data(
            batch_sharding, v[start:start + size])
        for k, v in host_batch.items()
    }

    new_state, metrics = train_step(state, batch, jax.random.PRNGKey(1),
                                    step_cfg, tx)
    jax.block_until_ready(metrics)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), "non-finite multi-host DP loss"

    # --- 1 HA export shard per process ---------------------------------
    from spnerf_tpu.ops.homography_adaptation import (
        HAConfig,
        homography_adaptation,
    )
    from spnerf_tpu.ops.nms import box_nms

    from spnerf_tpu.ops.detector_decode import decode_detector_logits

    ha_cfg = HAConfig(num=3, chunk=2, valid_border_margin=2)
    # pull the (replicated) trained variables to host once: the HA shard
    # below is a process-LOCAL program (no cross-process collectives —
    # every image is independent)
    local_vars = {
        "params": jax.device_get(new_state.params),
        "batch_stats": jax.device_get(new_state.batch_stats),
    }

    def prob_fn(img):
        out = model.apply(local_vars, img, train=False)
        return decode_detector_logits(out["logits"], model.config.grid_size)

    # per-image keys from the GLOBAL batch (pad-invariant convention,
    # tasks/export.py); each process exports its own slice
    img_keys = np.asarray(jax.random.split(jax.random.PRNGKey(7), B))
    local_imgs = jnp.asarray(host_batch["image"][start:start + size])
    local_keys = jnp.asarray(img_keys[start:start + size])
    prob = homography_adaptation(prob_fn, local_imgs, local_keys, ha_cfg)
    prob_nms = jax.vmap(
        lambda p: box_nms(p, size=4, iou=0.1, min_prob=0.001, keep_top_k=50)
    )(prob)
    prob_nms = np.asarray(prob_nms)

    names = []
    os.makedirs(out_dir, exist_ok=True)
    for i in range(size):
        name = f"img{start + i:04d}"
        pts = np.argwhere(prob_nms[i] >= 0.001).astype(np.int64)
        np.save(os.path.join(out_dir, f"{name}.npy"), pts)
        names.append(name)

    with open(os.path.join(out_dir, f"proc{pid}.json"), "w") as f:
        json.dump({"loss": loss, "names": names,
                   "process_count": jax.process_count()}, f)
    print(f"worker {pid} ok loss={loss:.4f} exported={names}")


if __name__ == "__main__":
    main()
