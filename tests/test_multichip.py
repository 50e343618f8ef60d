"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# >=10s on the 1-core CPU host (r4 timing run); excluded from the
# quick pre-commit tier: pytest -m "not slow"
pytestmark = pytest.mark.slow


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (2, 240, 320)


def test_data_parallel_step_matches_single_device(rng):
    """DP gradient step over the mesh == single-device step on the same
    global batch (psum/mean equivalence)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spnerf_tpu.models import SuperPointConfig, init_superpoint
    from spnerf_tpu.train.loop import StepConfig, create_train_state, train_step

    H = W = 16
    cfg = SuperPointConfig(model_name="magicpoint", vgg_cn=(4, 4, 8, 8, 8, 8, 8, 8),
                           detector_dim=(8, 16))
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, H, W, 1))
    step_cfg = StepConfig(model=model, aug=None, include_mask=False)

    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (8, H, W, 1)).astype(np.float32)),
        "kpts": jnp.asarray(rng.uniform(2, H - 2, (8, 8, 2)).astype(np.float32)),
        "kpts_mask": jnp.ones((8, 8), bool),
    }
    key = jax.random.PRNGKey(5)

    # single device
    state1, tx = create_train_state(variables, 1e-3)
    state1, m1 = train_step(state1, batch, key, step_cfg, tx)

    # 8-device mesh
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    bs = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    state8, _ = create_train_state(variables, 1e-3)
    state8 = jax.tree.map(lambda x: jax.device_put(x, rep), state8)
    sharded = {k: jax.device_put(v, bs) for k, v in batch.items()}
    state8, m8 = train_step(state8, sharded, key, step_cfg, tx)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    a = np.asarray(jax.tree.leaves(state1.params)[0])
    b = np.asarray(jax.tree.leaves(state8.params)[0])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_sharded_ha_export_matches_single_device(tmp_path, monkeypatch):
    """HA pseudo-label export sharded over the 8-device mesh writes
    bit-identical artifacts to the single-device run (VERDICT r1 #6)."""
    from jax.sharding import Mesh

    from spnerf_tpu.models import SuperPointConfig, init_superpoint
    from spnerf_tpu.tasks import export as export_mod

    H = W = 32
    cfg = SuperPointConfig(model_name="magicpoint",
                           vgg_cn=(4, 4, 8, 8, 8, 8, 8, 8),
                           detector_dim=(8, 16), det_thresh=0.001)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg,
                                       (1, H, W, 1))
    rng = np.random.default_rng(3)
    images = rng.uniform(0, 1, (8, H, W, 1)).astype(np.float32)
    loader = [{
        "image": images,
        "name": [f"img{i}" for i in range(8)],
    }]
    config = {
        "data": {"experiment_name": "ha_mesh"},
        "model": {"detector_head": {"nms": 4, "det_thresh": 0.001,
                                    "top_k": 50}},
        "homography_adaptation": {"num": 4, "chunk": 2},
    }

    outs = {}
    for tag, mesh in (
        ("single", None),
        ("mesh", Mesh(np.asarray(jax.devices()), ("data",))),
    ):
        root = tmp_path / tag
        monkeypatch.setattr(export_mod, "EXPER_PATH", root)
        out_dir = export_mod.export_pseudo_labels(
            config, model, variables, loader, split="training",
            enable_ha=True, seed=7, mesh=mesh)
        outs[tag] = {p.name: np.load(p) for p in sorted(out_dir.glob("*.npy"))}

    assert set(outs["single"]) == set(outs["mesh"]) and len(outs["single"]) == 8
    for name in outs["single"]:
        np.testing.assert_array_equal(outs["single"][name], outs["mesh"][name])


def test_sharded_ha_export_pad_invariant(tmp_path, monkeypatch):
    """A batch NOT divisible by the mesh size pads internally; per-image
    HA keys come from the unpadded batch, so artifacts still match the
    single-device run bit-for-bit (ADVICE r2 #1)."""
    from jax.sharding import Mesh

    from spnerf_tpu.models import SuperPointConfig, init_superpoint
    from spnerf_tpu.tasks import export as export_mod

    H = W = 32
    cfg = SuperPointConfig(model_name="magicpoint",
                           vgg_cn=(4, 4, 8, 8, 8, 8, 8, 8),
                           detector_dim=(8, 16), det_thresh=0.001)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg,
                                       (1, H, W, 1))
    rng = np.random.default_rng(4)
    images = rng.uniform(0, 1, (5, H, W, 1)).astype(np.float32)  # 5 % 8 != 0
    loader = [{
        "image": images,
        "name": [f"img{i}" for i in range(5)],
    }]
    config = {
        "data": {"experiment_name": "ha_pad"},
        "model": {"detector_head": {"nms": 4, "det_thresh": 0.001,
                                    "top_k": 50}},
        "homography_adaptation": {"num": 4, "chunk": 2},
    }

    outs = {}
    for tag, mesh in (
        ("single", None),
        ("mesh", Mesh(np.asarray(jax.devices()), ("data",))),
    ):
        root = tmp_path / tag
        monkeypatch.setattr(export_mod, "EXPER_PATH", root)
        out_dir = export_mod.export_pseudo_labels(
            config, model, variables, loader, split="training",
            enable_ha=True, seed=7, mesh=mesh)
        outs[tag] = {p.name: np.load(p) for p in sorted(out_dir.glob("*.npy"))}

    assert set(outs["single"]) == set(outs["mesh"]) and len(outs["single"]) == 5
    for name in outs["single"]:
        np.testing.assert_array_equal(outs["single"][name], outs["mesh"][name])


def test_ha_export_batch_size_invariant(tmp_path, monkeypatch):
    """Exported labels are a pure function of (seed, dataset order):
    re-batching the same images (b=2 vs b=4) writes bit-identical
    artifacts. Regression for the round-4 bug where per-image HA keys
    came from a per-BATCH split chain, so changing batch_size redrew
    every homography (and confounded the int8-vs-bf16 label-agreement
    comparison at mismatched batch sizes)."""
    from spnerf_tpu.models import SuperPointConfig, init_superpoint
    from spnerf_tpu.tasks import export as export_mod

    H = W = 32
    cfg = SuperPointConfig(model_name="magicpoint",
                           vgg_cn=(4, 4, 8, 8, 8, 8, 8, 8),
                           detector_dim=(8, 16), det_thresh=0.001)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg,
                                       (1, H, W, 1))
    rng = np.random.default_rng(5)
    images = rng.uniform(0, 1, (4, H, W, 1)).astype(np.float32)
    names = [f"img{i}" for i in range(4)]
    config = {
        "data": {"experiment_name": "ha_bs"},
        "model": {"detector_head": {"nms": 4, "det_thresh": 0.001,
                                    "top_k": 50}},
        "homography_adaptation": {"num": 4, "chunk": 2},
    }

    outs = {}
    for b in (2, 4):
        loader = [{"image": images[i:i + b], "name": names[i:i + b]}
                  for i in range(0, 4, b)]
        root = tmp_path / f"b{b}"
        monkeypatch.setattr(export_mod, "EXPER_PATH", root)
        out_dir = export_mod.export_pseudo_labels(
            config, model, variables, loader, split="training",
            enable_ha=True, seed=7, mesh=None)
        outs[b] = {p.name: np.load(p) for p in sorted(out_dir.glob("*.npy"))}

    assert set(outs[2]) == set(outs[4]) and len(outs[2]) == 4
    for name in outs[2]:
        np.testing.assert_array_equal(outs[2][name], outs[4][name])


def test_sharded_export_merges_bit_identical(tmp_path, monkeypatch):
    """data.shard (the multi-process export split, VERDICT r4 #8): two
    contiguous-block shards exported separately merge to the EXACT byte
    set of the unsharded run. Contiguous blocks + shard_offset keep the
    global fold_in(seed, index) warp keys, so sharding is invisible in
    the artifacts — the property the multi-host HA sweep relies on.
    Exercises the real COCO dataset + DataLoader + export path."""
    import cv2

    from spnerf_tpu.data import coco as coco_mod
    from spnerf_tpu.data.loader import DataLoader
    from spnerf_tpu.models import SuperPointConfig, init_superpoint
    from spnerf_tpu.tasks import export as export_mod

    H = W = 32
    img_dir = tmp_path / "COCO" / "images" / "training"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(6)
    for i in range(5):  # odd count: blocks of 3 + 2
        cv2.imwrite(str(img_dir / f"img{i}.png"),
                    rng.integers(0, 256, (H, W), np.uint8))
    monkeypatch.setattr(coco_mod, "DATA_PATH", tmp_path)

    cfg = SuperPointConfig(model_name="magicpoint",
                           vgg_cn=(4, 4, 8, 8, 8, 8, 8, 8),
                           detector_dim=(8, 16), det_thresh=0.001)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg,
                                       (1, H, W, 1))
    config = {
        "data": {"experiment_name": "ha_shard", "batch_size": 2,
                 "preprocessing": {"resize": [H, W]}},
        "model": {"detector_head": {"nms": 4, "det_thresh": 0.001,
                                    "top_k": 50}},
        "homography_adaptation": {"num": 4, "chunk": 2},
    }

    def run(root, shard):
        data_cfg = dict(config["data"])
        if shard is not None:
            data_cfg["shard"] = shard
        ds = coco_mod.COCO(data_cfg, "training")
        loader = DataLoader(ds, batch_size=2, shuffle=False,
                            drop_last=False)
        monkeypatch.setattr(export_mod, "EXPER_PATH", root)
        out_dir = export_mod.export_pseudo_labels(
            config, model, variables, loader, split="training",
            enable_ha=True, seed=7, mesh=None)
        return {p.name: np.load(p) for p in sorted(out_dir.glob("*.npy"))}

    full = run(tmp_path / "full", None)
    merged = run(tmp_path / "sh", [0, 2])
    merged.update(run(tmp_path / "sh", [1, 2]))  # same EXPER root: merge

    assert len(full) == 5 and set(merged) == set(full)
    for name in full:
        np.testing.assert_array_equal(full[name], merged[name])
