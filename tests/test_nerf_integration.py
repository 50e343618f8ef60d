"""End-to-end NeRF loop on a tiny synthetic scene:

train NeRF -> render dataset (images + along-ray depth + poses) ->
NeRFDataset pair loading -> fused multi-view label export ->
NeRF-SuperPoint training step with the 3D-reprojection descriptor loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spnerf_tpu.models.nerf import NeRFConfig

# >=10s on the 1-core CPU host (r4 timing run); excluded from the
# quick pre-commit tier: pytest -m "not slow"
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tmp_roots(tmp_path_factory):
    root = tmp_path_factory.mktemp("nerf_e2e")
    import spnerf_tpu.data.nerf_dataset as nds
    import spnerf_tpu.tasks.export_nerf as exn
    import spnerf_tpu.tasks.nerf_task as ntask

    data_path = root / "data"
    exper_path = root / "outputs"
    orig = (nds.DATA_PATH, nds.EXPER_PATH, ntask.DATA_PATH, exn.EXPER_PATH)
    nds.DATA_PATH = data_path
    nds.EXPER_PATH = exper_path
    ntask.DATA_PATH = data_path
    exn.EXPER_PATH = exper_path
    yield data_path, exper_path
    nds.DATA_PATH, nds.EXPER_PATH, ntask.DATA_PATH, exn.EXPER_PATH = orig


TINY = NeRFConfig(depth=2, width=16, skip_layer=1, pos_freqs=2, dir_freqs=1,
                  n_coarse=4, n_fine=4, near=2.0, far=6.0)


def test_full_nerf_loop(tmp_roots):
    data_path, exper_path = tmp_roots
    from spnerf_tpu.data.loader import DataLoader
    from spnerf_tpu.data.nerf_dataset import NeRFDataset, camera_intrinsics
    from spnerf_tpu.models.nerf import init_nerf
    from spnerf_tpu.tasks.nerf_task import pose_orbit, render_dataset

    H = W = 24
    fov = 60.0
    K = camera_intrinsics((H, W), fov)
    poses = pose_orbit(6, radius=4.0)

    # (skip actual NeRF training here — rendering an untrained field still
    # exercises the full geometry/data path; training is covered in
    # test_nerf.py)
    model, params = init_nerf(jax.random.PRNGKey(0), TINY)
    scene_root = render_dataset(
        model, params, "TestScene", poses, (H, W), K, TINY,
        splits={"training": list(range(6))},
    )
    assert (scene_root / "images" / "training" / "0.png").exists()
    assert (scene_root / "depth" / "training" / "0.npy").exists()
    depth = np.load(scene_root / "depth" / "training" / "0.npy")
    assert depth.shape == (H, W)
    assert np.isfinite(depth).all()

    # --- dataset pair loading
    data_cfg = {
        "name": "NeRF", "class_name": "NeRF", "data_dir": "TestScene",
        "fov": fov, "has_labels": False, "warped_pair": False,
        "augmentation": {"photometric": {"enable": False}},
    }
    ds = NeRFDataset(data_cfg, "training")
    assert len(ds) == 6
    sample = ds[0]
    assert sample["image"].shape == (H, W, 1)
    assert sample["rotation"].shape == (3, 3)

    # --- fused multi-view label export with a tiny detector
    from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
    from spnerf_tpu.tasks.export_nerf import export_nerf_labels

    sp_cfg = SuperPointConfig(
        model_name="magicpoint", vgg_cn=(4, 4, 8, 8, 8, 8, 8, 8),
        detector_dim=(8, 16), det_thresh=0.001, nms=4,
    )
    sp_model, sp_vars = init_superpoint(jax.random.PRNGKey(1), sp_cfg,
                                        (1, H, W, 1))
    config = {
        "data": {**data_cfg, "experiment_name": "nerf_exp/TestScene",
                 "batch_size": 6},
        "model": {
            "model_name": "magicpoint",
            "detector_head": {"grid_size": 8, "nms": 4, "det_thresh": 0.001,
                              "top_k": 0},
        },
    }
    out_dir = export_nerf_labels(config, sp_model, sp_vars)
    labels = sorted(out_dir.glob("*.npy"))
    assert len(labels) == 6
    pts = np.load(labels[0])
    assert pts.ndim == 2 and pts.shape[1] == 2

    # --- NeRF-SuperPoint train step on a warped pair with those labels
    from spnerf_tpu.train.loop import StepConfig, create_train_state, train_step
    from spnerf_tpu.train.losses import DescriptorLossConfig

    # label dirs carry the 'outputs/' prefix, like the reference configs
    pair_cfg = {**data_cfg, "warped_pair": True,
                "has_labels": "outputs/nerf_exp/TestScene"}
    ds2 = NeRFDataset(pair_cfg, "training")
    loader = DataLoader(ds2, batch_size=2, shuffle=False, drop_last=True)
    batch = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k not in ("name", "warped_name")}

    spp_cfg = SuperPointConfig(
        model_name="superpoint", vgg_cn=(4, 4, 8, 8, 8, 8, 8, 8),
        detector_dim=(8, 16), descriptor_dim=(8, 16),
    )
    spp_model, spp_vars = init_superpoint(jax.random.PRNGKey(2), spp_cfg,
                                          (1, H, W, 1))
    state, tx = create_train_state(spp_vars, 1e-3)
    step_cfg = StepConfig(model=spp_model, pair=True, nerf_desc=True,
                          desc_cfg=DescriptorLossConfig(), include_mask=True)
    state, metrics = train_step(state, batch, jax.random.PRNGKey(3),
                                step_cfg, tx)
    for k in ("detector_loss", "warped_detector_loss", "descriptor_loss"):
        assert np.isfinite(float(metrics[k])), k
