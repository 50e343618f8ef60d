"""Tools: COCO archive unpacking, transforms.json parsing."""

import json
import zipfile

import numpy as np
import pytest


def test_unpack_coco_archive(tmp_path, monkeypatch):
    import spnerf_tpu.tools.download_coco as dl

    monkeypatch.setattr(dl, "DATA_PATH", tmp_path)
    archive = tmp_path / "train2014.zip"
    with zipfile.ZipFile(archive, "w") as zf:
        zf.writestr("train2014/COCO_train2014_000000000001.jpg", b"fakejpg")
        zf.writestr("train2014/COCO_train2014_000000000002.jpg", b"fakejpg2")
    out = dl.unpack(archive, "training")
    files = sorted(p.name for p in out.iterdir())
    assert files == [
        "COCO_train2014_000000000001.jpg",
        "COCO_train2014_000000000002.jpg",
    ]
    # idempotent: re-unpack skips existing
    out2 = dl.unpack(archive, "training")
    assert out2 == out


def test_load_transforms_json(tmp_path):
    from spnerf_tpu.tools.process_scene import load_transforms_json

    meta = {
        "camera_angle_x": 0.8,
        "frames": [
            {"file_path": "images/frame_00002.png",
             "transform_matrix": np.eye(4).tolist()},
            {"file_path": "images/frame_00001.png",
             "transform_matrix": (np.eye(4) * 2).tolist()},
        ],
    }
    tj = tmp_path / "transforms.json"
    tj.write_text(json.dumps(meta))
    images, poses, fov = load_transforms_json(tj)
    # frames sorted by file path
    assert images[0].name == "frame_00001.png"
    assert poses.shape == (2, 4, 4)
    assert fov == pytest.approx(np.rad2deg(0.8))
