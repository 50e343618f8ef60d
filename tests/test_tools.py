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


def _evidence_doc():
    return (
        "# doc\n\n"
        "| checkpoint | AUC@5 | AUC@10 | AUC@20 | precision | "
        "matching score | pairs |\n"
        "|---|---|---|---|---|---|---|\n"
        "| `x` | pending | | | | | |\n\n"
        "| metric | round 3 | round 4 | target | capture |\n"
        "|---|---|---|---|---|\n"
        "| SuperPoint inference (bench.py, 480x640) | 1 | pending | 2 | f |\n"
        "| Train step MagicPoint b32 240x320 | - | pending | - | f |\n"
        "| Train step SuperPoint b4 240x320 | - | pending | - | f |\n"
        "| HA pseudo-label export (240x320, 100 warps) | - | pending | - | |\n"
        "| NeRF renderer (bench_nerf.py) | - | pending | - | f |\n"
    )


def test_fill_perf_table_syncs_all_rows(tmp_path, monkeypatch):
    import tools.fill_perf_table as fp

    ev = tmp_path / "docs" / "evidence"
    ev.mkdir(parents=True)
    doc = ev / "demo_r5_results.md"
    doc.write_text(_evidence_doc())
    (ev / "bench_r5_capture.json").write_text(json.dumps(
        {"metric": "superpoint_inference_480x640", "value": 1500.5,
         "unit": "frames/sec", "mode": "int8", "fused_mid": True,
         "fused_tail": True}) + "\n")
    (ev / "bench_train_r5.jsonl").write_text(
        json.dumps({"metric": "train_step_magicpoint_b32_240x320",
                    "value": 14.2}) + "\n" +
        json.dumps({"metric": "train_step_superpoint_b4_240x320",
                    "value": 9.8}) + "\n")
    (ev / "ha_r5_report.jsonl").write_text(
        json.dumps({"metric": "ha_export_imgs_per_sec",
                    "label": "bf16_b16", "value": 21.0}) + "\n" +
        json.dumps({"metric": "ha_label_agreement",
                    "label": "bf16_vs_mixed", "exact_iou": 0.93}) + "\n")
    (ev / "bench_nerf_r5.json").write_text(json.dumps(
        {"metric": "nerf_render_rays_per_sec", "value": 3.12e7,
         "unit": "rays/sec"}) + "\n")

    monkeypatch.setattr(fp, "EV", ev)
    monkeypatch.setattr(fp, "DOC", doc)
    fp.main()
    text = doc.read_text()
    assert "1,500 fps" in text and "14.20 steps/s" in text
    assert "9.80 steps/s" in text and "bf16_b16 21.0" in text
    assert "mixed 0.93" in text and "31.2M rays/s" in text
    assert "pending" not in text.split("round 4")[1]
    # idempotent: second run leaves the doc unchanged
    fp.main()
    assert doc.read_text() == text


def test_fill_perf_table_noop_without_captures(tmp_path, monkeypatch):
    import tools.fill_perf_table as fp

    ev = tmp_path / "docs" / "evidence"
    ev.mkdir(parents=True)
    doc = ev / "demo_r5_results.md"
    doc.write_text(_evidence_doc())
    monkeypatch.setattr(fp, "EV", ev)
    monkeypatch.setattr(fp, "DOC", doc)
    fp.main()
    assert doc.read_text() == _evidence_doc()


def test_fill_pose_table_renders_rows(tmp_path, monkeypatch):
    import tools.fill_pose_table as fpt

    doc = tmp_path / "demo_r4_results.md"
    doc.write_text(_evidence_doc())
    src = tmp_path / "pose_auc_results.jsonl"
    row = {"auc5": 1.0, "auc10": 2.0, "auc20": 3.0, "precision": 4.0,
           "matching_score": 5.0, "num_pairs": 92,
           "ci95": {"auc5": [0.5, 1.5], "auc10": [1.5, 2.5],
                    "auc20": [2.5, 3.5], "precision": [3.5, 4.5],
                    "matching_score": [4.5, 5.5]},
           "pretrained": "demo_sp/demo_sp_1.ckpt"}
    with open(src, "w") as f:
        f.write(json.dumps(row) + "\n")
        row2 = dict(row, auc5=9.0, pretrained="demo_sp/demo_sp_2.ckpt")
        f.write(json.dumps(row2) + "\n")
        # duplicate tag: last row wins
        f.write(json.dumps(dict(row, auc5=7.0)) + "\n")
    monkeypatch.setattr(fpt, "DOC", doc)
    monkeypatch.setattr(fpt, "SRC", src)
    fpt.main()
    text = doc.read_text()
    assert "7.00 [0.50, 1.50]" in text       # last duplicate won
    assert "9.00 [0.50, 1.50]" in text       # second checkpoint present
    assert "| `x` | pending" not in text      # placeholder replaced
