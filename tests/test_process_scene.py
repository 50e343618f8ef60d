"""End-to-end exercise of the scene preprocessing toolchain
(tools/process_scene.py — counterpart of reference colmap/colmap.py:35-159
+ dependencies/*.bat).

The bench environment has no ffmpeg/COLMAP binaries, so the shell-out
legs run against MOCK executables that reproduce the binaries' file
contract; the transforms.json -> NeRF-train -> render-dataset leg runs
for real (tiny shapes, CPU).
"""

import json
import os
import stat
import sys
from pathlib import Path

import numpy as np
import pytest

from spnerf_tpu.tools import process_scene


def _write_exe(path: Path, body: str):
    path.write_text("#!/bin/bash\n" + body)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)


@pytest.fixture
def mock_bin(tmp_path, monkeypatch):
    b = tmp_path / "bin"
    b.mkdir()
    log = tmp_path / "calls.log"
    # ffmpeg mock: consumes "-i <video> -vf fps=N <pattern>" and writes
    # 4 frames matching the pattern
    _write_exe(b / "ffmpeg", f"""
echo "ffmpeg $@" >> {log}
pattern="${{@: -1}}"
for i in 1 2 3 4; do
  python -c "import cv2, numpy as np, sys; \\
cv2.imwrite(sys.argv[1] % int(sys.argv[2]), \\
np.full((48, 64), 40 * int(sys.argv[2]), np.uint8))" "$pattern" $i
done
""")
    # colmap mock: records the subcommand and touches the expected
    # outputs (database for feature_extractor/matcher, model for mapper)
    _write_exe(b / "colmap", f"""
echo "colmap $@" >> {log}
sub="$1"; shift
db=""; out=""
while [ $# -gt 0 ]; do
  case "$1" in
    --database_path) db="$2"; shift 2;;
    --output_path) out="$2"; shift 2;;
    *) shift;;
  esac
done
[ -n "$db" ] && touch "$db"
if [ "$sub" = mapper ] && [ -n "$out" ]; then
  mkdir -p "$out/0"
  touch "$out/0/cameras.bin" "$out/0/images.bin" "$out/0/points3D.bin"
fi
""")
    monkeypatch.setenv("PATH", f"{b}:{os.environ['PATH']}")
    return log


def test_video_to_colmap_leg(tmp_path, mock_bin):
    """video -> ffmpeg frames -> COLMAP sfm (no transforms.json yet):
    the driver must run all three COLMAP stages and stop with the
    convert-to-transforms instruction (reference colmap.py:84-155)."""
    scene = tmp_path / "scene"
    scene.mkdir()
    (scene / "clip.mp4").write_bytes(b"\x00fake")

    with pytest.raises(SystemExit, match="transforms.json"):
        process_scene.main(["--data-path", str(scene),
                            "--input-type", "video"])

    frames = sorted((scene / "images").glob("frame_*.png"))
    assert len(frames) == 4
    calls = mock_bin.read_text().splitlines()
    assert any("ffmpeg" in c and "fps=2" in c for c in calls)
    for stage in ("feature_extractor", "exhaustive_matcher", "mapper"):
        assert any(f"colmap {stage}" in c for c in calls)
    assert (scene / "colmap" / "sparse" / "0" / "cameras.bin").exists()


@pytest.mark.slow
def test_transforms_to_nerf_dataset(tmp_path, monkeypatch):
    """transforms.json -> in-framework NeRF train -> rendered dataset in
    the exact layout data/nerf_dataset.py consumes."""
    import cv2

    import spnerf_tpu.tasks.nerf_task as nerf_task
    from spnerf_tpu.data.nerf_dataset import NeRFDataset

    scene = tmp_path / "scene"
    (scene / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(4):
        name = f"images/im_{i}.png"
        cv2.imwrite(str(scene / name),
                    rng.integers(0, 255, (48, 64, 3), np.uint8))
        theta = i * np.pi / 8
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [2 * np.sin(theta), 0, 2 * np.cos(theta)]
        frames.append({"file_path": name,
                       "transform_matrix": c2w.tolist()})
    (scene / "transforms.json").write_text(json.dumps(
        {"camera_angle_x": 0.9, "frames": frames}))

    import spnerf_tpu.data.nerf_dataset as nerf_data

    data_root = tmp_path / "root" / "data"
    monkeypatch.setattr(nerf_task, "DATA_PATH", data_root)
    monkeypatch.setattr(nerf_data, "DATA_PATH", data_root)

    process_scene.main([
        "--data-path", str(scene), "--scene-name", "toolscene",
        "--train-iters", "12", "--render-size", "32", "48",
        "--n-novel-views", "5", "--nerf-preset", "tiny",
    ])

    root = data_root / "NeRF" / "toolscene"
    imgs = sorted((root / "images").rglob("*.png"))
    depths = sorted((root / "depth").rglob("*.npy"))
    cams = sorted((root / "camera_transforms").rglob("*.npy"))
    assert len(imgs) == 5 and len(depths) == 5 and len(cams) == 5

    ds = NeRFDataset({"name": "NeRF", "data_dir": "toolscene",
                      "warped_pair": False}, "training")
    assert len(ds) == 4  # 80% split of 5 novel views
    sample = ds[0]
    assert sample["image"].shape == (32, 48, 1)
    assert sample["depth"].shape == (32, 48)
    assert sample["rotation"].shape == (3, 3)
