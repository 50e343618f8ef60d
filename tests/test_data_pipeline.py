"""Host data pipeline: preprocessing, photometric aug, loader, drawing."""

import numpy as np
import pytest

from spnerf_tpu.data.loader import DataLoader, collate
from spnerf_tpu.data.photometric import PRIMITIVES as PHOTO_PRIMS, PhotometricAug
from spnerf_tpu.data.preprocessing import (
    adapt_homography_to_ratio_resize,
    ratio_preserving_resize,
)
from spnerf_tpu.data.synthetic_draw import PRIMITIVES, generate_sample


def test_ratio_preserving_resize_shapes(rng):
    img = rng.uniform(0, 255, (300, 500)).astype(np.float32)
    out = ratio_preserving_resize(img, (240, 320))
    assert out.shape == (240, 320)
    # portrait input
    out2 = ratio_preserving_resize(rng.uniform(0, 255, (500, 300)).astype(np.float32), (240, 320))
    assert out2.shape == (240, 320)


def test_adapt_homography_consistency(rng):
    """A point correspondence under H must be preserved by the adapted H
    in resized coordinates."""
    import cv2

    H = np.array([[1.05, 0.02, 8.0], [-0.01, 0.98, -5.0], [1e-4, 0, 1.0]])
    src_shape, wsrc_shape, target = (300, 400), (280, 360), (240, 320)

    def to_resized(p_xy, orig, tgt):
        s = max(tgt[0] / orig[0], tgt[1] / orig[1])
        pad_x = (orig[1] * s - tgt[1]) / 2
        pad_y = (orig[0] * s - tgt[0]) / 2
        return np.array([p_xy[0] * s - int(pad_x), p_xy[1] * s - int(pad_y)])

    H2 = adapt_homography_to_ratio_resize(H, src_shape, wsrc_shape, target)
    p = np.array([200.0, 150.0, 1.0])  # (x, y, 1) in original image
    q = H @ p
    q = q[:2] / q[2]
    p_r = to_resized(p[:2], src_shape, target)
    q_r = to_resized(q, wsrc_shape, target)
    qr_est = H2 @ np.array([p_r[0], p_r[1], 1.0])
    qr_est = qr_est[:2] / qr_est[2]
    np.testing.assert_allclose(qr_est, q_r, atol=1.5)  # int crop rounding


def test_photometric_primitives_stay_in_range(rng):
    aug = PhotometricAug({"primitives": list(PHOTO_PRIMS), "params": {}})
    img = rng.uniform(0, 255, (60, 80)).astype(np.uint8)
    out = aug(img, rng)
    assert out.shape == img.shape
    assert out.dtype == np.float32
    assert out.min() >= 0 and out.max() <= 255


@pytest.mark.parametrize("primitive", PRIMITIVES)
def test_drawing_primitives(primitive, rng):
    img, pts = generate_sample(primitive, rng, image_size=(120, 160))
    assert img.shape == (120, 160)
    assert img.dtype == np.uint8
    assert pts.ndim == 2 and pts.shape[1] == 2
    if len(pts):
        assert pts[:, 0].min() >= 0 and pts[:, 0].max() < 120
        assert pts[:, 1].min() >= 0 and pts[:, 1].max() < 160
    if primitive in ("draw_polygon", "draw_star", "draw_checkerboard"):
        assert len(pts) >= 3  # corner-bearing primitives must emit corners


class _ToyDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), float(i), np.float32), "idx": np.int64(i)}


def test_loader_batching_and_order():
    loader = DataLoader(_ToyDataset(10), batch_size=4, shuffle=False,
                        drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    np.testing.assert_array_equal(batches[0]["idx"], [0, 1, 2, 3])
    assert batches[0]["x"].shape == (4, 3)


def test_loader_drop_last_false():
    loader = DataLoader(_ToyDataset(10), batch_size=4, shuffle=False,
                        drop_last=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["x"].shape == (2, 3)


def test_loader_num_workers_same_content():
    a = [b["idx"].tolist() for b in DataLoader(_ToyDataset(12), 4, shuffle=False,
                                               drop_last=False)]
    b = [b["idx"].tolist() for b in DataLoader(_ToyDataset(12), 4, shuffle=False,
                                               drop_last=False, num_workers=4)]
    assert a == b


def test_loader_propagates_exceptions():
    class Bad(_ToyDataset):
        def __getitem__(self, i):
            raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        list(DataLoader(Bad(4), 2, shuffle=False))


def test_collate_nested():
    out = collate([{"a": {"b": np.ones(2)}}, {"a": {"b": np.zeros(2)}}])
    assert out["a"]["b"].shape == (2, 2)
