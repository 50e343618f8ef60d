import cv2
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from spnerf_tpu.ops import (
    binary_erosion,
    box_nms,
    box_nms_greedy,
    compute_valid_mask,
    decode_detector_logits,
    depth_to_space,
    ellipse_kernel,
    space_to_depth,
    suppression_offsets,
    upsample_bicubic,
    warp_image,
)


def test_depth_to_space_matches_pixel_shuffle(rng):
    x = rng.standard_normal((2, 3, 4, 64)).astype(np.float32)
    got = depth_to_space(jnp.asarray(x), 8)
    # torch: NCHW
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = F.pixel_shuffle(xt, 8).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got)[..., None] if got.ndim == 3 else np.asarray(got),
                               expected, atol=1e-6)


def test_space_to_depth_matches_pixel_unshuffle(rng):
    x = rng.standard_normal((2, 24, 32, 1)).astype(np.float32)
    got = space_to_depth(jnp.asarray(x), 8)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = F.pixel_unshuffle(xt, 8).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def test_space_depth_roundtrip(rng):
    x = rng.standard_normal((1, 16, 16, 2)).astype(np.float32)
    got = depth_to_space(space_to_depth(jnp.asarray(x), 4), 4)
    np.testing.assert_allclose(np.asarray(got), x, atol=1e-6)


def test_upsample_bicubic_matches_torch(rng):
    x = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
    got = upsample_bicubic(jnp.asarray(x), 8)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = F.interpolate(xt, scale_factor=8, mode="bicubic",
                             align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("size", [2, 3, 4, 5, 6])
def test_ellipse_kernel_matches_cv2(size):
    expected = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
    got = ellipse_kernel(size)
    np.testing.assert_array_equal(got.astype(np.uint8), expected)


@pytest.mark.parametrize("size", [3, 4])
def test_binary_erosion_matches_cv2(rng, size):
    mask = (rng.uniform(size=(40, 50)) > 0.3).astype(np.float32)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
    expected = cv2.erode(mask, kernel.astype(np.uint8))
    got = binary_erosion(jnp.asarray(mask)[None], ellipse_kernel(size))[0]
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_warp_image_matches_cv2():
    # smooth image so interpolation differences stay tiny
    ys, xs = np.mgrid[0:60, 0:80].astype(np.float32)
    img = np.sin(ys / 7.0) + np.cos(xs / 9.0)
    H = np.array([[1.05, 0.02, -3.0], [-0.03, 0.98, 2.0], [1e-4, -5e-5, 1.0]],
                 np.float32)
    got = warp_image(jnp.asarray(img)[None, ..., None], jnp.asarray(H)[None])[0, ..., 0]
    expected = cv2.warpPerspective(img, H, (80, 60), flags=cv2.INTER_LINEAR,
                                   borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    # ignore a 2px border (cv2 handles edge pixels slightly differently)
    np.testing.assert_allclose(np.asarray(got)[2:-2, 2:-2], expected[2:-2, 2:-2],
                               atol=2e-2)


def test_compute_valid_mask_identity():
    H = jnp.eye(3)[None]
    mask = compute_valid_mask((30, 40), H, erosion=0)
    np.testing.assert_array_equal(np.asarray(mask), np.ones((1, 30, 40), np.int32))


def test_compute_valid_mask_translation_erodes():
    # translate +10 px in x: left 10 columns of dst are invalid
    H = jnp.array([[[1.0, 0.0, 10.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]])
    mask = np.asarray(compute_valid_mask((30, 40), H, erosion=0))[0]
    assert mask[:, :9].sum() == 0
    assert mask[:, 11:].min() == 1
    eroded = np.asarray(compute_valid_mask((30, 40), H, erosion=2))[0]
    assert eroded.sum() < mask.sum()
    assert eroded[15, 20] == 1


def _greedy_nms_numpy(prob, size, iou, min_prob, keep_top_k=0):
    """Oracle implementing torchvision.ops.nms greedy semantics on the
    boxes the reference builds in sp_utils.py:4-28."""
    pts = np.argwhere(prob >= min_prob).astype(np.float32)
    scores = prob[prob >= min_prob].astype(np.float32)
    half = size / 2.0
    boxes = np.concatenate([pts - half, pts + half], axis=1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(order), bool)
    for ii in order:
        if suppressed[ii]:
            continue
        keep.append(ii)
        y1, x1, y2, x2 = boxes[ii]
        yy1 = np.maximum(y1, boxes[:, 0])
        xx1 = np.maximum(x1, boxes[:, 1])
        yy2 = np.minimum(y2, boxes[:, 2])
        xx2 = np.minimum(x2, boxes[:, 3])
        inter = np.clip(yy2 - yy1, 0, None) * np.clip(xx2 - xx1, 0, None)
        area = (y2 - y1) * (x2 - x1)
        union = area + (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) - inter
        over = inter / union > iou
        over[ii] = False
        suppressed |= over
    keep = np.array(keep, np.int64)
    out_scores = scores[keep]
    out_pts = pts[keep].astype(np.int64)
    if keep_top_k and len(keep) > keep_top_k:
        sel = np.argsort(-out_scores)[:keep_top_k]
        out_scores, out_pts = out_scores[sel], out_pts[sel]
    out = np.zeros_like(prob)
    out[out_pts[:, 0], out_pts[:, 1]] = out_scores
    return out


def test_box_nms_greedy_matches_oracle(rng):
    prob = np.zeros((40, 40), np.float32)
    n = 60
    ys = rng.integers(0, 40, n)
    xs = rng.integers(0, 40, n)
    prob[ys, xs] = rng.uniform(0.02, 1.0, n).astype(np.float32)
    expected = _greedy_nms_numpy(prob, size=4, iou=0.1, min_prob=0.015)
    got = np.asarray(box_nms_greedy(jnp.asarray(prob), size=4, iou=0.1, min_prob=0.015))
    np.testing.assert_allclose(got, expected, atol=1e-6)


@pytest.mark.slow
def test_box_nms_fast_close_to_greedy(rng):
    prob = np.zeros((60, 60), np.float32)
    n = 80
    ys = rng.integers(0, 60, n)
    xs = rng.integers(0, 60, n)
    prob[ys, xs] = rng.uniform(0.02, 1.0, n).astype(np.float32)
    greedy = _greedy_nms_numpy(prob, size=4, iou=0.1, min_prob=0.015) > 0
    fast = np.asarray(box_nms(jnp.asarray(prob), size=4, iou=0.1, min_prob=0.015)) > 0
    # fast NMS must agree on the vast majority of kept points
    agree = (greedy & fast).sum()
    assert agree / max(greedy.sum(), 1) > 0.9
    # and every fast survivor is a greedy candidate
    assert fast.sum() <= greedy.sum() + 3


@pytest.mark.slow
def test_box_nms_top_k(rng):
    prob = np.zeros((32, 32), np.float32)
    prob[4, 4], prob[12, 12], prob[20, 20], prob[28, 28] = 0.9, 0.8, 0.7, 0.6
    out = np.asarray(box_nms(jnp.asarray(prob), size=4, iou=0.1, min_prob=0.1,
                             keep_top_k=2))
    assert (out > 0).sum() == 2
    assert out[4, 4] == pytest.approx(0.9)
    assert out[12, 12] == pytest.approx(0.8)


def test_suppression_offsets_symmetry():
    offs = suppression_offsets(4, 0.1)
    s = set(offs)
    assert (0, 0) not in s
    for dy, dx in offs:
        assert (-dy, -dx) in s
    assert (3, 0) in s and (2, 2) in s and (3, 3) not in s


def test_decode_detector_logits_matches_torch(rng):
    logits = rng.standard_normal((2, 3, 4, 65)).astype(np.float32)
    got = decode_detector_logits(jnp.asarray(logits), 8)
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    probs = torch.softmax(lt, dim=1)[:, :-1]
    expected = F.pixel_shuffle(probs, 8).squeeze(1).numpy()
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)
