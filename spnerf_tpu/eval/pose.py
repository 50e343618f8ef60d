"""Relative pose estimation evaluation (ScanNet / YFCC pair lists).

Counterpart of reference evaluations/pose_evaluation.py:40-393
(SuperGlue-style protocol): per GT pair, detect+NMS+describe both
images, mutual-NN match, epipolar precision, essential-matrix RANSAC +
recoverPose, then AUC@{5,10,20} deg / precision / matching score.

The model forward runs on device (jitted, via the point-sampled
descriptor path); classical geometry (RANSAC, recoverPose) stays on
cv2/numpy on host. Run as:

    python -m spnerf_tpu.eval.pose --config-path configs/pose_estimation_indoor.yaml
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

from spnerf_tpu.eval.descriptor import mutual_nn_match
from spnerf_tpu.settings import CKPT_PATH, DATA_PATH


# ------------------------------------------------------- image/intrinsics


def process_resize(w: int, h: int, resize) -> tuple[int, int]:
    if len(resize) == 1 and resize[0] > -1:
        scale = resize[0] / max(h, w)
        return int(round(w * scale)), int(round(h * scale))
    if len(resize) == 1 and resize[0] == -1:
        return w, h
    return resize[0], resize[1]


def read_image(path, resize, rotation: int = 0, resize_float: bool = False):
    image = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if image is None:
        return None, None
    h, w = image.shape
    w_new, h_new = process_resize(w, h, resize)
    scales = (w / float(w_new), h / float(h_new))
    if resize_float:
        image = cv2.resize(image.astype("float32"), (w_new, h_new))
    else:
        image = cv2.resize(image, (w_new, h_new)).astype("float32")
    if rotation != 0:
        image = np.rot90(image, k=rotation)
        if rotation % 2:
            scales = scales[::-1]
    return image, scales


def scale_intrinsics(K: np.ndarray, scales) -> np.ndarray:
    return np.diag([1.0 / scales[0], 1.0 / scales[1], 1.0]) @ K


def rotate_intrinsics(K: np.ndarray, image_shape, rot: int) -> np.ndarray:
    assert rot <= 3
    h, w = image_shape[:2][:: -1 if (rot % 2) else 1]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    rot = rot % 4
    if rot == 1:
        return np.array([[fy, 0.0, cy], [0.0, fx, w - 1 - cx], [0.0, 0.0, 1.0]],
                        K.dtype)
    if rot == 2:
        return np.array(
            [[fx, 0.0, w - 1 - cx], [0.0, fy, h - 1 - cy], [0.0, 0.0, 1.0]],
            K.dtype,
        )
    return np.array([[fy, 0.0, h - 1 - cy], [0.0, fx, cx], [0.0, 0.0, 1.0]],
                    K.dtype)


def rotate_pose_inplane(i_T_w: np.ndarray, rot: int) -> np.ndarray:
    mats = [
        np.array(
            [[np.cos(r), -np.sin(r), 0, 0], [np.sin(r), np.cos(r), 0, 0],
             [0, 0, 1, 0], [0, 0, 0, 1]], np.float32,
        )
        for r in np.deg2rad([0, 270, 180, 90])
    ]
    return mats[rot] @ i_T_w


# ------------------------------------------------------------ pose metrics


def to_homogeneous(points):
    return np.concatenate([points, np.ones_like(points[:, :1])], axis=-1)


def compute_epipolar_error(kpts0, kpts1, T_0to1, K0, K1):
    """Symmetric squared epipolar distance in normalized coords."""
    kpts0 = (kpts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    kpts1 = (kpts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    kpts0 = to_homogeneous(kpts0)
    kpts1 = to_homogeneous(kpts1)
    t0, t1, t2 = T_0to1[:3, 3]
    t_skew = np.array([[0, -t2, t1], [t2, 0, -t0], [-t1, t0, 0]])
    E = t_skew @ T_0to1[:3, :3]
    Ep0 = kpts0 @ E.T
    p1Ep0 = np.sum(kpts1 * Ep0, -1)
    Etp1 = kpts1 @ E
    return p1Ep0**2 * (
        1.0 / (Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2)
        + 1.0 / (Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2)
    )


def estimate_pose(kpts0, kpts1, K0, K1, thresh, conf=0.99999):
    """Essential-matrix RANSAC + cheirality-best recoverPose."""
    if len(kpts0) < 5:
        return None
    f_mean = np.mean([K0[0, 0], K0[1, 1], K1[0, 0], K1[1, 1]])
    norm_thresh = thresh / f_mean
    kpts0 = (kpts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    kpts1 = (kpts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    E, mask = cv2.findEssentialMat(
        kpts0, kpts1, np.eye(3), threshold=norm_thresh, prob=conf,
        method=cv2.RANSAC,
    )
    if E is None:
        return None
    best = None
    best_n = 0
    for _E in np.split(E, len(E) / 3):
        n, R, t, _ = cv2.recoverPose(_E, kpts0, kpts1, np.eye(3), 1e9, mask=mask)
        if n > best_n:
            best_n = n
            best = (R, t[:, 0], mask.ravel() > 0)
    return best


def angle_error_mat(R1, R2):
    cos = np.clip((np.trace(R1.T @ R2) - 1) / 2, -1.0, 1.0)
    return np.rad2deg(np.abs(np.arccos(cos)))


def angle_error_vec(v1, v2):
    n = np.linalg.norm(v1) * np.linalg.norm(v2)
    return np.rad2deg(np.arccos(np.clip(np.dot(v1, v2) / n, -1.0, 1.0)))


def compute_pose_error(T_0to1, R, t):
    error_t = angle_error_vec(t, T_0to1[:3, 3])
    error_t = np.minimum(error_t, 180 - error_t)
    error_R = angle_error_mat(R, T_0to1[:3, :3])
    return error_t, error_R


def pose_auc(errors, thresholds):
    sort_idx = np.argsort(errors)
    errors = np.asarray(errors, np.float64)[sort_idx]
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0.0, errors]
    recall = np.r_[0.0, recall]
    aucs = []
    for t in thresholds:
        last = np.searchsorted(errors, t)
        r = np.r_[recall[:last], recall[last - 1]]
        e = np.r_[errors[:last], t]
        aucs.append(np.trapezoid(r, x=e) / t)
    return aucs


# -------------------------------------------------------------- matching


def top_keypoints_with_border(prob: np.ndarray, keep_k: int, border: int = 4):
    """(N, 3) [y, x, score] of top-k NMS'd detections away from borders
    (reference pose_evaluation.py:30-57)."""
    h, w = prob.shape
    ys, xs = np.where(prob > 0)
    scores = prob[ys, xs]
    pts = np.stack([ys, xs, scores], -1)
    m = (
        (pts[:, 0] >= border) & (pts[:, 0] < h - border)
        & (pts[:, 1] >= border) & (pts[:, 1] < w - border)
    )
    pts = pts[m]
    order = pts[:, 2].argsort()
    return pts[order][-min(keep_k, len(pts)):, :2].astype(int)


def match_pair(prob0, prob1, desc0, desc1, keep_k=1024):
    """Mutual-NN match of top-k detections. desc*: dense (H, W, C) maps
    or callables (pts -> (N, C)) for the point-sampled path."""
    k0 = top_keypoints_with_border(prob0, keep_k)
    k1 = top_keypoints_with_border(prob1, keep_k)
    if len(k0) == 0 or len(k1) == 0:
        return np.zeros((0, 2)), np.zeros((0, 2)), k0
    d0 = desc0(k0) if callable(desc0) else desc0[k0[:, 0], k0[:, 1]]
    d1 = desc1(k1) if callable(desc1) else desc1[k1[:, 0], k1[:, 1]]
    i0, i1 = mutual_nn_match(d0.astype(np.float32), d1.astype(np.float32))
    # (x, y) ordering for cv2
    return k0[i0][:, ::-1].astype(np.float64), k1[i1][:, ::-1].astype(np.float64), k0


# ------------------------------------------------------------------ driver


def estimate_pose_errors(config: dict, infer_fn, pairs: list[list[str]]):
    """infer_fn(image float32 (H, W) in [0,255]) ->
    {"prob": (H, W) NMS heatmap, "desc": (H, W, C) or callable}."""
    top_k = config["model"]["detector_head"].get("top_k", 1024)
    epi_thresh = config["data"].get("epi_thrsehold",
                                    config["data"].get("epi_threshold", 5e-4))
    resize = config["data"]["resize"]
    resize_float = config["data"].get("resize_float", False)
    images_root = Path(DATA_PATH, config["data"]["images_path"])

    pose_errors, precisions, mscores = [], [], []
    for pair in pairs:
        name0, name1 = pair[:2]
        rot0, rot1 = (int(pair[2]), int(pair[3])) if len(pair) >= 5 else (0, 0)
        image0, scales0 = read_image(images_root / name0, resize, rot0, resize_float)
        image1, scales1 = read_image(images_root / name1, resize, rot1, resize_float)
        if image0 is None or image1 is None:
            continue

        out0 = infer_fn(image0)
        out1 = infer_fn(image1)
        mk0, mk1, k0 = match_pair(out0["prob"], out1["prob"],
                                  out0["desc"], out1["desc"], top_k)

        K0 = np.array(pair[4:13], float).reshape(3, 3)
        K1 = np.array(pair[13:22], float).reshape(3, 3)
        T_0to1 = np.array(pair[22:38], float).reshape(4, 4)
        K0 = scale_intrinsics(K0, scales0)
        K1 = scale_intrinsics(K1, scales1)
        if rot0 != 0 or rot1 != 0:
            cam0_T_w = np.eye(4)
            cam1_T_w = T_0to1
            if rot0 != 0:
                K0 = rotate_intrinsics(K0, image0.shape, rot0)
                cam0_T_w = rotate_pose_inplane(cam0_T_w, rot0)
            if rot1 != 0:
                K1 = rotate_intrinsics(K1, image1.shape, rot1)
                cam1_T_w = rotate_pose_inplane(cam1_T_w, rot1)
            T_0to1 = cam1_T_w @ np.linalg.inv(cam0_T_w)

        if len(mk0):
            epi_errs = compute_epipolar_error(mk0, mk1, T_0to1, K0, K1)
            correct = epi_errs < epi_thresh
            precision = float(np.mean(correct)) if len(correct) else 0.0
            mscore = float(np.sum(correct) / len(k0)) if len(k0) else 0.0
        else:
            precision = mscore = 0.0

        ret = estimate_pose(mk0, mk1, K0, K1, thresh=1.0)
        if ret is None:
            err_t = err_R = np.inf
        else:
            R, t, _ = ret
            err_t, err_R = compute_pose_error(T_0to1, R, t)

        pose_errors.append(max(err_t, err_R))
        precisions.append(precision)
        mscores.append(mscore)

    thresholds = [5, 10, 20]
    aucs = [100.0 * a for a in pose_auc(pose_errors, thresholds)]
    return {
        "auc5": aucs[0], "auc10": aucs[1], "auc20": aucs[2],
        "precision": 100.0 * float(np.mean(precisions)) if precisions else 0.0,
        "matching_score": 100.0 * float(np.mean(mscores)) if mscores else 0.0,
        "num_pairs": len(pose_errors),
    }


def build_infer_fn(config: dict):
    """Jitted per-image inference returning NMS heatmap + point-sampled
    descriptor closure."""
    import jax
    import jax.numpy as jnp

    from spnerf_tpu.ops.descriptor_sampling import sample_descriptors
    from spnerf_tpu.tasks.train_task import restore_pretrained
    from spnerf_tpu.utils.factories import get_model

    resize = config["data"]["resize"]
    # resize is (W, H) in SuperGlue convention
    input_shape = (1, int(resize[1]), int(resize[0]), 1)
    model, variables = get_model(config["model"], __import__("jax").random.PRNGKey(0),
                                 input_shape)
    variables, _ = restore_pretrained(config, variables)

    from spnerf_tpu.models.superpoint import superpoint_inference

    @jax.jit
    def run(image):
        return superpoint_inference(model, variables, image)

    @jax.jit
    def sample(desc_raw, pts):
        return sample_descriptors(desc_raw, pts, model.config.grid_size)

    def infer(image_f32):
        x = jnp.asarray(image_f32 / 255.0)[None, ..., None]
        out = run(x)
        prob = np.asarray(out["prob_heatmap_nms"][0])
        desc_raw = out["desc_raw"][0]

        def desc_at(pts):
            return np.asarray(sample(desc_raw, jnp.asarray(pts, jnp.float32)))

        return {"prob": prob, "desc": desc_at}

    return infer


def main(argv=None):
    from spnerf_tpu.utils.config import load_config

    p = argparse.ArgumentParser()
    p.add_argument("--config-path", required=True)
    p.add_argument("--max-length", type=int, default=-1)
    p.add_argument("--shuffle", action="store_true")
    args = p.parse_args(argv)
    config = load_config(args.config_path)

    pairs_path = Path(DATA_PATH, config["data"]["gt_pairs"])
    with open(pairs_path) as f:
        pairs = [l.split() for l in f.readlines()]
    if args.shuffle:
        import random

        random.Random(0).shuffle(pairs)
    if args.max_length > -1:
        pairs = pairs[: args.max_length]

    infer = build_infer_fn(config)
    results = estimate_pose_errors(config, infer, pairs)
    print("AUC@5\t AUC@10\t AUC@20\t Prec\t MScore")
    print("{auc5:.2f}\t {auc10:.2f}\t {auc20:.2f}\t {precision:.2f}\t "
          "{matching_score:.2f}".format(**results))
    return results


if __name__ == "__main__":
    main()
