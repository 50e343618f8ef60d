"""Classical-feature baseline row for the GT relative-pose protocol.

Runs OpenCV SIFT (or ORB) through the exact same pose-evaluation driver
as the learned checkpoints (eval/pose.estimate_pose_errors: same pairs,
same mutual-NN matching, same RANSAC essential-matrix recovery, same
AUC/bootstrap), so the pose table gets a protocol-difficulty anchor
that is independent of any training in this repo. Analogue of the
classical baselines in the reference's pose-evaluation lineage
(pose_evaluation.py protocol).

Usage:
    python tools/pose_baseline_classical.py --config-path demo/configs/pose_demo.yaml \
        [--feature sift] [--json-out docs/evidence/pose_auc_results.jsonl]
"""

import argparse
import json
from pathlib import Path

import cv2
import numpy as np

from spnerf_tpu.eval.pose import estimate_pose_errors
from spnerf_tpu.settings import DATA_PATH
from spnerf_tpu.utils.config import apply_overrides, load_config


def build_infer(feature: str, max_kp: int):
    if feature == "sift":
        det = cv2.SIFT_create(nfeatures=max_kp)
    elif feature == "orb":
        det = cv2.ORB_create(nfeatures=max_kp)
    else:
        raise SystemExit(f"unknown feature: {feature}")

    def infer(image: np.ndarray):
        img_u8 = np.clip(image, 0, 255).astype(np.uint8)
        kps, desc = det.detectAndCompute(img_u8, None)
        prob = np.zeros(image.shape, np.float32)
        by_pixel = {}
        for kp, d in zip(kps or (), desc if desc is not None else ()):
            r = int(round(kp.pt[1])), int(round(kp.pt[0]))
            if not (0 <= r[0] < prob.shape[0] and 0 <= r[1] < prob.shape[1]):
                continue
            # collisions (several kps rounding to one pixel): keep strongest
            if kp.response >= prob[r]:
                prob[r] = max(kp.response, 1e-6)
                by_pixel[r] = np.asarray(d, np.float32)
        dim = len(next(iter(by_pixel.values()))) if by_pixel else 1

        def desc_at(pts):
            return np.stack([by_pixel[(int(y), int(x))] for y, x in pts]) \
                if len(pts) else np.zeros((0, dim), np.float32)

        return {"prob": prob, "desc": desc_at}

    return infer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-path", required=True)
    ap.add_argument("--feature", default="sift", choices=("sift", "orb"))
    ap.add_argument("--max-kp", type=int, default=1024)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--set", dest="overrides", action="append", default=[])
    args = ap.parse_args()

    config = apply_overrides(load_config(args.config_path), args.overrides)
    pairs_path = Path(DATA_PATH, config["data"]["gt_pairs"])
    pairs = [l.split() for l in pairs_path.read_text().splitlines() if l]

    infer = build_infer(args.feature, args.max_kp)
    results = estimate_pose_errors(config, infer, pairs)
    results["pretrained"] = f"baseline/{args.feature}"
    print("AUC@5\t AUC@10\t AUC@20\t Prec\t MScore")
    print(f"{results['auc5']:.2f}\t {results['auc10']:.2f}\t "
          f"{results['auc20']:.2f}\t {results['precision']:.2f}\t "
          f"{results['matching_score']:.2f}")
    if args.json_out:
        with open(args.json_out, "a") as f:
            f.write(json.dumps(results) + "\n")


if __name__ == "__main__":
    main()
