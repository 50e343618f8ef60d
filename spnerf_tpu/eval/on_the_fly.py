"""On-the-fly HPatches evaluation CLIs (no cached .npz artifacts).

Counterparts of reference evaluations/repeatability_evaluation_non_chached.py
and descriptor_evaluation_non_cached.py: run the model live over the
HPatches loader and print repeatability + localization error, or
homography-estimation correctness + matching score.

    python -m spnerf_tpu.eval.on_the_fly --config-path cfg.yaml \
        --mode repeatability [--k-points 300] [--distance-thresh 3]
    python -m spnerf_tpu.eval.on_the_fly --config-path cfg.yaml \
        --mode descriptors [--k-points 1000] [--correctness-thresh 3]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.data.hpatches import HPatches
from spnerf_tpu.data.loader import DataLoader
from spnerf_tpu.eval.descriptor import compute_homography_estimation
from spnerf_tpu.eval.detector import repeatability_pair
from spnerf_tpu.models.superpoint import superpoint_inference
from spnerf_tpu.utils.config import apply_overrides, load_config


def bootstrap_ci(values, n_boot=2000, alpha=0.05, seed=0):
    """Percentile bootstrap 95% CI of the mean over evaluation pairs.

    The demo corpus is small (~150 pairs); reporting the resampling
    interval makes round-over-round metric deltas interpretable (a
    ±several-point interval means a 2-point delta is noise).
    """
    vals = np.asarray(values, np.float64)
    if len(vals) < 2:
        return float("nan"), float("nan")
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(vals), (n_boot, len(vals)))
    means = vals[idx].mean(axis=1)
    lo, hi = np.quantile(means, [alpha / 2, 1 - alpha / 2])
    return float(lo), float(hi)


def _build(config):
    from spnerf_tpu.tasks.train_task import restore_pretrained
    from spnerf_tpu.utils.factories import get_model

    resize = config["data"]["preprocessing"]["resize"]
    input_shape = (1, int(resize[0]), int(resize[1]), 1)
    model, variables = get_model(config["model"], jax.random.PRNGKey(0),
                                 input_shape)
    variables, _ = restore_pretrained(config, variables)

    @jax.jit
    def infer(image):
        return superpoint_inference(model, variables, image)

    ds = HPatches(config["data"])
    loader = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    return infer, loader


def run_repeatability(config, k_points=300, distance_thresh=3):
    infer, loader = _build(config)
    reps, loc_errors = [], []
    for batch in loader:
        out1 = infer(jnp.asarray(batch["image"]))
        out2 = infer(jnp.asarray(batch["warped_image"]))
        prob1 = np.asarray(out1["prob_heatmap_nms"][0])
        prob2 = np.asarray(out2["prob_heatmap_nms"][0])
        H = np.asarray(batch["homography"][0])
        rep, _, _ = repeatability_pair(prob1, prob2, H, k_points, distance_thresh)
        if rep is not None:
            reps.append(rep)
    lo, hi = bootstrap_ci(reps)
    result = {"repeatability": float(np.mean(reps)) if reps else 0.0,
              "repeatability_ci95": [lo, hi],
              "pairs": len(reps)}
    print(f"repeatability: {result['repeatability']:.4f} "
          f"(95% CI [{lo:.4f}, {hi:.4f}]) over {result['pairs']} pairs")
    return result


def run_descriptors(config, k_points=1000, correctness_thresh=3.0):
    infer, loader = _build(config)
    correctness, mscores = [], []
    for batch in loader:
        out1 = infer(jnp.asarray(batch["image"]))
        out2 = infer(jnp.asarray(batch["warped_image"]))
        est = compute_homography_estimation(
            np.asarray(out1["prob_heatmap_nms"][0]),
            np.asarray(out2["prob_heatmap_nms"][0]),
            np.asarray(out1["desc"][0]),
            np.asarray(out2["desc"][0]),
            np.asarray(batch["homography"][0]),
            k_points, correctness_thresh,
        )
        correctness.append(est["correctness"])
        mscores.append(est["matching_score"])
    clo, chi = bootstrap_ci(correctness)
    mlo, mhi = bootstrap_ci(mscores)
    result = {
        "correctness": float(np.mean(correctness)) if correctness else 0.0,
        "correctness_ci95": [clo, chi],
        "matching_score": float(np.mean(mscores)) if mscores else 0.0,
        "matching_score_ci95": [mlo, mhi],
        "pairs": len(correctness),
    }
    print(f"correctness: {result['correctness']:.4f} "
          f"(95% CI [{clo:.4f}, {chi:.4f}])  "
          f"matching_score: {result['matching_score']:.4f} "
          f"(95% CI [{mlo:.4f}, {mhi:.4f}]) "
          f"over {result['pairs']} pairs")
    return result


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config-path", required=True)
    p.add_argument("--mode", choices=("repeatability", "descriptors"),
                   default="repeatability")
    p.add_argument("--k-points", type=int, default=None)
    p.add_argument("--distance-thresh", type=int, default=3)
    p.add_argument("--correctness-thresh", type=float, default=3.0)
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY.PATH=VALUE",
                   help="override a config key by dotted path (same "
                        "semantics as the main CLI)")
    p.add_argument("--json-out", default=None,
                   help="append the result as one JSON line (tagged with "
                        "mode and checkpoint) to this file")
    args = p.parse_args(argv)
    config = apply_overrides(load_config(args.config_path), args.overrides)
    if args.mode == "repeatability":
        result = run_repeatability(config, args.k_points or 300,
                                   args.distance_thresh)
    else:
        result = run_descriptors(config, args.k_points or 1000,
                                 args.correctness_thresh)
    if args.json_out:
        import json
        from pathlib import Path

        record = {"mode": args.mode,
                  "pretrained": config.get("pretrained"), **result}
        out = Path(args.json_out)
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "a") as f:
            f.write(json.dumps(record) + "\n")
    return result


if __name__ == "__main__":
    main()
