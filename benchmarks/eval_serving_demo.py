"""HPatches-protocol eval THROUGH the int8 Pallas serving stack.

Runs the round-2 demo checkpoint over the fabricated viewpoint scenes
twice — once through the float training graph (the numbers in
docs/evidence/demo_r2_results.md) and once through
ops/serving.ServingSuperPoint in int8 — using the identical decode +
NMS + dense-descriptor eval protocol. Proves the production serving
path preserves task quality, not just activation-level tolerances.

Usage: SPNERF_ROOT=/root/repo/runs python benchmarks/eval_serving_demo.py
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.data.hpatches import HPatches
from spnerf_tpu.eval.descriptor import compute_homography_estimation
from spnerf_tpu.eval.detector import repeatability_pair
from spnerf_tpu.models.superpoint import (
    superpoint_inference,
    upsample_bicubic,
)
from spnerf_tpu.ops.detector_decode import decode_detector_logits
from spnerf_tpu.ops.nms import box_nms
from spnerf_tpu.ops.serving import ServingSuperPoint
from spnerf_tpu.tasks.train_task import restore_pretrained
from spnerf_tpu.utils.config import load_config
from spnerf_tpu.utils.factories import get_model


def build_paths(config):
    resize = config["data"]["preprocessing"]["resize"]
    model, variables = get_model(config["model"], jax.random.PRNGKey(0),
                                 (1, int(resize[0]), int(resize[1]), 1))
    variables, _ = restore_pretrained(config, variables)
    cfg = model.config

    @jax.jit
    def float_infer(image):
        return superpoint_inference(model, variables, image)

    ds = HPatches(config["data"])
    calib = jnp.stack([jnp.asarray(ds[i]["image"]) for i in range(4)])
    sp = ServingSuperPoint.build(cfg, variables, calib_images=calib,
                                 mode="int8")

    @jax.jit
    def serving_infer(image):
        out = sp(image)
        prob = decode_detector_logits(out["logits"].astype(jnp.float32),
                                      cfg.grid_size)
        prob_nms = jax.vmap(lambda p: box_nms(
            p, size=cfg.nms, iou=0.1, min_prob=cfg.det_thresh,
            keep_top_k=cfg.top_k))(prob)
        desc = upsample_bicubic(out["desc_raw"].astype(jnp.float32),
                                cfg.grid_size)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12)
        return {"prob_heatmap_nms": prob_nms, "desc": desc}

    return float_infer, serving_infer, ds


def evaluate(infer, ds, k_rep=300, k_desc=1000):
    reps, corr, ms = [], [], []
    for i in range(len(ds)):
        s = ds[i]
        o1 = infer(jnp.asarray(s["image"])[None])
        o2 = infer(jnp.asarray(s["warped_image"])[None])
        p1 = np.asarray(o1["prob_heatmap_nms"][0])
        p2 = np.asarray(o2["prob_heatmap_nms"][0])
        H = np.asarray(s["homography"])
        rep, _, _ = repeatability_pair(p1, p2, H, k_rep, 3)
        if rep is not None:
            reps.append(rep)
        est = compute_homography_estimation(
            p1, p2, np.asarray(o1["desc"][0]), np.asarray(o2["desc"][0]),
            H, k_desc, 3.0)
        corr.append(est["correctness"])
        ms.append(est["matching_score"])
    return (float(np.mean(reps)), float(np.mean(corr)), float(np.mean(ms)),
            len(corr))


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", default=None,
                    help="checkpoint override (e.g. demo_sp_ctl/...)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    config = load_config("demo/configs/eval_demo.yaml")
    if args.pretrained:
        config["pretrained"] = args.pretrained
    float_infer, serving_infer, ds = build_paths(config)
    rows = []
    for tag, fn in (("float f32 graph", float_infer),
                    ("int8 Pallas serving", serving_infer)):
        rep, corr, ms, n = evaluate(fn, ds)
        print(f"{tag:20s}: repeatability {rep:.4f}  correctness {corr:.4f}"
              f"  matching_score {ms:.4f}  ({n} pairs)")
        rows.append({"metric": "serving_requalify", "stack": tag,
                     "pretrained": config.get("pretrained"),
                     "repeatability": round(rep, 4),
                     "correctness": round(corr, 4),
                     "matching_score": round(ms, 4), "n_pairs": n})
    if args.json_out:
        with open(args.json_out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
