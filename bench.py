"""Benchmark: SuperPoint inference throughput at 480x640 on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

Baseline target (BASELINE.md): >= 5,000 frames/sec/chip on TPU v5e.

Protocol: full production inference through the int8 Pallas serving
stack (ops/serving.ServingSuperPoint): BN-folded VGG backbone + heads as
row-band MXU conv kernels (W-pair packing for the C=64 layers, int8
weights/activations calibrated PTQ, fused requantization), a fused
banded-Toeplitz conv1+conv2+pool entry kernel, fused tail kernels
(blocks 7-8 + each head incl. the in-kernel softmax decode,
kernels/tail_fused_pallas.py), candidate extraction straight off the
padded probabilities (ops/fast_inference.detect_from_probs_padded),
candidate NMS masking WITHOUT top-k compaction (top_k == num_candidates
== 1024, so the skipped compaction sort is provably a no-op: suppressed
candidates are masked by `valid`), and bicubic descriptor sampling AT
keypoints as one combined-weight MXU matmul (sample_descriptors_onehot)
— the TPU-native equivalent of the reference's dense x8 upsample path
(reference heads.py:17-68).

The headline is the int8 serving stack; the same capture also times the
bf16 stack (quality-assured labels) and reports it as "bf16_fps".
Set SPNERF_BENCH_MODE=bf16 to flip which one is the headline.
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128));"
    "(x @ x).block_until_ready();"
    "print('PROBE_OK', jax.devices()[0].platform)"
)


def wait_for_backend(max_wait_s: float, probe_timeout_s: float = 120.0,
                     retry_s: float = 30.0) -> bool:
    """Gate on a tiny-matmul probe in a SUBPROCESS (the tunneled TPU has
    two outage modes: fast init failure and a hang where even importing
    jax blocks — a subprocess + timeout survives both; in-process retry
    would not, since jax caches a failed backend). Retries until the
    probe passes or ``max_wait_s`` elapses."""
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=probe_timeout_s,
                env=os.environ.copy(),
            )
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                return True
            detail = (r.stderr or r.stdout).strip().splitlines()
            detail = detail[-1] if detail else "rc=%d" % r.returncode
        except subprocess.TimeoutExpired:
            detail = f"probe timed out after {probe_timeout_s:.0f}s"
        remaining = deadline - time.monotonic()
        print(f"[bench] backend probe {attempt} failed ({detail}); "
              f"{remaining:.0f}s of retry budget left", file=sys.stderr)
        if remaining <= retry_s:
            return False
        time.sleep(retry_s)


if not wait_for_backend(float(os.environ.get("SPNERF_BENCH_MAX_WAIT_S",
                                             "1800"))):
    # one parseable line instead of a stack trace; nonzero rc marks the
    # capture as failed without erasing why
    print(json.dumps({"metric": "superpoint_inference_480x640",
                      "error": "TPU backend unavailable after probe retries"}))
    sys.exit(1)

import jax
import jax.numpy as jnp

from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
from spnerf_tpu.ops.fast_inference import (
    detect_from_logits,
    detect_from_probs_padded,
    sample_descriptors_onehot,
)
from spnerf_tpu.ops.serving import ServingSuperPoint

H, W = 480, 640
BATCH = int(os.environ.get("SPNERF_BENCH_BATCH", "64"))
# top_k == num_candidates: the fused-tail path skips the top-k
# compaction sort (compact=False), which is only contract-preserving
# when no candidate can be dropped by compaction (ADVICE r4)
TOP_K = 1024
BASELINE_FPS = 5000.0


def build_inference(config: SuperPointConfig, variables, calib, mode,
                    fused_mid=True, fused_tail=True):
    sp = ServingSuperPoint.build(config, variables, calib_images=calib,
                                 mode=mode, fused_mid=fused_mid,
                                 fused_tail=fused_tail)
    cfg = config

    @jax.jit
    def infer(image):
        if fused_tail:
            out = sp(image, softmax=True)
            # compact=False: skip the exact top-k compaction sort — with
            # top_k == num_candidates the sort is a pure permutation, so
            # the (point, score, valid) SET is identical by construction
            # (saves 1.4 ms at b64, micro_tail.py)
            pts, scores, valid = detect_from_probs_padded(
                out["probs_padded"], cfg.grid_size, min_prob=cfg.det_thresh,
                size=cfg.nms, top_k=TOP_K, num_candidates=TOP_K,
                compact=False,
            )
        else:
            out = sp(image)
            pts, scores, valid = detect_from_logits(
                out["logits"], cfg.grid_size, min_prob=cfg.det_thresh,
                size=cfg.nms, top_k=TOP_K, num_candidates=1024,
            )
        desc = jax.vmap(
            lambda d, p: sample_descriptors_onehot(d, p, cfg.grid_size)
        )(out["desc_raw"], pts)
        return pts, scores, valid, desc

    return infer


def measure(mode, cfg, variables, x):
    import numpy as np

    want_mid = os.environ.get("SPNERF_BENCH_FUSED_MID", "1") == "1"
    # degrade through the fusion matrix if a fused kernel fails to
    # compile on this backend — a bench number always lands
    attempts = [(want_mid, True), (False, True), (want_mid, False),
                (False, False)]
    infer = None
    plan = list(dict.fromkeys(attempts))
    fm = ft = None
    for i, (fm, ft) in enumerate(plan):
        infer = build_inference(cfg, variables, x[:8], mode,
                                fused_mid=fm, fused_tail=ft)
        try:
            np.asarray(infer(x)[1])  # warmup / compile + materialize
            break
        except Exception as e:
            # never silently bench a less-fused graph: say which config
            # failed and why so round-over-round numbers stay comparable
            print(f"[bench] mode={mode} fused_mid={fm} fused_tail={ft} "
                  f"failed to compile/run: {type(e).__name__}: {e}",
                  file=sys.stderr)
            if i == len(plan) - 1:
                raise

    n_iters = int(os.environ.get("SPNERF_BENCH_ITERS", "40"))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = infer(x)
    # force materialization: block_until_ready alone is unreliable on the
    # tunneled platform
    np.asarray(out[1])
    dt = time.perf_counter() - t0
    return BATCH * n_iters / dt, fm, ft


def main():
    mode = os.environ.get("SPNERF_BENCH_MODE", "int8")
    cfg = SuperPointConfig(model_name="superpoint", det_thresh=0.015)
    _, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, H, W, 1))

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, H, W, 1))
    fps, fm, ft = measure(mode, cfg, variables, x)
    record = {
        "metric": "superpoint_inference_480x640",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "mode": mode,
        "fused_mid": fm,
        "fused_tail": ft,
    }
    # co-report the other precision (VERDICT r4 #3): int8 is the speed
    # headline, bf16 the quality-assured stack — one capture shows both
    other = "bf16" if mode == "int8" else "int8"
    if os.environ.get("SPNERF_BENCH_COREPORT", "1") == "1":
        try:
            other_fps, _, _ = measure(other, cfg, variables, x)
            record[f"{other}_fps"] = round(other_fps, 2)
        except Exception as e:
            print(f"[bench] co-report mode={other} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
