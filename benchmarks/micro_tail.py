"""Sub-op timing of the inference tail at b64 480x640: where do the
detect 9.7 ms and desc-sample 8.6 ms (stage_breakdown_r4) actually go?

Questions this answers on chip:
  1. approx_max_k over the 128-lane padded layout vs sliced 64 lanes.
  2. pairwise NMS vs the exact top_k(1000 of 1024) compaction step.
  3. desc sampling: W2 outer-product build vs the (K,4800)@(4800,256)
     matmul vs the normalize epilogue.
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.ops.fast_inference import (
    _axis_weight_matrix, _suppress_and_select)

B, Hc, Wc, Cd = 64, 60, 80, 256
L, C, K = 128, 1024, 1000


def timeit(fn, *a, iters=20):
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    probs = jax.nn.softmax(jax.random.normal(
        key, (B, Hc, Wc, 65), jnp.float32), -1)[..., :64]
    padded = jnp.pad(probs, ((0, 0),) * 3 + ((0, L - 64),)).astype(jnp.bfloat16)

    # 1. approx_max_k input-width sensitivity
    f_pad = jax.jit(lambda p: jax.lax.approx_max_k(
        p.reshape(B, -1), C, recall_target=0.95))
    f_sliced = jax.jit(lambda p: jax.lax.approx_max_k(
        p[..., :64].reshape(B, -1), C, recall_target=0.95))
    print(f"amk padded 128L  : {timeit(f_pad, padded):7.2f} ms")
    print(f"amk slice->64L   : {timeit(f_sliced, padded):7.2f} ms")

    scores, idx = f_pad(padded)
    scores = scores.astype(jnp.float32)
    cell = idx // L
    within = idx % L
    ys = (cell // Wc * 8 + within // 8).astype(jnp.float32)
    xs = (cell % Wc * 8 + within % 8).astype(jnp.float32)

    # 2. suppression vs the top_k compaction
    def suppress_only(ys, xs, scores):
        cand_valid = scores >= 0.015
        dy = jnp.abs(ys[:, :, None] - ys[:, None, :])
        dx = jnp.abs(xs[:, :, None] - xs[:, None, :])
        inter = jnp.maximum(0.0, 4.0 - dy) * jnp.maximum(0.0, 4.0 - dx)
        overlap = inter / (32.0 - inter) > 0.1
        stronger = scores[:, None, :] > scores[:, :, None]
        sup = jnp.any(overlap & stronger & cand_valid[:, None, :], -1)
        keep = cand_valid & ~sup
        return jnp.where(keep, scores, -jnp.inf)

    f_sup = jax.jit(suppress_only)
    f_full = jax.jit(lambda y, x, s: _suppress_and_select(
        y, x, s, 0.015, 4, 0.1, K))
    kept = f_sup(ys, xs, scores)
    f_tk = jax.jit(lambda ks: jax.lax.top_k(ks, K))
    print(f"suppress only    : {timeit(f_sup, ys, xs, scores):7.2f} ms")
    print(f"topk(1000/1024)  : {timeit(f_tk, kept):7.2f} ms")
    print(f"suppress+select  : {timeit(f_full, ys, xs, scores):7.2f} ms")

    # 3. desc sampling sub-ops (batched over B like bench.py's vmap)
    desc = jax.random.normal(key, (B, Hc, Wc, Cd), jnp.bfloat16)
    pts = jnp.stack([jax.random.uniform(key, (B, K)) * (Hc * 8 - 1),
                     jax.random.uniform(key, (B, K)) * (Wc * 8 - 1)], -1)

    def weights_only(points):
        Wy = _axis_weight_matrix(points[:, 0], Hc, 8)
        Wx = _axis_weight_matrix(points[:, 1], Wc, 8)
        return (Wy[:, :, None] * Wx[:, None, :]).reshape(K, Hc * Wc)

    f_w = jax.jit(jax.vmap(weights_only))
    W2 = f_w(pts).astype(jnp.bfloat16)
    print(f"W2 build (b64)   : {timeit(f_w, pts):7.2f} ms")

    f_mm = jax.jit(lambda w, d: jnp.einsum(
        "bkn,bnc->bkc", w, d.reshape(B, Hc * Wc, Cd),
        preferred_element_type=jnp.float32))
    print(f"W2@desc matmul   : {timeit(f_mm, W2, desc):7.2f} ms")

    out = f_mm(W2, desc)
    f_norm = jax.jit(lambda o: o / (jnp.linalg.norm(o, axis=-1,
                                                    keepdims=True) + 1e-12))
    print(f"normalize        : {timeit(f_norm, out):7.2f} ms")


if __name__ == "__main__":
    main()
