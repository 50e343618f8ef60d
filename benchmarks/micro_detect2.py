"""Whole detect_from_logits vs barrier variants on chip."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.ops.fast_inference import detect_from_logits, _suppress_and_select

B, Hc, Wc = 64, 60, 80


def timeit(fn, *a, iters=10):
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def detect_barrier(logits, grid_size=8, min_prob=0.015, size=4, iou=0.1,
                   num_candidates=1024, top_k=1000):
    B, Hc, Wc, _ = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :-1]
    flat = probs.reshape(B, -1)
    flat = jax.lax.optimization_barrier(flat)
    C = min(num_candidates, flat.shape[1])
    scores, idx = jax.lax.approx_max_k(flat, C, recall_target=0.95)
    scores, idx = jax.lax.optimization_barrier((scores, idx))
    g2 = grid_size * grid_size
    cell = idx // g2
    within = idx % g2
    ys = (cell // Wc * grid_size + within // grid_size).astype(jnp.float32)
    xs = (cell % Wc * grid_size + within % grid_size).astype(jnp.float32)
    return _suppress_and_select(ys, xs, scores, min_prob, size, iou, top_k)


def main():
    logits = jax.random.normal(jax.random.PRNGKey(0), (B, Hc, Wc, 65),
                               jnp.bfloat16)
    f0 = jax.jit(lambda l: detect_from_logits(l, 8, min_prob=0.015, size=4,
                                              top_k=1000, num_candidates=1024))
    print(f"detect (current) : {timeit(f0, logits):7.2f} ms")
    f1 = jax.jit(detect_barrier)
    print(f"detect (barrier) : {timeit(f1, logits):7.2f} ms")


if __name__ == "__main__":
    main()
