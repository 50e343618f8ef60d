"""Sub-op timing of detect_from_logits on chip."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp
import numpy as np

B, Hc, Wc = 64, 60, 80
C, K = 1024, 1000


def timeit(fn, *a, iters=10):
    out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    logits = jax.random.normal(jax.random.PRNGKey(0), (B, Hc, Wc, 65),
                               jnp.bfloat16)

    f_soft = jax.jit(lambda l: jax.nn.softmax(
        l.astype(jnp.float32), axis=-1)[..., :-1].reshape(B, -1))
    print(f"softmax+flat     : {timeit(f_soft, logits):7.2f} ms")
    flat = f_soft(logits)

    f_amk = jax.jit(lambda f: jax.lax.approx_max_k(f, C, recall_target=0.95))
    print(f"approx_max_k     : {timeit(f_amk, flat):7.2f} ms")
    scores, idx = f_amk(flat)

    f_tk = jax.jit(lambda f: jax.lax.top_k(f, C))
    print(f"exact top_k(C)   : {timeit(f_tk, flat):7.2f} ms")

    def pairwise(scores, idx):
        ys = (idx // (Wc * 64)).astype(jnp.float32)
        xs = (idx % (Wc * 64)).astype(jnp.float32)
        dy = jnp.abs(ys[:, :, None] - ys[:, None, :])
        dx = jnp.abs(xs[:, :, None] - xs[:, None, :])
        inter = jnp.maximum(0.0, 4 - dy) * jnp.maximum(0.0, 4 - dx)
        overlap = inter / (32.0 - inter) > 0.1
        stronger = scores[:, None, :] > scores[:, :, None]
        sup = jnp.any(overlap & stronger, axis=-1)
        kept = jnp.where(sup, -jnp.inf, scores)
        return jax.lax.top_k(kept, K)

    f_pw = jax.jit(pairwise)
    print(f"pairwise+topk    : {timeit(f_pw, scores, idx):7.2f} ms")


if __name__ == "__main__":
    main()
