"""Fused Pallas descriptor sampling vs XLA onehot path, b64 480x640."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.kernels.desc_sample_pallas import sample_descriptors_fused
from spnerf_tpu.ops.fast_inference import sample_descriptors_onehot

B, Hc, Wc, C, K = 64, 60, 80, 256, 1000


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
    desc = jax.random.normal(key, (B, Hc, Wc, C), jnp.bfloat16)
    pts = jnp.stack([jax.random.uniform(key, (B, K)) * (Hc * 8 - 1),
                     jax.random.uniform(key, (B, K)) * (Wc * 8 - 1)], -1)

    f_ref = jax.jit(jax.vmap(lambda d, p: sample_descriptors_onehot(d, p, 8)))
    print(f"onehot XLA       : {timeit(f_ref, desc, pts):7.2f} ms")

    for bk in (128, 256, 512):
        f = jax.jit(lambda d, p, bk=bk: sample_descriptors_fused(
            d, p, 8, block_k=bk))
        try:
            t = timeit(f, desc, pts)
            print(f"pallas bk={bk:<4d}   : {t:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"pallas bk={bk:<4d}   : FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")

    ref = f_ref(desc, pts)
    got = sample_descriptors_fused(desc, pts, 8, block_k=256)
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    print(f"max |diff| vs XLA: {err:.4f}")


if __name__ == "__main__":
    main()
