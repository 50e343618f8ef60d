"""On-chip parity check: fused tail kernels vs the unfused serving chain.

The CPU interpret-mode tests (tests/test_tail_fused.py) pin the math;
this script re-checks it through the real Mosaic compile at the
production 480x640 shape (tiling bugs show up as wrong values only on
hardware). Prints PASS/FAIL per output.
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
from spnerf_tpu.ops.serving import ServingSuperPoint

H, W, B = 480, 640, 4


def main():
    cfg = SuperPointConfig(model_name="superpoint")
    _, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, H, W, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 1))
    ok = True
    for mode in ("int8", "bf16"):
        sp_f = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                       mode=mode, fused_tail=True)
        sp_u = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                       mode=mode, fused_tail=False)
        of = jax.jit(sp_f)(x)
        ou = jax.jit(sp_u)(x)
        for k in ("logits", "desc_raw"):
            a = np.asarray(of[k], np.float32)
            b = np.asarray(ou[k], np.float32)
            exact = np.array_equal(a, b)
            close = np.allclose(a, b, atol=0.05)
            print(f"{mode} {k}: exact={exact} close={close} "
                  f"maxdiff={np.max(np.abs(a - b)):.4g}")
            ok &= close if mode == "bf16" else exact
        # fused softmax decode: valid probabilities, pad lanes zero
        pr = np.asarray(jax.jit(lambda im: sp_f(im, softmax=True))(
            x)["probs_padded"], np.float32)
        s = pr[..., :64].sum(-1)
        print(f"{mode} probs_padded: sum in [{s.min():.3f}, {s.max():.3f}] "
              f"(<=1), pad zero={np.all(pr[..., 64:] == 0)}")
        ok &= bool(np.all(s <= 1.001) and np.all(pr[..., 64:] == 0))
    print("PARITY", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
