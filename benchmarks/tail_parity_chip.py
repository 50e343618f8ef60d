"""On-chip parity check: fused serving kernels vs the unfused chain.

The CPU interpret-mode tests (tests/test_tail_fused.py,
tests/test_mid_fused.py) pin the math; this script re-checks it through
the real Mosaic compile at the production 480x640 shape (tiling bugs
show up as wrong values only on hardware). Sweeps the fusion matrix —
(fused_mid, fused_tail) in {FF, TF, FT, TT} — against the fully unfused
chain, then checks the fused softmax decode. Prints PASS/FAIL.
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
        base = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                       mode=mode, fused_tail=False,
                                       fused_mid=False)
        ou = jax.jit(base)(x)
        fused_full = None
        for fm, ft in ((True, False), (False, True), (True, True)):
            sp_f = ServingSuperPoint.build(cfg, variables, calib_images=x,
                                           mode=mode, fused_tail=ft,
                                           fused_mid=fm)
            try:
                of = jax.jit(sp_f)(x)
            except Exception as e:
                print(f"{mode} mid={fm} tail={ft}: COMPILE/RUN FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}")
                ok = False
                continue
            if fm and ft:
                fused_full = sp_f
            for k in ("logits", "desc_raw"):
                a = np.asarray(of[k], np.float32)
                b = np.asarray(ou[k], np.float32)
                exact = np.array_equal(a, b)
                close = np.allclose(a, b, atol=0.05)
                print(f"{mode} mid={fm} tail={ft} {k}: exact={exact} "
                      f"close={close} maxdiff={np.max(np.abs(a - b)):.4g}")
                ok &= close if mode == "bf16" else exact
        # fused softmax decode: valid probabilities, pad lanes zero
        if fused_full is not None:
            pr = np.asarray(jax.jit(
                lambda im: fused_full(im, softmax=True))(x)["probs_padded"],
                np.float32)
            s = pr[..., :64].sum(-1)
            print(f"{mode} probs_padded: sum in [{s.min():.3f}, "
                  f"{s.max():.3f}] (<=1), pad zero="
                  f"{np.all(pr[..., 64:] == 0)}")
            ok &= bool(np.all(s <= 1.001) and np.all(pr[..., 64:] == 0))
    print("PARITY", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
