"""Per-stage timing of the assembled serving pipeline on chip."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp
import numpy as np

from spnerf_tpu.models.superpoint import SuperPointConfig, init_superpoint
from spnerf_tpu.ops.fast_inference import (
    detect_from_logits, sample_descriptors_matmul,
)
from spnerf_tpu.ops.serving import ServingSuperPoint, _BACKBONE, _maxpool_plain
from spnerf_tpu.kernels.conv_stack_pallas import (
    conv3x3_pallas, dot_bias_act_pallas, maxpool2x2_packed,
    packed_conv3x3_pallas, unpack_pairs,
)

H, W, B = 480, 640, 64


def sync(o):
    np.asarray(jax.tree.leaves(o)[0].ravel()[:1])


def timeit(fn, *a, iters=5):
    out = fn(*a)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = SuperPointConfig(model_name="superpoint", det_thresh=0.015)
    _, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, H, W, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 1))
    sp = ServingSuperPoint.build(cfg, variables, calib_images=x[:8],
                                 mode="int8")

    total = 0.0
    # conv1
    f = jax.jit(lambda img: sp._conv1(img, jnp.int8)[0])
    dt = timeit(f, x)
    total += dt
    print(f"conv1            : {dt:7.2f} ms")
    act = f(x)
    s_prev = sp.act_scales["backbone/block1"]

    for name, packed, pool in _BACKBONE:
        w, mult, bias, s_next = sp._wmb(name, s_prev)
        if packed:
            f = jax.jit(lambda a, w=w, m=mult, b=bias:
                        packed_conv3x3_pallas(a, w, m, b, out_dtype=jnp.int8))
        else:
            f = jax.jit(lambda a, w=w, m=mult, b=bias:
                        conv3x3_pallas(a, w, m, b, out_dtype=jnp.int8))
        dt = timeit(f, act)
        total += dt
        print(f"{name:17s}: {dt:7.2f} ms  in={act.shape}")
        act = f(act)
        if name == "backbone/block5":
            act = unpack_pairs(act)
        if pool:
            pf = jax.jit(maxpool2x2_packed if packed else _maxpool_plain)
            dt = timeit(pf, act)
            total += dt
            print(f"  pool           : {dt:7.2f} ms")
            act = pf(act)
        s_prev = s_next

    w, mult, bias, s_pa = sp._wmb("detector/convPa", s_prev)
    f = jax.jit(lambda a: conv3x3_pallas(a, w, mult, bias, out_dtype=jnp.int8))
    dt = timeit(f, act); total += dt
    print(f"convPa           : {dt:7.2f} ms")
    det = f(act)
    wh, mh, bh, cout = sp._head_wmb("detector/convPb", s_pa)
    f = jax.jit(lambda a: dot_bias_act_pallas(a, wh, mh, bh, relu=False,
                                              out_dtype=jnp.bfloat16)[..., :cout])
    dt = timeit(f, det); total += dt
    print(f"convPb           : {dt:7.2f} ms")
    logits = f(det)

    w, mult, bias, s_da = sp._wmb("descriptor/convDa", s_prev)
    f2 = jax.jit(lambda a: conv3x3_pallas(a, w, mult, bias, out_dtype=jnp.int8))
    dt = timeit(f2, act); total += dt
    print(f"convDa           : {dt:7.2f} ms")
    desc = f2(act)
    wh2, mh2, bh2, cout2 = sp._head_wmb("descriptor/convDb", s_da)
    f3 = jax.jit(lambda a: dot_bias_act_pallas(a, wh2, mh2, bh2, relu=False,
                                               out_dtype=jnp.bfloat16))
    dt = timeit(f3, desc); total += dt
    print(f"convDb           : {dt:7.2f} ms")
    desc_raw = f3(desc)

    f4 = jax.jit(lambda l: detect_from_logits(l, 8, min_prob=0.015, size=4,
                                              top_k=1000, num_candidates=1024))
    dt = timeit(f4, logits); total += dt
    print(f"detect           : {dt:7.2f} ms")
    pts, scores, valid = f4(logits)

    f5 = jax.jit(lambda d, p: jax.vmap(
        lambda dd, pp: sample_descriptors_matmul(dd, pp, 8))(d, p))
    dt = timeit(f5, desc_raw, pts); total += dt
    print(f"desc sample      : {dt:7.2f} ms")
    print(f"TOTAL (sum)      : {total:7.2f} ms  -> {B / total * 1e3:.0f} fps")


if __name__ == "__main__":
    main()
