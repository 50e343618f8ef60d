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
    detect_from_probs_padded, sample_descriptors_onehot,
)
from spnerf_tpu.ops.serving import ServingSuperPoint, _BACKBONE, _get
from spnerf_tpu.kernels.conv12_fused_pallas import conv12_fused
from spnerf_tpu.kernels.conv_stack_pallas import (
    conv3x3_pallas, packed_conv3x3_pallas, unpack_pairs,
)
from spnerf_tpu.kernels.tail_fused_pallas import (
    double_conv3x3_pallas, head_pallas,
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
    # fused conv1+conv2+pool
    n1 = _get(sp.params, "backbone/block1")
    s1 = sp.act_scales["backbone/block1"]
    w2q, ws2 = sp.weights_q["backbone/block2"]
    s2 = sp.act_scales["backbone/block2"]
    b2 = _get(sp.params, "backbone/block2")["bias"]
    f = jax.jit(lambda img: conv12_fused(
        img, n1["kernel"], jnp.full((64,), 1.0 / (127.0 * s1), jnp.float32),
        n1["bias"] / s1, w2q, s1 * ws2 / s2, b2 / s2,
        pool=True, out_dtype=jnp.int8))
    dt = timeit(f, x)
    total += dt
    print(f"conv1+conv2+pool : {dt:7.2f} ms")
    act = f(x)
    s_prev = s2

    # per-layer mid blocks (the fused_mid=False fallback), for comparison
    act_u, s_u = act, s_prev
    for name, packed, pool in _BACKBONE[1:-2]:
        w, mult, bias, s_next = sp._wmb(name, s_u)
        if packed:
            f = jax.jit(lambda a, w=w, m=mult, b=bias, p=pool:
                        packed_conv3x3_pallas(a, w, m, b, out_dtype=jnp.int8,
                                              pool=p))
        else:
            f = jax.jit(lambda a, w=w, m=mult, b=bias, p=pool:
                        conv3x3_pallas(a, w, m, b, out_dtype=jnp.int8,
                                       pool=p))
        dt = timeit(f, act_u)
        tag = "+pool" if pool else "     "
        print(f"  [unfused] {name}{tag}: {dt:7.2f} ms  in={act_u.shape}")
        act_u = f(act_u)
        if name == "backbone/block5":
            act_u = unpack_pairs(act_u)
        s_u = s_next

    # fused mid pairs (the production fused_mid=True path)
    from spnerf_tpu.kernels.mid_fused_pallas import double_packed_conv3x3_pallas
    w3, m3, b3, s3 = sp._wmb("backbone/block3", s_prev)
    w4, m4, b4, s4 = sp._wmb("backbone/block4", s3)
    f = jax.jit(lambda a: double_packed_conv3x3_pallas(
        a, w3, m3, b3, w4, m4, b4, out_dtype=jnp.int8, pool=True))
    dt = timeit(f, act); total += dt
    print(f"block3+4 fused   : {dt:7.2f} ms  in={act.shape}")
    act = f(act)
    w5, m5, b5, s5 = sp._wmb("backbone/block5", s4)
    w6, m6, b6, s_prev = sp._wmb("backbone/block6", s5)
    f = jax.jit(lambda a: unpack_pairs(double_packed_conv3x3_pallas(
        a, w5, m5, b5, w6, m6, b6, out_dtype=jnp.int8, pool=True)))
    dt = timeit(f, act); total += dt
    print(f"block5+6 fused   : {dt:7.2f} ms  in={act.shape}")
    act = f(act)

    w7, m7, b7, s7 = sp._wmb("backbone/block7", s_prev)
    w8, m8, b8, s_prev = sp._wmb("backbone/block8", s7)
    f = jax.jit(lambda a: double_conv3x3_pallas(a, w7, m7, b7, w8, m8, b8,
                                                out_dtype=jnp.int8))
    dt = timeit(f, act); total += dt
    print(f"block7+8 fused   : {dt:7.2f} ms")
    act = f(act)

    w, mult, bias, s_pa = sp._wmb("detector/convPa", s_prev)
    wh, mh, bh, cout = sp._head_wmb("detector/convPb", s_pa)
    f = jax.jit(lambda a: head_pallas(a, w, mult, bias, wh, mh, bh,
                                      softmax_lanes=cout,
                                      out_dtype=jnp.bfloat16))
    dt = timeit(f, act); total += dt
    print(f"det head fused   : {dt:7.2f} ms   (convPa+convPb+softmax)")
    probs = f(act)

    w2d, m2d, b2d, s_da = sp._wmb("descriptor/convDa", s_prev)
    wh2, mh2, bh2, cout2 = sp._head_wmb("descriptor/convDb", s_da)
    f3 = jax.jit(lambda a: head_pallas(a, w2d, m2d, b2d, wh2, mh2, bh2,
                                       out_dtype=jnp.bfloat16))
    dt = timeit(f3, act); total += dt
    print(f"desc head fused  : {dt:7.2f} ms   (convDa+convDb)")
    desc_raw = f3(act)[..., :cout2]

    f4 = jax.jit(lambda p: detect_from_probs_padded(
        p, 8, min_prob=0.015, size=4, top_k=1000, num_candidates=1024))
    dt = timeit(f4, probs); total += dt
    print(f"detect           : {dt:7.2f} ms")
    pts, scores, valid = f4(probs)

    f5 = jax.jit(lambda d, p: jax.vmap(
        lambda dd, pp: sample_descriptors_onehot(dd, pp, 8))(d, p))
    dt = timeit(f5, desc_raw, pts); total += dt
    print(f"desc sample      : {dt:7.2f} ms")
    print(f"TOTAL (sum)      : {total:7.2f} ms  -> {B / total * 1e3:.0f} fps")


if __name__ == "__main__":
    main()
