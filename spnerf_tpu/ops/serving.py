"""Assembled Pallas serving stack for SuperPoint inference.

Chains the row-band MXU conv kernels (kernels/conv_stack_pallas.py) into
the full BN-folded VGG + heads graph (reference
models/model_utils/VGG_Backbone.py:40-70, heads.py:6-68):

    conv1 (packed patch dot, f32 in) -> int8 @ s1
    conv2 packed int8 @480x640  -> pool -> conv3/conv4 packed @240x320
    -> pool -> conv5 packed 64->128 -> unpack -> conv6 plain @120x160
    -> pool -> conv7/conv8 plain @60x80
    detector:   convPa plain int8 128->256 -> convPb 1x1 dot -> bf16 logits
    descriptor: convDa plain int8 128->256 -> convDb 1x1 dot -> bf16 desc_raw

int8 scheme (per ops/quantization.py): per-output-channel symmetric
weights, per-tensor symmetric activations calibrated from a
representative batch (max-abs of each conv's float output), int32
accumulation. Requantization is fused into each kernel:
``mult_c = s_in * w_scale_c / s_out``; the head 1x1 dots emit bf16
(``mult_c = s_in * w_scale_c``). The bf16 mode reuses the same kernels
with bf16 operands and mult=1 (no calibration needed).

The C=64 layers run W-pair packed (half-sparse side taps merged into one
dense matmul), so they cost 1.33x their real MACs instead of the 2x an
unpacked 64-lane conv wastes; the C_in=1 first conv is an 18-channel
patch contraction (see conv_stack_pallas docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spnerf_tpu.kernels.conv12_fused_pallas import conv12_fused
from spnerf_tpu.kernels.conv_stack_pallas import (
    conv1_packed,
    conv3x3_pallas,
    dot_bias_act_pallas,
    packed_conv3x3_pallas,
    unpack_pairs,
)
from spnerf_tpu.kernels.mid_fused_pallas import double_packed_conv3x3_pallas
from spnerf_tpu.kernels.tail_fused_pallas import (
    double_conv3x3_pallas,
    head_pallas,
)
from spnerf_tpu.models.superpoint import fold_batch_norm
from spnerf_tpu.ops.quantization import quantize_weights

# execution order: (name, packed?, pool_after?). Packed = W-pair packing
# for the C=64 layers; block5 (64->128) runs packed then unpacks, block6+
# fill the 128 lanes natively and run plain.
_BACKBONE = [
    ("backbone/block2", True, True),
    ("backbone/block3", True, False),
    ("backbone/block4", True, True),
    ("backbone/block5", True, False),   # 64 -> 128, output unpacked after
    ("backbone/block6", False, True),
    ("backbone/block7", False, False),
    ("backbone/block8", False, False),
]


def _get(params, path):
    node = params
    for part in path.split("/"):
        node = node[part]
    return node["Conv_0"]


def _maxpool_plain(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.max(jnp.max(x, axis=4), axis=2)


class ServingSuperPoint:
    """BN-folded Pallas inference graph (int8 or bf16).

    Usage::

        sp = ServingSuperPoint.build(config, variables, calib_images)
        out = jax.jit(sp)(images)    # {"logits", "desc_raw"} bf16

    ``variables`` are the trained {'params','batch_stats'} of the
    ``use_bn=True`` flax model; calibration runs one float forward.
    """

    CONVS = (
        ["backbone/block1"]
        + [name for name, _, _ in _BACKBONE]
        + ["detector/convPa", "detector/convPb"]
    )
    DESC_CONVS = ["descriptor/convDa", "descriptor/convDb"]

    def __init__(self, folded_params, act_scales, has_descriptor, mode,
                 fused_tail=True, fused_mid=True):
        assert mode in ("int8", "bf16", "mixed")
        self.mode = mode
        self.fused_tail = fused_tail
        self.fused_mid = fused_mid
        self.has_descriptor = has_descriptor
        self.params = folded_params["params"]
        self.act_scales = act_scales  # {conv name: f32 scale of its OUTPUT}
        self.weights_q = {}
        if mode in ("int8", "mixed"):
            for name in self._conv_names():
                if name == "backbone/block1":
                    continue  # f32 patch dot, only its output is quantized
                if self._head_is_bf16(name):
                    continue  # mixed: heads stay bf16, no quantization
                conv = _get(self.params, name)
                self.weights_q[name] = quantize_weights(conv["kernel"])

    # In "mixed" mode the backbone runs int8 (where ~80% of the time is)
    # while the decision-critical heads run bf16: near det_thresh the
    # softmax'd detector logits are sensitive to the last layers'
    # rounding, which caused the int8-vs-bf16 exact-label IoU gap at
    # threshold 0.001 (docs/PERF.md round-3 HA section).
    _HEAD_NAMES = frozenset({"detector/convPa", "detector/convPb",
                             "descriptor/convDa", "descriptor/convDb"})

    def _head_is_bf16(self, name):
        return self.mode == "mixed" and name in self._HEAD_NAMES

    def _conv_names(self):
        names = list(self.CONVS)
        if self.has_descriptor:
            names += self.DESC_CONVS
        return names

    # ------------------------------------------------------------ building

    @classmethod
    def build(cls, config, variables, calib_images=None, mode="int8",
              eps: float = 1e-5, fused_tail: bool = True,
              fused_mid: bool = True):
        folded = fold_batch_norm(variables, eps)
        scales = None
        if mode in ("int8", "mixed"):
            if calib_images is None:
                raise ValueError(f"{mode} mode needs calibration images")
            scales = cls._calibrate(folded, config.has_descriptor,
                                    calib_images)
        return cls(folded, scales, config.has_descriptor, mode,
                   fused_tail=fused_tail, fused_mid=fused_mid)

    @staticmethod
    def _calibrate(folded, has_descriptor, images):
        """Float forward with folded weights, recording each conv's
        post-activation max-abs -> per-tensor symmetric scales."""
        params = folded["params"]
        scales = {}

        def conv(x, name, relu=True):
            node = _get(params, name)
            y = jax.lax.conv_general_dilated(
                x, node["kernel"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + node["bias"]
            if relu:
                y = jnp.maximum(y, 0.0)
            scales[name] = jnp.max(jnp.abs(y)) / 127.0 + 1e-12
            return y

        x = images.astype(jnp.float32)
        x = conv(x, "backbone/block1")
        for name, _, pool in _BACKBONE:
            x = conv(x, name)
            if pool:
                x = _maxpool_plain(x)
        det = conv(x, "detector/convPa")
        conv(det, "detector/convPb", relu=False)
        if has_descriptor:
            desc = conv(x, "descriptor/convDa")
            conv(desc, "descriptor/convDb", relu=False)
        return {k: jnp.asarray(v, jnp.float32) for k, v in
                jax.device_get(scales).items()}

    # ------------------------------------------------------------- weights

    def _wmb(self, name, s_in):
        """Kernel operands (w, mult, bias) for conv ``name`` given input
        scale ``s_in`` (None => f32/bf16 input with unit scale)."""
        node = _get(self.params, name)
        bias = node["bias"]
        if self.mode == "bf16" or self._head_is_bf16(name):
            w = node["kernel"].astype(jnp.bfloat16)
            mult = jnp.ones_like(bias)
            return w, mult, bias, None
        s_out = self.act_scales[name]
        wq, ws = self.weights_q[name]
        mult = (1.0 if s_in is None else s_in) * ws / s_out
        return wq, mult, bias / s_out, s_out

    def _head_wmb(self, name, s_in):
        """1x1 head dot emitting bf16 (dequantized). Output channels are
        zero-padded to a multiple of 128 lanes (convPb's 65 logits);
        callers slice the real channel count back off."""
        node = _get(self.params, name)
        bias = node["bias"]
        cout = bias.shape[0]
        pad = (-cout) % 128
        if self.mode == "bf16" or self._head_is_bf16(name):
            kernel = node["kernel"][0, 0].astype(jnp.bfloat16)
            mult = jnp.ones((cout,), jnp.float32)
        else:
            wq, ws = self.weights_q[name]
            kernel, mult = wq[0, 0], s_in * ws
        if pad:
            kernel = jnp.pad(kernel, ((0, 0), (0, pad)))
            mult = jnp.pad(mult, (0, pad))
            bias = jnp.pad(bias, (0, pad))
        return kernel, mult, bias, cout

    # ------------------------------------------------------------- forward

    def _conv1(self, image, act):
        """First VGG block -> W-pair-packed activations.

        The C_in=1 conv is pathological for the MXU (1 of 128 contraction
        lanes) and, at 480x640x64, HBM-bandwidth-dominated; the Pallas
        patch-dot flavor (conv1_packed) wins at small batches, while
        large batches run a batch-chunked XLA conv with the
        quantize/pack epilogue fused (bounds the bf16 intermediate to
        one chunk)."""
        n1 = "backbone/block1"
        node1 = _get(self.params, n1)
        if self.mode == "int8":
            s = self.act_scales[n1]
            mult = jnp.ones_like(node1["bias"]) / s
            bias = node1["bias"] / s
            s_prev = s
        else:
            mult = jnp.ones_like(node1["bias"])
            bias = node1["bias"]
            s_prev = None
        B, H, W, _ = image.shape
        if B <= 8:
            x = conv1_packed(image.astype(jnp.float32), node1["kernel"],
                             mult, bias, out_dtype=act)
            return x, s_prev

        kernel = node1["kernel"].astype(jnp.bfloat16)

        def chunk(img):
            y = jax.lax.conv_general_dilated(
                img.astype(jnp.bfloat16), kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            y = jnp.maximum(y * mult + bias, 0.0)
            if act == jnp.int8:
                y = jnp.clip(jnp.round(y), -127.0, 127.0)
            return y.astype(act).reshape(img.shape[0], H, W // 2, 128)

        c = 8
        nchunk = B // c
        if nchunk * c == B:
            x = jax.lax.map(chunk, image.reshape(nchunk, c, H, W, 1))
            x = x.reshape(B, H, W // 2, 128)
        else:
            x = chunk(image)
        return x, s_prev

    def __call__(self, image, softmax: bool = False):
        """Forward pass. ``softmax=True`` (fused tail only) applies the
        detector decode in-kernel and returns ``probs_padded`` — lane-
        padded cell probabilities for ``detect_from_probs_padded`` —
        instead of ``logits``."""
        _, H, W, _ = image.shape
        if H % 16 != 0 or W % 8 != 0:
            # conv12_fused uses 16-row bands + fused 2x2 pool; the
            # stride-8 grid needs W % 8 — reject rather than truncate
            raise ValueError(
                f"ServingSuperPoint: input {H}x{W} must have H % 16 == 0 "
                f"and W % 8 == 0 (pad the image before serving)")
        act = jnp.int8 if self.mode in ("int8", "mixed") else jnp.bfloat16
        act_head = jnp.int8 if self.mode == "int8" else jnp.bfloat16
        backbone = _BACKBONE
        if self.mode in ("int8", "mixed"):
            # image -> conv1 -> conv2 -> pool in ONE kernel: the two
            # full-resolution layers never touch HBM (see
            # kernels/conv12_fused_pallas.py)
            n1 = _get(self.params, "backbone/block1")
            s1 = self.act_scales["backbone/block1"]
            w2q, ws2 = self.weights_q["backbone/block2"]
            s2 = self.act_scales["backbone/block2"]
            b2 = _get(self.params, "backbone/block2")["bias"]
            x = conv12_fused(
                image,
                n1["kernel"],
                jnp.full((64,), 1.0 / (127.0 * s1), jnp.float32),
                n1["bias"] / s1,
                w2q, s1 * ws2 / s2, b2 / s2,
                pool=True, out_dtype=jnp.int8,
            )
            s_prev = s2
            backbone = _BACKBONE[1:]
        else:
            x, s_prev = self._conv1(image, act)

        if self.fused_tail:
            # blocks 7-8 + each head collapse into whole-image fused
            # kernels at 60x80 (kernels/tail_fused_pallas.py) — same
            # int8 chain, no per-layer HBM round trips
            backbone = backbone[:-2]

        # the fused mid pair at blocks 5-6 pools packed W/8 pairs, which
        # needs W % 16; fall back to per-layer kernels for narrower grids
        fused_mid = self.fused_mid and W % 16 == 0
        bi = 0
        while bi < len(backbone):
            name, packed, pool = backbone[bi]
            if fused_mid and name == "backbone/block3":
                # blocks 3-4 and 5-6 each collapse into one fused packed
                # kernel (kernels/mid_fused_pallas.py): the mid activation
                # lives in VMEM scratch, the pool fuses into the epilogue,
                # and block6 runs packed (Co2=256) instead of plain
                wa, ma, ba, sa = self._wmb("backbone/block3", s_prev)
                wb, mb, bb, s_prev = self._wmb("backbone/block4", sa)
                x = double_packed_conv3x3_pallas(x, wa, ma, ba, wb, mb, bb,
                                                 out_dtype=act, pool=True)
                wa, ma, ba, sa = self._wmb("backbone/block5", s_prev)
                wb, mb, bb, s_prev = self._wmb("backbone/block6", sa)
                x = double_packed_conv3x3_pallas(x, wa, ma, ba, wb, mb, bb,
                                                 out_dtype=act, pool=True)
                x = unpack_pairs(x)     # (B, H/8, W/8, 128) plain from here
                bi += 4
                continue
            w, mult, bias, s_prev = self._wmb(name, s_prev)
            # the stack's 2x2 maxpools fuse into the conv epilogues, so
            # pre-pool activations never round-trip through HBM
            if packed:
                x = packed_conv3x3_pallas(x, w, mult, bias, out_dtype=act,
                                          pool=pool)
            else:
                x = conv3x3_pallas(x, w, mult, bias, out_dtype=act,
                                   pool=pool)
            if name == "backbone/block5":
                x = unpack_pairs(x)     # (B, 120, 160, 128) plain from here
            bi += 1

        if self.fused_tail:
            w7, m7, b7, s7 = self._wmb("backbone/block7", s_prev)
            w8, m8, b8, s_prev = self._wmb("backbone/block8", s7)
            x = double_conv3x3_pallas(x, w7, m7, b7, w8, m8, b8,
                                      out_dtype=act)
            if self.mode == "mixed":
                # dequantize ONCE at the head boundary; heads run bf16
                x = x.astype(jnp.bfloat16) * jnp.bfloat16(s_prev)
                s_prev = None
            w, mult, bias, s_pa = self._wmb("detector/convPa", s_prev)
            wh, mh, bh, cout = self._head_wmb("detector/convPb", s_pa)
            if softmax:
                out = {"probs_padded": head_pallas(
                    x, w, mult, bias, wh, mh, bh, softmax_lanes=cout,
                    out_dtype=jnp.bfloat16)}
            else:
                out = {"logits": head_pallas(
                    x, w, mult, bias, wh, mh, bh,
                    out_dtype=jnp.bfloat16)[..., :cout]}
            if self.has_descriptor:
                w, mult, bias, s_da = self._wmb("descriptor/convDa", s_prev)
                wh, mh, bh, cout = self._head_wmb("descriptor/convDb", s_da)
                out["desc_raw"] = head_pallas(
                    x, w, mult, bias, wh, mh, bh,
                    out_dtype=jnp.bfloat16)[..., :cout]
            return out

        if softmax:
            raise ValueError("softmax=True requires fused_tail=True")
        if self.mode == "mixed":
            x = x.astype(jnp.bfloat16) * jnp.bfloat16(s_prev)
            s_prev = None
        w, mult, bias, s_pa = self._wmb("detector/convPa", s_prev)
        det = conv3x3_pallas(x, w, mult, bias, out_dtype=act_head)
        wh, mh, bh, cout = self._head_wmb("detector/convPb", s_pa)
        logits = dot_bias_act_pallas(det, wh, mh, bh, relu=False,
                                     out_dtype=jnp.bfloat16)[..., :cout]
        out = {"logits": logits}
        if self.has_descriptor:
            w, mult, bias, s_da = self._wmb("descriptor/convDa", s_prev)
            desc = conv3x3_pallas(x, w, mult, bias, out_dtype=act_head)
            wh, mh, bh, cout = self._head_wmb("descriptor/convDb", s_da)
            out["desc_raw"] = dot_bias_act_pallas(desc, wh, mh, bh,
                                                  relu=False,
                                                  out_dtype=jnp.bfloat16)[..., :cout]
        return out
