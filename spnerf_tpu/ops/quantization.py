"""Post-training int8 quantization for the inference conv stack.

The v5e MXU runs int8 at ~2x bf16 throughput; SuperPoint inference is
conv-FLOP-bound, so PTQ is the biggest single-chip lever after BN
folding. Scheme (standard symmetric PTQ):

- weights: per-output-channel symmetric int8 (folded conv weights from
  ``fold_batch_norm``);
- activations: per-tensor symmetric int8, scales calibrated offline from
  a batch of representative images (max-abs);
- conv accumulates in int32, dequantizes + bias + ReLU in fp;
- the detector/descriptor 1x1 output layers stay in bf16 (logits and
  descriptors are precision-sensitive and cost little).

Quantized convs are expressed as ``lax.conv_general_dilated`` on int8
inputs with ``preferred_element_type=int32`` — XLA maps them onto the
int8 MXU path directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weights(kernel: jnp.ndarray):
    """(kh, kw, cin, cout) float kernel -> (int8 kernel, (cout,) scales)."""
    absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) + 1e-12
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_activations(x: jnp.ndarray, scale: jnp.ndarray):
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def conv_int8(x_q, kernel_q, x_scale, w_scale, bias):
    """int8 x int8 -> int32 conv, dequantized to f32 with bias."""
    acc = jax.lax.conv_general_dilated(
        x_q, kernel_q, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * w_scale)[None, None, None, :] + bias


class QuantizedSuperPoint:
    """BN-folded, int8-conv SuperPoint inference graph.

    Built from a trained model's variables:
        q = QuantizedSuperPoint.build(config, variables, calib_images)
        out = jax.jit(q)(images)   # {"logits", "desc_raw"}
    """

    # blocks in execution order: (path, pooled_after)
    BACKBONE = [("block1", False), ("block2", True), ("block3", False),
                ("block4", True), ("block5", False), ("block6", True),
                ("block7", False), ("block8", False)]

    def __init__(self, folded_params, act_scales, has_descriptor):
        self.params = folded_params["params"]
        self.act_scales = act_scales
        self.has_descriptor = has_descriptor
        self.weights_q = {}
        for name in self._conv_names():
            conv = self._get(name)["Conv_0"]
            self.weights_q[name] = quantize_weights(conv["kernel"])

    def _conv_names(self):
        names = [f"backbone/{b}" for b, _ in self.BACKBONE]
        names += ["detector/convPa"]
        if self.has_descriptor:
            names += ["descriptor/convDa"]
        return names

    def _get(self, path):
        node = self.params
        for part in path.split("/"):
            node = node[part]
        return node

    @classmethod
    def build(cls, config, variables, calib_images, eps: float = 1e-5):
        """Calibrate activation scales on a representative batch."""
        from spnerf_tpu.models.superpoint import fold_batch_norm

        folded = fold_batch_norm(variables, eps)
        q = cls(folded, act_scales=None, has_descriptor=config.has_descriptor)
        # calibration pass in float, recording per-layer input max-abs
        scales = {}

        def record(name, x):
            scales[name] = float(jnp.max(jnp.abs(x))) / 127.0 + 1e-12
            return x

        q._forward(calib_images, record=record)
        q.act_scales = {k: jnp.asarray(v, jnp.float32)
                        for k, v in scales.items()}
        return q

    def _conv_block(self, x, name, relu=True, record=None):
        node = self._get(name)["Conv_0"]
        if record is not None:  # float calibration path
            record(name, x)
            out = jax.lax.conv_general_dilated(
                x, node["kernel"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + node["bias"]
        else:
            kq, wscale = self.weights_q[name]
            xq = quantize_activations(x, self.act_scales[name])
            out = conv_int8(xq, kq, self.act_scales[name], wscale,
                            node["bias"])
        return jax.nn.relu(out) if relu else out

    def _head_1x1(self, x, name):
        """Output 1x1 convs stay bf16: cheap + precision-sensitive."""
        node = self._get(name)["Conv_0"]
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), node["kernel"].astype(jnp.bfloat16),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32) + node["bias"]
        return out

    def _forward(self, image, record=None):
        x = image.astype(jnp.float32)
        for i, (block, pool_after) in enumerate(self.BACKBONE):
            x = self._conv_block(x, f"backbone/{block}", relu=True,
                                 record=record)
            if pool_after:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID",
                )
        det = self._conv_block(x, "detector/convPa", relu=True, record=record)
        out = {"logits": self._head_1x1(det, "detector/convPb")}
        if self.has_descriptor:
            desc = self._conv_block(x, "descriptor/convDa", relu=True,
                                    record=record)
            out["desc_raw"] = self._head_1x1(desc, "descriptor/convDb")
        return out

    def __call__(self, image):
        return self._forward(image)
