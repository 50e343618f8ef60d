"""SuperPoint / MagicPoint in flax.linen — NHWC, TPU-native.

Architecture contract (reference models/model_utils/VGG_Backbone.py:40-70,
heads.py:6-68, SuperPoint.py:5-29):

- shared VGG encoder: 8x [conv3x3 -> BN -> ReLU], maxpool 2x2 after
  blocks 2/4/6, channels from ``vgg_cn`` (default 64,64,64,64,128,128,
  128,128) -> (B, H/8, W/8, 128)
- detector head: conv3x3 128->256 BN ReLU; conv1x1 256->65 BN (no act)
- descriptor head: conv3x3 128->256 BN ReLU; conv1x1 256->256 BN
- every conv (incl. 1x1 outputs) carries BatchNorm, like the reference.

The nn.Module computes only what training needs (logits, raw
descriptors). Inference-time decoding (softmax/dustbin/depth-to-space,
NMS, bicubic descriptor upsampling + L2 norm) lives in
``superpoint_inference`` as pure jittable post-processing, so the hot
training path never pays for it.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from spnerf_tpu.ops.detector_decode import decode_detector_logits
from spnerf_tpu.ops.nms import box_nms
from spnerf_tpu.ops.upsample import upsample_bicubic


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    model_name: str = "superpoint"  # "magicpoint" -> no descriptor head
    vgg_cn: tuple[int, ...] = (64, 64, 64, 64, 128, 128, 128, 128)
    detector_dim: tuple[int, int] = (128, 256)
    descriptor_dim: tuple[int, int] = (128, 256)
    grid_size: int = 8
    nms: int = 4
    det_thresh: float = 0.001
    top_k: int = 0
    use_bn: bool = True  # False = BN-folded inference variant

    @property
    def has_descriptor(self) -> bool:
        return self.model_name == "superpoint"

    @classmethod
    def from_dict(cls, model_cfg: dict) -> "SuperPointConfig":
        det = model_cfg.get("detector_head", {})
        desc = model_cfg.get("descriptor_head", {})
        return cls(
            model_name=model_cfg.get("model_name", "superpoint"),
            vgg_cn=tuple(model_cfg.get("vgg_cn", (64, 64, 64, 64, 128, 128, 128, 128))),
            detector_dim=tuple(det.get("detector_dim", (128, 256))),
            descriptor_dim=tuple(desc.get("descriptor_dim", (128, 256))),
            grid_size=det.get("grid_size", 8),
            nms=det.get("nms", 4),
            det_thresh=det.get("det_thresh", 0.001),
            top_k=det.get("top_k", 0),
        )


class VGGBlock(nn.Module):
    """conv -> BatchNorm -> (ReLU). BN params match torch defaults.

    ``use_bn=False`` builds the inference-folded variant (bias-only conv)
    whose params come from ``fold_batch_norm``.
    """

    features: int
    kernel: int = 3
    activation: bool = True
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME")(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x


class VGGBackbone(nn.Module):
    channels: Sequence[int]
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = VGGBlock(c, use_bn=self.use_bn, name=f"block{i + 1}")(x, train)
            if i in (1, 3, 5):  # maxpool after blocks 2, 4, 6 -> stride 8
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class DetectorHead(nn.Module):
    dims: tuple[int, int]
    grid_size: int = 8
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VGGBlock(self.dims[1], kernel=3, activation=True,
                     use_bn=self.use_bn, name="convPa")(x, train)
        logits = VGGBlock(
            self.grid_size**2 + 1, kernel=1, activation=False,
            use_bn=self.use_bn, name="convPb"
        )(x, train)
        return logits  # (B, Hc, Wc, 65)


class DescriptorHead(nn.Module):
    dims: tuple[int, int]
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VGGBlock(self.dims[1], kernel=3, activation=True,
                     use_bn=self.use_bn, name="convDa")(x, train)
        desc_raw = VGGBlock(
            self.dims[1], kernel=1, activation=False,
            use_bn=self.use_bn, name="convDb"
        )(x, train)
        return desc_raw  # (B, Hc, Wc, 256)


class SuperPoint(nn.Module):
    """Returns {"logits": (B,Hc,Wc,65)[, "desc_raw": (B,Hc,Wc,256)]}."""

    config: SuperPointConfig = SuperPointConfig()

    @nn.compact
    def __call__(self, image, train: bool = False):
        cfg = self.config
        feat = VGGBackbone(cfg.vgg_cn, cfg.use_bn, name="backbone")(image, train)
        out = {"logits": DetectorHead(cfg.detector_dim, cfg.grid_size,
                                      cfg.use_bn, name="detector")(feat, train)}
        if cfg.has_descriptor:
            out["desc_raw"] = DescriptorHead(cfg.descriptor_dim, cfg.use_bn,
                                             name="descriptor")(feat, train)
        return out


def fold_batch_norm(variables: dict, eps: float = 1e-5):
    """Fold BatchNorm running stats into conv weights for inference.

    Takes {'params', 'batch_stats'} of a ``use_bn=True`` model and
    returns {'params'} for the matching ``use_bn=False`` model:
    kernel' = kernel * g, bias' = beta + (bias - mean) * g with
    g = gamma / sqrt(var + eps). Removes every per-pixel normalization
    pass from the inference graph (pure HBM-bandwidth win).
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    def walk(p, s):
        if isinstance(p, dict) and "Conv_0" in p and "BatchNorm_0" in p:
            conv = p["Conv_0"]
            bn = p["BatchNorm_0"]
            st = s["BatchNorm_0"]
            g = bn["scale"] / jnp.sqrt(st["var"] + eps)
            kernel = conv["kernel"] * g[None, None, None, :]
            bias = bn["bias"] + (conv.get("bias", 0.0) - st["mean"]) * g
            return {"Conv_0": {"kernel": kernel, "bias": bias}}
        if isinstance(p, dict):
            return {k: walk(v, s.get(k, {}) if isinstance(s, dict) else {})
                    for k, v in p.items()}
        return p

    return {"params": walk(params, stats)}


def init_superpoint(key, config: SuperPointConfig, input_shape=(1, 120, 160, 1)):
    """Initialize model variables ({'params', 'batch_stats'}).

    Init runs under jit: one fused compile instead of one eager
    compilation per conv (matters on slow hosts; params are identical).
    """
    model = SuperPoint(config)
    init_fn = jax.jit(lambda k, x: model.init(k, x, train=False))
    variables = init_fn(key, jnp.zeros(input_shape, jnp.float32))
    return model, variables


def superpoint_inference(
    model: SuperPoint,
    variables,
    image: jnp.ndarray,
    with_nms: bool | None = None,
):
    """Full inference matching the reference forward-pass output surface.

    Returns a dict with "logits", "prob_heatmap", and (per config)
    "prob_heatmap_nms", "pred_pts", "desc_raw", "desc"
    (reference heads.py:17-68, SuperPoint.py:17-29).
    """
    cfg = model.config
    raw = model.apply(variables, image, train=False)
    out = dict(raw)
    prob = decode_detector_logits(raw["logits"], cfg.grid_size)
    out["prob_heatmap"] = prob
    use_nms = cfg.nms if with_nms is None else with_nms
    if use_nms:
        nms_fn = lambda p: box_nms(
            p, size=cfg.nms, iou=0.1, min_prob=cfg.det_thresh,
            keep_top_k=cfg.top_k,
        )
        prob_nms = jax.vmap(nms_fn)(prob)
        out["prob_heatmap_nms"] = prob_nms
        out["pred_pts"] = (prob_nms >= cfg.det_thresh).astype(jnp.int32)
    else:
        out["pred_pts"] = (prob >= cfg.det_thresh).astype(jnp.int32)
    if "desc_raw" in raw:
        desc = upsample_bicubic(raw["desc_raw"], cfg.grid_size)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12)
        out["desc"] = desc
    return out
