from spnerf_tpu.ops.space_ops import depth_to_space, space_to_depth
from spnerf_tpu.ops.image_warp import (
    warp_image,
    ellipse_kernel,
    binary_erosion,
    compute_valid_mask,
)
from spnerf_tpu.ops.upsample import upsample_bicubic
from spnerf_tpu.ops.nms import box_nms, box_nms_greedy, suppression_offsets
from spnerf_tpu.ops.detector_decode import decode_detector_logits

__all__ = [
    "depth_to_space",
    "space_to_depth",
    "warp_image",
    "ellipse_kernel",
    "binary_erosion",
    "compute_valid_mask",
    "upsample_bicubic",
    "box_nms",
    "box_nms_greedy",
    "suppression_offsets",
    "decode_detector_logits",
]
