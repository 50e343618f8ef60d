from spnerf_tpu.geometry.homography import (
    HomographyConfig,
    homography_from_corners,
    sample_homography,
    sample_homographies,
    warp_points,
    adapt_homography_to_resize,
)
from spnerf_tpu.geometry.keypoints import (
    filter_points_mask,
    compute_keypoint_map,
    top_k_keypoints,
)
from spnerf_tpu.geometry.reprojection import (
    intrinsics_from_fov,
    nerfstudio_to_cv,
    rotation_translation,
    robust_depth_lookup,
    warp_points_nerf,
)

__all__ = [
    "HomographyConfig",
    "homography_from_corners",
    "sample_homography",
    "sample_homographies",
    "warp_points",
    "adapt_homography_to_resize",
    "filter_points_mask",
    "compute_keypoint_map",
    "top_k_keypoints",
    "intrinsics_from_fov",
    "nerfstudio_to_cv",
    "rotation_translation",
    "robust_depth_lookup",
    "warp_points_nerf",
]
