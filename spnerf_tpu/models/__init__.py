from spnerf_tpu.models.superpoint import (
    SuperPoint,
    SuperPointConfig,
    init_superpoint,
    superpoint_inference,
)

__all__ = [
    "SuperPoint",
    "SuperPointConfig",
    "init_superpoint",
    "superpoint_inference",
]
