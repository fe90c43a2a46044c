from .coords import (
    COORD_OFFSET,
    FIELD,
    SENTINEL_HI,
    encode_coords,
    sorted_unique,
    lookup_sorted,
)
from .voxelize import sparse_quantize, batched_coordinates
from .plan import LevelPlan, PoolPlan, UNetPlan, build_unet_plan, KERNEL_OFFSETS_3, KERNEL_OFFSETS_5
from .conv import gather_conv, down_conv, up_conv, masked_batch_norm_stats

__all__ = [
    "COORD_OFFSET",
    "FIELD",
    "SENTINEL_HI",
    "encode_coords",
    "sorted_unique",
    "lookup_sorted",
    "sparse_quantize",
    "batched_coordinates",
    "LevelPlan",
    "PoolPlan",
    "UNetPlan",
    "build_unet_plan",
    "KERNEL_OFFSETS_3",
    "KERNEL_OFFSETS_5",
    "gather_conv",
    "down_conv",
    "up_conv",
    "masked_batch_norm_stats",
]
