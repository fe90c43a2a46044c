"""Dynamic voxelization + scatter pooling (segment ops).

TPU-native replacement for the mmcv CUDA ops `hard_voxelize_forward`,
`dynamic_voxelize_forward` and `DynamicScatter` (reference
`models/voxelizer.py:362-487`, `models/encoder.py:121-164`) and torch_scatter's
`scatter_mean` (`modules/exp.py:31`): `jax.ops.segment_*` over sorted voxel
ids on fixed-capacity buffers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import encode_coords, sorted_unique, decode_keys


def dynamic_voxelize(points, batch_idx, valid, point_cloud_range, voxel_size):
    """Per-point voxel coords (no pooling): floor((p - range_min)/voxel_size),
    out-of-range points invalidated (mmcv dynamic mode semantics)."""
    lo = jnp.asarray(point_cloud_range[:3])
    hi = jnp.asarray(point_cloud_range[3:])
    grid = jnp.floor((hi - lo) / jnp.asarray(voxel_size)).astype(jnp.int32)
    c = jnp.floor((points - lo) / jnp.asarray(voxel_size)).astype(jnp.int32)
    in_range = jnp.all((c >= 0) & (c < grid), axis=-1) & valid
    coords = jnp.concatenate([batch_idx[:, None].astype(jnp.int32), c], axis=1)
    return coords, in_range


def cylindrical_coords(points):
    """(x,y,z) -> (rho, phi, z) (the 'cylindrical' voxelizer mode,
    `models/voxelizer.py:239-270`)."""
    rho = jnp.sqrt(points[..., 0] ** 2 + points[..., 1] ** 2)
    phi = jnp.arctan2(points[..., 1], points[..., 0])
    return jnp.stack([rho, phi, points[..., 2]], axis=-1)


def dynamic_scatter(feats, coords, valid, capacity: int, mode: str = "max"):
    """Pool point features into unique voxels (DynamicScatter equivalent).

    Returns dict with voxel coords/valid/count, pooled feats [capacity, C],
    and the point->voxel `inverse` map.
    """
    hi, lo = encode_coords(coords, valid)
    (uh, ul), rep, inverse, count = sorted_unique(hi, lo, capacity)
    seg = jnp.where(valid, jnp.minimum(inverse, capacity), capacity)
    if mode == "max":
        pooled = jax.ops.segment_max(
            jnp.where(valid[:, None], feats, -jnp.inf), seg,
            num_segments=capacity + 1,
        )[:capacity]
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    elif mode == "mean":
        s = jax.ops.segment_sum(
            feats * valid[:, None], seg, num_segments=capacity + 1
        )[:capacity]
        n = jax.ops.segment_sum(
            valid.astype(feats.dtype), seg, num_segments=capacity + 1
        )[:capacity]
        pooled = s / jnp.maximum(n[:, None], 1.0)
    else:
        raise ValueError(mode)
    vvalid = uh != jnp.int32((1 << 31) - 1)
    return {
        "feats": pooled * vvalid[:, None],
        "coords": jnp.where(vvalid[:, None], decode_keys(uh, ul), 0),
        "valid": vvalid,
        "count": count,
        "inverse": inverse,
        "rep": rep,
    }


def hard_voxelize(points, feats, batch_idx, valid, point_cloud_range,
                  voxel_size, max_voxels: int, max_points: int):
    """mmcv 'hard' voxelization: per-voxel fixed-size point buffers.

    Returns dict with voxels [max_voxels, max_points, C] (zero-padded),
    num_points [max_voxels], coords [max_voxels, 4], valid. Points beyond
    max_points per voxel and voxels beyond max_voxels are dropped
    (reference `models/voxelizer.py:399-487` semantics).
    """
    coords, in_range = dynamic_voxelize(
        points, batch_idx, valid, point_cloud_range, voxel_size
    )
    hi, lo = encode_coords(coords, in_range)
    (uh, ul), rep, inverse, count = sorted_unique(hi, lo, max_voxels)
    seg = jnp.where(in_range, jnp.minimum(inverse, max_voxels), max_voxels)
    # slot of each point within its voxel: rank among same-voxel points.
    # points were assigned group ids in sorted order; rank = position - first.
    order = jnp.lexsort((jnp.arange(points.shape[0]), seg))
    seg_sorted = seg[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), seg_sorted[1:] != seg_sorted[:-1]]
    )
    pos = jnp.arange(points.shape[0])
    start = jnp.where(first, pos, 0)
    start = jax.lax.cummax(start, axis=0)
    rank_sorted = pos - start
    rank = jnp.zeros_like(seg).at[order].set(rank_sorted)
    ok = in_range & (rank < max_points) & (seg < max_voxels)
    c = feats.shape[-1]
    voxels = jnp.zeros((max_voxels, max_points, c), feats.dtype)
    flat_idx = jnp.where(ok, seg * max_points + rank, max_voxels * max_points)
    voxels = (
        voxels.reshape(-1, c).at[flat_idx].set(
            jnp.where(ok[:, None], feats, 0.0), mode="drop"
        ).reshape(max_voxels, max_points, c)
    )
    num = jax.ops.segment_sum(
        ok.astype(jnp.int32), seg, num_segments=max_voxels + 1
    )[:max_voxels]
    vvalid = uh != jnp.int32((1 << 31) - 1)
    return {
        "voxels": voxels,
        "num_points": num,
        "coords": jnp.where(vvalid[:, None], decode_keys(uh, ul), 0),
        "valid": vvalid,
        "count": count,
    }


def scatter_mean(feats, index, num_segments: int):
    """torch_scatter.scatter_mean equivalent."""
    s = jax.ops.segment_sum(feats, index, num_segments=num_segments)
    n = jax.ops.segment_sum(
        jnp.ones((feats.shape[0],), feats.dtype), index, num_segments=num_segments
    )
    return s / jnp.maximum(n[:, None], 1.0)
