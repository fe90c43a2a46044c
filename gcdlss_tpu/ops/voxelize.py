"""Device-side voxelization: quantize + unique with fixed capacity.

TPU-native equivalent of `ME.utils.sparse_quantize` /
`ME.utils.batched_coordinates` (reference call sites
`utils/dataset_remission_mean_teacher.py:965-1002`, `utils/collation.py:33`,
and the in-training-step LaserMix re-voxelization at
`modules/exp_merge_mean_teacher.py:2856-2861`). Quantization is
`floor(points / voxel_size)`; one representative point (first occurrence) is
kept per voxel. Everything is static-shape so it runs inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import encode_coords, sorted_unique, decode_keys


def sparse_quantize(
    points: jax.Array,
    batch_idx: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    capacity: int,
):
    """Quantize a batched point cloud into unique voxels.

    Args:
      points: [P, 3] float xyz.
      batch_idx: [P] int32 scan index within the batch.
      valid: [P] bool point validity (padding mask).
      voxel_size: scalar quantization size.
      capacity: static number of output voxel slots.

    Returns dict with:
      coords: [capacity, 4] int32 (b,x,y,z) quantized coords (garbage where ~valid).
      valid:  [capacity] bool voxel validity.
      rep:    [capacity] int32 index of representative point per voxel (P pad).
      inverse:[P] int32 point -> voxel row (capacity where dropped/invalid).
      count:  int32 number of valid voxels.
    """
    q = jnp.floor(points / voxel_size).astype(jnp.int32)
    coords = jnp.concatenate([batch_idx[:, None].astype(jnp.int32), q], axis=1)
    hi, lo = encode_coords(coords, valid)
    (uh, ul), rep, inverse, count = sorted_unique(hi, lo, capacity)
    vcoords = decode_keys(uh, ul)
    vvalid = uh != jnp.int32((1 << 31) - 1)
    return {
        "coords": jnp.where(vvalid[:, None], vcoords, 0),
        "valid": vvalid,
        "rep": rep,
        "inverse": inverse,
        "count": count,
        "keys": (uh, ul),
    }


def batched_coordinates(coords_list):
    """numpy-style helper: prepend batch index column to a list of [Ni,3] arrays."""
    import numpy as np

    out = []
    for b, c in enumerate(coords_list):
        bb = np.full((c.shape[0], 1), b, dtype=np.int32)
        out.append(np.hstack([bb, np.asarray(c, dtype=np.int32)]))
    return np.concatenate(out, axis=0)
