"""Asymmetric / strided sparse-conv rulebooks for the Cylinder3D backbone.

spconv's `SubMConv3d` with asymmetric kernels ((1,3,3), (3,1,3), (3,1,1), ...)
uses kernel-offset subsets of the full 3x3x3 neighborhood — so instead of
building a separate rulebook per kernel shape we build ONE 27-offset map per
level (already produced by `build_unet_plan`-style code) and *slice* the
relevant offset columns (`offset_subset`).

Strided `SparseConv3d(k=3, s, p=1)` down edges and `SparseInverseConv3d(k=3)`
up edges get dedicated maps:
  * down: coarse sites = unique(floor(fine / stride)) per axis; rulebook
    queries fine sites at `stride*o + d`, d in {-1,0,1}^3 (27 columns over the
    coarse set). This is the floor-parent site rule — a deliberate TPU-first
    simplification of spconv's window-cover rule (slightly sparser coarse
    sets, same receptive structure); documented divergence.
  * inverse: fine site f receives coarse o = (f - d)/stride where the division
    is exact — realized as the same 27-offset loop with per-axis parity
    validity.

Anisotropic strides ((2,2,1) for the no-height-pooling levels) are supported
via per-axis stride vectors.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .coords import encode_coords, sorted_unique, decode_keys, SENTINEL_HI
from .join import sorted_join
from .plan import KERNEL_OFFSETS_3


def offset_subset(kernel_shape) -> np.ndarray:
    """Column indices into the 27-offset map for an asymmetric kernel.

    kernel_shape: e.g. (1, 3, 3) -> offsets with dx == 0.
    """
    keep = []
    for i, (dx, dy, dz) in enumerate(KERNEL_OFFSETS_3):
        ok = True
        for axis, k in enumerate(kernel_shape):
            d = (dx, dy, dz)[axis]
            if k == 1 and d != 0:
                ok = False
        if ok:
            keep.append(i)
    return np.array(keep, np.int32)


def pool_coords(coords, valid, stride_vec, capacity: int):
    """Coarse level = unique(floor(coords / stride)) (per-axis)."""
    sv = np.asarray(stride_vec, np.int32)
    pc = jnp.concatenate(
        [coords[:, 0:1]]
        + [
            (coords[:, i + 1 : i + 2] >> int(np.log2(sv[i]))) if sv[i] > 1 else coords[:, i + 1 : i + 2]
            for i in range(3)
        ],
        axis=1,
    )
    hi, lo = encode_coords(pc, valid)
    (uh, ul), rep, inverse, count = sorted_unique(hi, lo, capacity)
    vvalid = uh != SENTINEL_HI
    return {
        "coords": jnp.where(vvalid[:, None], decode_keys(uh, ul), 0),
        "valid": vvalid,
        "keys": (uh, ul),
        "count": count,
        "parent": inverse,  # fine row -> coarse row
    }


def strided_down_map(coarse_coords, coarse_valid, fine_keys, stride_vec):
    """[Nc, 27] fine-row indices: column d holds the fine site at
    stride*o + offset_d (k=3, p=1 window)."""
    offs = jnp.asarray(KERNEL_OFFSETS_3)
    sv = jnp.asarray(np.asarray(stride_vec, np.int32))
    q = coarse_coords[:, None, 1:4] * sv[None, None, :] + offs[None, :, :]
    b = jnp.broadcast_to(
        coarse_coords[:, None, 0:1], (coarse_coords.shape[0], offs.shape[0], 1)
    )
    qc = jnp.concatenate([b, q], axis=2).reshape(-1, 4)
    qv = jnp.broadcast_to(
        coarse_valid[:, None], (coarse_valid.shape[0], offs.shape[0])
    ).reshape(-1)
    qh, ql = encode_coords(qc, qv)
    idx = sorted_join(fine_keys[0], fine_keys[1], qh, ql)
    return idx.reshape(coarse_coords.shape[0], offs.shape[0])


def inverse_up_map(fine_coords, fine_valid, coarse_keys, stride_vec):
    """[Nf, 27] coarse-row indices for SparseInverseConv3d(k=3): column d is
    the coarse site (f - offset_d)/stride when the division is exact, else -1."""
    offs = jnp.asarray(KERNEL_OFFSETS_3)
    sv = np.asarray(stride_vec, np.int32)
    fo = fine_coords[:, None, 1:4] - offs[None, :, :]
    exact = jnp.ones(fo.shape[:2], bool)
    q = []
    for i in range(3):
        if sv[i] > 1:
            exact = exact & (fo[:, :, i] % sv[i] == 0)
            q.append(fo[:, :, i] // sv[i])
        else:
            q.append(fo[:, :, i])
    q = jnp.stack(q, axis=2)
    b = jnp.broadcast_to(
        fine_coords[:, None, 0:1], (fine_coords.shape[0], offs.shape[0], 1)
    )
    qc = jnp.concatenate([b, q], axis=2).reshape(-1, 4)
    qv = (
        jnp.broadcast_to(fine_valid[:, None], exact.shape) & exact
    ).reshape(-1)
    qh, ql = encode_coords(qc, qv)
    idx = sorted_join(coarse_keys[0], coarse_keys[1], qh, ql)
    return idx.reshape(fine_coords.shape[0], offs.shape[0])


def strided_gather_conv(fine_feats, down_map, weight, precision=None):
    """Apply the k=3 strided conv via its [Nc, 27] rulebook (weights [27,Ci,Co])."""
    from .conv import gather_conv

    return gather_conv(fine_feats, down_map, weight, precision=precision)
