"""Shared training utilities: state containers, optimizer, batch conversion."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..ops.plan import build_unet_plan


def default_caps(n0: int) -> tuple:
    """Per-level voxel capacities for a stride-1 capacity n0.

    LiDAR scans are 2D surfaces embedded in 3D, so stride-2 pooling removes
    roughly 40-50% of voxels per level (measured on synthetic + real scans);
    these ratios keep ~2x headroom at the coarse levels.
    """

    def r(x):
        return max(256, int(-(-x // 256)) * 256)

    return (n0, r(n0 * 0.60), r(n0 * 0.30), r(n0 * 0.13), r(n0 * 0.06))


def make_sgd(cfg, schedule):
    """torch-style SGD: wd added to grad, then momentum buffer, then lr."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def voxel_batch_to_device(vb) -> dict:
    """VoxelBatchNp -> dict of jnp arrays."""
    out = {
        "coords": jnp.asarray(vb.coords),
        "feats": jnp.asarray(vb.feats),
        "labels": jnp.asarray(vb.labels),
        "mapped_labels": jnp.asarray(vb.mapped_labels),
        "valid": jnp.asarray(vb.valid),
    }
    if getattr(vb, "point_ids", None) is not None:
        out["point_ids"] = jnp.asarray(vb.point_ids)
    return out


def point_batch_to_device(pb) -> dict:
    return {
        "xyz": jnp.asarray(pb.xyz),
        "feats": jnp.asarray(pb.feats),
        "labels": jnp.asarray(pb.labels),
        "mapped_labels": jnp.asarray(pb.mapped_labels),
        "valid": jnp.asarray(pb.valid),
        "voxel_row": jnp.asarray(pb.voxel_row),
    }


def plan_and_gather(batch: dict, caps: tuple):
    """Build the UNet plan and permute input rows into plan (sorted) order.

    Returns (plan, feats0, labels0, mapped0) where index i refers to the
    plan's level-0 row i.
    """
    plan = build_unet_plan(batch["coords"], batch["valid"], caps,
                           presorted=True)
    n = batch["coords"].shape[0]
    rep = plan.rep
    ok = rep < n
    safe = jnp.where(ok, rep, 0)
    feats0 = batch["feats"][safe] * ok[:, None].astype(batch["feats"].dtype)
    labels0 = jnp.where(ok, batch["labels"][safe], -1)
    mapped0 = jnp.where(ok, batch["mapped_labels"][safe], -1)
    return plan, feats0, labels0, mapped0


def inv_label_lut(label_mapping_inv: dict, num_ids: int, extra: dict | None = None) -> np.ndarray:
    """Dense LUT: compressed prediction id -> train-label id.

    `extra` adds discovery-time extensions (novel slot i -> unknown real id).
    """
    lut = np.zeros(num_ids, np.int32)
    src = dict(label_mapping_inv)
    if extra:
        src.update(extra)
    for k, v in src.items():
        if 0 <= k < num_ids:
            lut[k] = v
    return lut
