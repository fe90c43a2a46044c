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

    Stride-2 pooling of 5 cm LiDAR voxels sheds only ~20-40% per level
    (scans are thin 2D surfaces; far-field voxels survive every level as
    singleton chains). Measured un-truncated populations on the bench
    workload (4 x 80k-pt scans at cap0 = 276 480): 264 903 / 215 086 /
    154 657 / 104 775 / 63 338 — i.e. 0.78 / 0.56 / 0.38 / 0.23 of cap0.
    These ratios carry 13-18% headroom over that chain. The pre-round-5
    ratios (0.60/0.30/0.13/0.06) silently truncated 23-74% of the L1-L4
    voxels at KITTI scale — spatially biased, since sorted-key capacity
    overflow drops the highest (batch, x) regions wholesale (BENCH.md
    round-5 capacity audit); `plan_capacity_overflow` now surfaces any
    residual truncation as a per-step metric.
    """

    def r(x):
        return max(256, int(-(-x // 256)) * 256)

    return (n0, r(n0 * 0.88), r(n0 * 0.64), r(n0 * 0.44), r(n0 * 0.27))


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
