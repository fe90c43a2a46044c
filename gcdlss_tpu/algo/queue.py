"""Fixed-shape FIFO feature queue (novel-candidate memory).

Replaces the reference's dynamically-sized `novel_queue` (a python list of
tensors, 20 batches, `exp_merge_mean_teacher.py:2226-2252`) with a static ring
buffer [slots, per_slot, dim] + per-slot counts that lives inside the jitted
train state. Push overwrites the oldest slot; `queue_flatten` exposes the
whole buffer with a validity mask for clustering.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FeatureQueue(NamedTuple):
    feats: jax.Array  # [slots, per_slot, dim]
    counts: jax.Array  # [slots] int32 valid rows per slot
    head: jax.Array  # int32 next slot to write


def queue_init(slots: int, per_slot: int, dim: int, dtype=jnp.float32) -> FeatureQueue:
    return FeatureQueue(
        feats=jnp.zeros((slots, per_slot, dim), dtype),
        counts=jnp.zeros((slots,), jnp.int32),
        head=jnp.zeros((), jnp.int32),
    )


def queue_push(q: FeatureQueue, feats: jax.Array, valid: jax.Array) -> FeatureQueue:
    """Push up to per_slot valid rows of `feats` into the next slot.

    Valid rows are compacted to the front (stable) so truncation keeps the
    first `per_slot` of them.
    """
    per_slot = q.feats.shape[1]
    n = feats.shape[0]
    order = jnp.argsort(~valid, stable=True)  # valid rows first
    compacted = feats[order]
    nvalid = jnp.sum(valid.astype(jnp.int32))
    take = jnp.minimum(nvalid, per_slot)
    if n >= per_slot:
        slot_feats = compacted[:per_slot]
    else:
        slot_feats = jnp.zeros((per_slot, feats.shape[1]), feats.dtype).at[:n].set(compacted)
    row_ok = jnp.arange(per_slot) < take
    slot_feats = slot_feats * row_ok[:, None]
    feats_new = q.feats.at[q.head].set(slot_feats)
    counts_new = q.counts.at[q.head].set(take)
    head_new = (q.head + 1) % q.feats.shape[0]
    return FeatureQueue(feats_new, counts_new, head_new)


def queue_flatten(q: FeatureQueue):
    """Returns (feats [slots*per_slot, dim], valid [slots*per_slot])."""
    slots, per_slot, dim = q.feats.shape
    flat = q.feats.reshape(slots * per_slot, dim)
    idx = jnp.arange(per_slot)[None, :]
    valid = (idx < q.counts[:, None]).reshape(-1)
    return flat, valid
