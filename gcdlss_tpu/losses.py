"""Training losses for Stage-1 pretrain and Stage-2 discovery.

All losses are masked, fixed-shape versions of the reference's objectives:
  * masked cross entropy (torch `CrossEntropyLoss(ignore_index=-1)`)
  * calibration loss — GT logit suppressed to -1e9, target = unknown slot
    (`modules/exp_merge_mean_teacher.py:2877-2895`)
  * mean-teacher MSE consistency on softmax probabilities (`:2833-2839`)
  * learnable-threshold hinge pair for the NCC head (`:2897-2918`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    valid: jax.Array | None = None,
    ignore_index: int = -1,
) -> jax.Array:
    """Mean CE over rows with label != ignore_index (and valid, if given)."""
    mask = labels != ignore_index
    if valid is not None:
        mask = mask & valid
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    m = mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def calibration_loss(
    logits: jax.Array,
    labels: jax.Array,
    unknown_label: int,
    valid: jax.Array | None = None,
) -> jax.Array:
    """CE towards the unknown slot with the GT class logit masked out.

    Rows whose GT *is* the unknown slot are ignored (reference sets their
    target to -1).
    """
    n, c = logits.shape
    safe = jnp.clip(labels, 0, c - 1)
    onehot = jax.nn.one_hot(safe, c, dtype=bool)
    masked_logits = jnp.where(onehot, NEG_INF, logits)
    tgt = jnp.where(labels == unknown_label, -1, unknown_label)
    tgt = jnp.where(labels < 0, -1, tgt)
    return cross_entropy(masked_logits, tgt, valid)


def mse_prob_loss(
    probs_a: jax.Array, probs_b: jax.Array, valid: jax.Array | None = None
) -> jax.Array:
    """Mean squared error between probability rows, averaged over valid rows
    and all classes (torch `F.mse_loss` reduction='mean')."""
    d = jnp.square(probs_a - probs_b)
    if valid is None:
        return jnp.mean(d)
    m = valid[:, None].astype(d.dtype)
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m) * d.shape[1], 1.0)


def adaptive_threshold_loss(
    ncc_logits: jax.Array,
    labels: jax.Array,
    unknown_label: int,
    tau: jax.Array,
    valid: jax.Array | None = None,
) -> jax.Array:
    """hinge(known ncc - tau) + hinge(tau - unknown ncc), each mean over its set.

    Matches the reference exactly, including each term vanishing when its set
    is empty.
    """
    base = labels >= 0
    if valid is not None:
        base = base & valid
    known = base & (labels != unknown_label)
    unknown = base & (labels == unknown_label)

    def masked_mean(x, m):
        mm = m.astype(jnp.float32)
        s = jnp.sum(mm)
        return jnp.where(s > 0, jnp.sum(x * mm) / jnp.maximum(s, 1.0), 0.0)

    loss_known = masked_mean(jax.nn.relu(ncc_logits - tau), known)
    loss_unknown = masked_mean(jax.nn.relu(tau - ncc_logits), unknown)
    return loss_known + loss_unknown


def soft_cross_entropy(logits: jax.Array, target_probs: jax.Array,
                       valid: jax.Array | None = None) -> jax.Array:
    """CE against soft targets (for feature-mixing variants)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.sum(target_probs * logp, axis=-1)
    if valid is None:
        return jnp.mean(nll)
    m = valid.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
