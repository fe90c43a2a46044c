"""Lovasz-Softmax loss (jax), used by the Cylinder3D head
(reference `models/decoder.py:182-326` via mmdet3d's LovaszLoss).

Fixed-shape implementation: the per-class error sort runs over the padded
point set with invalid rows pushed to the end (weight 0), so the Lovasz
gradient of the Jaccard extension is exact over the valid prefix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension w.r.t. sorted errors."""
    gts = jnp.sum(gt_sorted)
    n = gt_sorted.shape[0]
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_softmax(probs, labels, valid=None, classes="present"):
    """probs [N, C] softmax probabilities, labels [N] int (-1 ignore)."""
    n, c = probs.shape
    if valid is None:
        valid = jnp.ones((n,), bool)
    valid = valid & (labels >= 0)
    vm = valid.astype(probs.dtype)

    def one_class(ci):
        fg = ((labels == ci) & valid).astype(probs.dtype)
        errors = jnp.abs(fg - probs[:, ci]) * vm
        # sort descending; invalid rows (error 0) fall to the end
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        grad = _lovasz_grad(fg_sorted)
        loss_c = jnp.sum(errors_sorted * grad)
        present = jnp.sum(fg) > 0
        return loss_c, present

    losses, presents = jax.vmap(one_class)(jnp.arange(c))
    if classes == "present":
        pm = presents.astype(probs.dtype)
        return jnp.sum(losses * pm) / jnp.maximum(jnp.sum(pm), 1.0)
    return jnp.mean(losses)
