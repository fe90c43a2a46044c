"""Small utilities (rebuild of `utils/utils.py:9-97`)."""

from __future__ import annotations

import numpy as np


class TransformTwice:
    """Apply a transform twice to produce two augmented views."""

    def __init__(self, transform):
        self.transform = transform

    def __call__(self, inp):
        return self.transform(inp), self.transform(inp)


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def cluster_acc(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Clustering accuracy with optimal label permutation (Hungarian)."""
    from scipy.optimize import linear_sum_assignment

    y_true = y_true.astype(np.int64)
    y_pred = y_pred.astype(np.int64)
    d = max(y_pred.max(), y_true.max()) + 1
    w = np.zeros((d, d), np.int64)
    for t, p in zip(y_true, y_pred):
        w[p, t] += 1
    row, col = linear_sum_assignment(w.max() - w)
    return float(w[row, col].sum()) / max(y_pred.size, 1)


def entropy(probs):
    """Mean entropy of a batch of probability rows (numpy or jax array)."""
    import jax.numpy as jnp

    p = jnp.clip(probs, 1e-8, 1.0)
    return -jnp.mean(jnp.sum(p * jnp.log(p), axis=-1))


def margin_loss(logits, labels, margin: float = 10.0, weight=None):
    """Large-margin CE: subtract `margin` from the GT logit before softmax."""
    import jax
    import jax.numpy as jnp

    c = logits.shape[-1]
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, c - 1), c)
    adj = logits - margin * onehot
    logp = jax.nn.log_softmax(adj, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.clip(labels, 0, c - 1)[:, None], axis=1)[:, 0]
    if weight is not None:
        nll = nll * weight[jnp.clip(labels, 0, c - 1)]
    mask = (labels >= 0).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
