"""Evaluation: confusion matrices, IoU, Hungarian matching protocols.

Rebuilds the reference's eval stack:
  * in-graph confusion-matrix accumulation (replaces the per-scan
    `np.add.at` host loops at `modules/exp.py:298-311`,
    `exp_merge_mean_teacher.py:2308-2319` with one scatter-add on device);
  * `get_iou` (`exp_merge_mean_teacher.py:2617-2628`);
  * Stage-1 strict-Hungarian protocol (`exp.py:323-334`);
  * Stage-2 discovery protocol — Hungarian on the unknown x unknown submatrix
    only, then column permutation (`exp_merge_mean_teacher.py:2332-2390`);
  * `SemanticEval` utility (numpy confusion/IoU, `utils/eval.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_update(
    preds: jax.Array,
    labels: jax.Array,
    num_classes: int,
    valid: jax.Array | None = None,
) -> jax.Array:
    """[D, D] counts with conf[pred, label] += 1 over valid rows (in-graph)."""
    mask = (labels >= 0) & (labels < num_classes) & (preds >= 0) & (preds < num_classes)
    if valid is not None:
        mask = mask & valid
    idx = jnp.where(mask, preds * num_classes + labels, num_classes * num_classes)
    flat = jnp.zeros((num_classes * num_classes + 1,), jnp.int32).at[idx].add(
        jnp.ones_like(idx, jnp.int32)
    )
    return flat[:-1].reshape(num_classes, num_classes)


def get_iou(conf_matrix: np.ndarray, include=None) -> np.ndarray:
    conf = conf_matrix.astype(np.float64)
    tp = conf.diagonal()
    fp = conf.sum(axis=1) - tp
    fn = conf.sum(axis=0) - tp
    union = np.maximum(tp + fp + fn, 1e-15)
    iou = tp / union
    return iou if include is None else iou[include]


def hungarian(cost: np.ndarray):
    """Max-assignment indices via scipy (host-side; matrices are tiny)."""
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(cost.max() - cost)


def strict_hungarian_iou(conf: np.ndarray, num_classes: int):
    """Stage-1 protocol: full-matrix Hungarian then per-class IoU."""
    row_ind, col_ind = hungarian(conf)
    ind = np.vstack([row_ind, col_ind]).T
    permuted = conf[:, ind[:, 1]]
    include = np.argsort(ind[:, 1])[:num_classes]
    return get_iou(permuted, include), include


def discovery_iou(conf: np.ndarray, known_ids, unknown_ids, num_classes: int):
    """Stage-2 protocol: Hungarian only over the unknown x unknown submatrix.

    Returns (iou_all_classes, miou, miou_old, miou_new).
    """
    conf = conf.copy()
    unknown_ids = np.asarray(list(unknown_ids))
    known_ids = np.asarray(list(known_ids))
    sub = conf[np.ix_(unknown_ids, unknown_ids)]
    _, col_ind = hungarian(sub)
    conf[:, unknown_ids] = conf[:, unknown_ids[col_ind]]
    include = np.arange(num_classes)
    include[unknown_ids] = unknown_ids[np.argsort(col_ind)]
    iou = get_iou(conf, include)
    return iou, float(iou.mean()), float(iou[known_ids].mean()), float(iou[unknown_ids].mean())


class SemanticEval:
    """Streaming numpy confusion/IoU evaluator (cf. `utils/eval.py`,
    `utils/np_ioueval.py`)."""

    def __init__(self, num_classes: int, ignore=()):
        self.num_classes = num_classes
        self.ignore = set(ignore)
        self.include = [c for c in range(num_classes) if c not in self.ignore]
        self.reset()

    def reset(self):
        self.conf = np.zeros((self.num_classes, self.num_classes), np.int64)

    def add_batch(self, preds: np.ndarray, labels: np.ndarray):
        mask = (labels >= 0) & (labels < self.num_classes)
        mask &= (preds >= 0) & (preds < self.num_classes)
        np.add.at(self.conf, (preds[mask], labels[mask]), 1)

    def get_sem_iou(self):
        iou = get_iou(self.conf)
        return float(np.mean(iou[self.include])), iou

    def get_sem_acc(self):
        tp = self.conf.diagonal()[self.include].sum()
        total = max(self.conf[self.include].sum(), 1)
        return float(tp / total)
