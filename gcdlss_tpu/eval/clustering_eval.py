"""Offline full-validation novel-class clustering evaluation.

BASELINE config #5: extract backbone features over the validation split, then
discover novel classes by clustering rather than by the trained novel head —
semi-supervised k-means anchored on known-class feature means
(`utils/clustering.py` OnlineSemiKMeans / `fit_mix`), or Sinkhorn-Knopp
assignment against head prototypes (`utils/sinkhorn_knopp.py`), followed by
the discovery Hungarian mIoU protocol.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..algo.clustering import OnlineSemiKMeans
from ..algo.sinkhorn import sinkhorn_knopp
from .metrics import discovery_iou


def extract_features(forward_fn, loader, feat_dim: int, max_voxels: int = 2_000_000):
    """Run `forward_fn(batch) -> (feats [N,C], mapped [N], labels [N], valid [N])`
    over a loader, returning stacked numpy arrays."""
    fs, ms, ls = [], [], []
    total = 0
    for batch in loader:
        f, m, l, v = forward_fn(batch)
        v = np.asarray(v)
        fs.append(np.asarray(f)[v])
        ms.append(np.asarray(m)[v])
        ls.append(np.asarray(l)[v])
        total += int(v.sum())
        if total >= max_voxels:
            break
    return np.concatenate(fs), np.concatenate(ms), np.concatenate(ls)


def clustering_discovery_eval(
    feats: np.ndarray,
    mapped_labels: np.ndarray,
    real_labels: np.ndarray,
    unknown_label: int,
    known_real_labels,
    unknown_real_labels,
    num_classes: int,
    label_mapping_inv: dict,
    method: str = "semi_kmeans",
    seed: int = 0,
):
    """Cluster unknown-candidate features and score with the discovery protocol.

    Known-labeled voxels keep their (mapped->real) predictions; voxels whose
    GT is the unknown slot are clustered into #unknown groups.
    """
    num_unknown = len(unknown_real_labels)
    is_unknown = mapped_labels == unknown_label
    u_feats = feats[is_unknown]
    l_feats = feats[~is_unknown]
    l_targets = mapped_labels[~is_unknown]

    if method == "semi_kmeans":
        km = OnlineSemiKMeans(
            k=int(l_targets.max()) + 1 + num_unknown, max_iterations=50,
            n_init=1, seed=seed,
        )
        all_labels = km.fit_mix(u_feats, l_feats, l_targets)
        u_assign = all_labels[l_feats.shape[0]:] - (int(l_targets.max()) + 1)
        u_assign = np.clip(u_assign, 0, num_unknown - 1)
    elif method == "sinkhorn":
        # prototypes = unknown-cluster centroids from plain kmeans init
        from ..algo.kmeans import cosine_kmeans

        a, cents = cosine_kmeans(
            jnp.asarray(u_feats), jnp.ones(u_feats.shape[0], bool),
            num_unknown, jax.random.PRNGKey(seed),
        )
        q = sinkhorn_knopp(jnp.asarray(u_feats), jnp.asarray(cents).T)
        u_assign = np.asarray(jnp.argmax(q, axis=-1))
    else:
        raise ValueError(method)

    # build point-level predictions in real-label space
    inv_lut = np.zeros(max(label_mapping_inv.keys()) + 1, np.int32)
    for k, v in label_mapping_inv.items():
        if k >= 0:
            inv_lut[k] = v
    preds = np.empty(feats.shape[0], np.int32)
    preds[~is_unknown] = inv_lut[np.clip(l_targets, 0, inv_lut.shape[0] - 1)]
    unknown_real = np.asarray(list(unknown_real_labels))
    preds[is_unknown] = unknown_real[u_assign]

    conf = np.zeros((num_classes, num_classes), np.int64)
    ok = (real_labels >= 0) & (real_labels < num_classes)
    np.add.at(conf, (preds[ok], real_labels[ok]), 1)
    iou, miou, miou_old, miou_new = discovery_iou(
        conf, known_real_labels, unknown_real_labels, num_classes
    )
    return {
        "mIoU": miou, "mIoU_old": miou_old, "mIoU_new": miou_new,
        "iou": iou, "conf": conf,
    }
