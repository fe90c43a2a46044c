"""RC-threshold-sweep test protocol (ExpRCTest / ExpMixExtraTest).

Rebuilds the reference's test-only modules (`modules/exp.py:3000-3290`):
forward the fine-tuned RC model over the validation set, and for each
novel-score threshold in a sweep, force points whose NCC probability
exceeds it into the unknown slot (ExpRCTest) — or subdivide them into two
novel classes by a KMeans(2) over their backbone features (ExpMixExtraTest,
`exp.py:3040-3055`) — then map predictions to real-label ids and score each
threshold with the strict-Hungarian protocol (`exp.py:3108-3135`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.minkunet import assemble_dummy_logits
from ..ops.plan import build_unet_plan
from ..train.common import voxel_batch_to_device, point_batch_to_device
from ..train.finetune import make_model
from .metrics import strict_hungarian_iou


DEFAULT_THRESHOLDS = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)


@partial(jax.jit, static_argnames=("cfg",))
def _sweep_fwd(params, batch_stats, vb, pb, cfg):
    """One eval forward: voxel-level dummy probs + feats, and the
    voxel-row per point (for point-level scoring like
    `discover_eval_step`)."""
    plan = build_unet_plan(vb["coords"], vb["valid"], cfg.voxel_caps,
                           presorted=True)
    n_in = vb["coords"].shape[0]
    ok = plan.rep < n_in
    safe = jnp.where(ok, plan.rep, 0)
    feats0 = vb["feats"][safe] * ok[:, None].astype(vb["feats"].dtype)
    model = make_model(cfg)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, plan, feats0,
        train=False,
    )
    probs = jax.nn.softmax(assemble_dummy_logits(out), axis=-1)
    cap0 = cfg.voxel_caps[0]
    vrow = pb["voxel_row"].reshape(-1)
    okp = vrow < n_in
    prow = plan.inverse[jnp.where(okp, vrow, 0)]
    okp = okp & (prow < cap0)
    srow = jnp.where(okp, prow, 0)
    pvalid = pb["valid"].reshape(-1) & okp
    return probs, out["feats"], srow, pvalid, pb["labels"].reshape(-1)


def threshold_sweep_test(
    params,
    batch_stats,
    val_dataset,
    cfg,
    label_mapping_inv: dict,
    known_real_labels,
    unknown_real_labels,
    thresholds=DEFAULT_THRESHOLDS,
    subdivide: bool = False,
    num_workers: int = 0,
    point_cap: int | None = None,
):
    """Returns {threshold: {"mIoU", "mIoU_old", "mIoU_new"}}.

    `subdivide=True` is the ExpMixExtraTest variant: predicted-novel points
    are split into two novel ids by KMeans(2) on their features; otherwise
    all go to the single unknown slot (ExpRCTest).
    """
    from ..data.loader import PrefetchLoader

    K = cfg.num_labeled_classes
    D = cfg.num_classes
    # train-id -> real-id LUT, novel slots extended in order
    # (`exp.py:3062-3065`)
    n_slots = K + (2 if subdivide else 1)
    inv = np.zeros(n_slots, np.int64)
    for tid, real in label_mapping_inv.items():
        if 0 <= tid < K:
            inv[tid] = real
    inv[K] = unknown_real_labels[0]
    if subdivide:
        inv[K + 1] = (
            unknown_real_labels[1]
            if len(unknown_real_labels) > 1 else unknown_real_labels[0]
        )

    loader = PrefetchLoader(
        val_dataset, cfg.num_sup_scans * 2, cfg.voxel_caps[0],
        point_cap=point_cap, shuffle=False, num_workers=num_workers,
        drop_last=False,
    )
    confs = {t: np.zeros((D, D), np.int64) for t in thresholds}
    for batch in loader:
        probs, feats, srow, pvalid, labels = _sweep_fwd(
            params, batch_stats,
            voxel_batch_to_device(batch["voxel"]),
            point_batch_to_device(batch["points"]), cfg,
        )
        probs = np.asarray(probs)
        feats = np.asarray(feats)
        srow = np.asarray(srow)
        pvalid = np.asarray(pvalid)
        labels = np.asarray(labels)
        base_pred = probs.argmax(-1)  # 0..K (K = unknown slot)
        rc = probs[:, -1]
        for t in thresholds:
            pred = base_pred.copy()
            novel = rc > t
            if subdivide and novel.sum() >= 2:
                try:
                    from sklearn.cluster import KMeans

                    kl = KMeans(n_clusters=2, n_init="auto",
                                random_state=0).fit_predict(feats[novel])
                except ImportError:  # pragma: no cover
                    med = np.median(feats[novel] @ np.ones(feats.shape[1]))
                    kl = (feats[novel] @ np.ones(feats.shape[1]) > med)
                    kl = kl.astype(np.int64)
                sub = np.where(kl == 0, K, K + 1)
                pred[novel] = sub
            else:
                pred[novel] = K
            pred_real = inv[pred]
            pp = pred_real[srow]
            m = pvalid & (labels >= 0) & (labels < D)
            np.add.at(confs[t], (pp[m], labels[m]), 1)

    results = {}
    for t, conf in confs.items():
        iou, _ = strict_hungarian_iou(conf, D)
        results[t] = {
            "mIoU": float(iou.mean()),
            "mIoU_old": float(iou[np.asarray(known_real_labels)].mean()),
            "mIoU_new": float(iou[np.asarray(unknown_real_labels)].mean()),
        }
    return results
