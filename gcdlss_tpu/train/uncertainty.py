"""ExpUncertaintyCheck: rank unlabeled scans by prediction entropy.

Rebuild of `modules/exp.py:2799-2998`: a warm-started MinkUNetRC scores every
unlabeled scan by the mean softmax entropy of its dummy logits; scan indices
sorted by descending uncertainty are written to an `.npy` ordering file (the
`uncertain_idx_file` consumed by `ExpDiscover`'s `use_first_dataloader` path,
`exp.py:5085-5101`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.minkunet import assemble_dummy_logits
from ..ops.plan import build_unet_plan
from .finetune import FineTuneConfig, make_model


@partial(jax.jit, static_argnames=("cfg",))
def scan_uncertainty(params, batch_stats, batch: dict, cfg: FineTuneConfig):
    """Mean entropy of the dummy logits over one scan's valid voxels
    (`exp.py:2934-2944`)."""
    model = make_model(cfg)
    plan = build_unet_plan(batch["coords"], batch["valid"], cfg.voxel_caps,
                           presorted=True)
    n_in = batch["coords"].shape[0]
    ok = plan.rep < n_in
    safe = jnp.where(ok, plan.rep, 0)
    feats0 = batch["feats"][safe] * ok[:, None].astype(batch["feats"].dtype)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        plan, feats0, train=False,
    )
    logits = assemble_dummy_logits(out)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    ent = -jnp.sum(probs * jnp.log(probs + 1e-8), axis=-1)
    m = plan.levels[0].valid.astype(jnp.float32)
    return jnp.sum(ent * m) / jnp.maximum(jnp.sum(m), 1.0)


def rank_uncertain_scans(params, batch_stats, dataset, cfg: FineTuneConfig,
                         voxel_cap: int, out_file: str | None = None):
    """Score every scan; return indices sorted by DESCENDING uncertainty
    (`exp.py:2966-2981`); optionally save the `.npy` ordering file."""
    from ..data.collation import collate_batch

    scores = []
    for i in range(len(dataset)):
        sample = dataset[i]
        batch = collate_batch([sample], voxel_cap)
        vb = {
            "coords": jnp.asarray(batch["voxel"].coords),
            "feats": jnp.asarray(batch["voxel"].feats),
            "valid": jnp.asarray(batch["voxel"].valid),
        }
        scores.append(float(scan_uncertainty(params, batch_stats, vb, cfg)))
    order = np.argsort(-np.asarray(scores), kind="stable").astype(np.int64)
    if out_file:
        np.save(out_file, order)
    return order, np.asarray(scores)
