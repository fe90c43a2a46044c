"""NOPS-style single-model discovery loops (ExpDiscover / Joint / SwaV).

Fixture e2e: each step runs jitted on synthetic voxel batches, returns finite
losses, fires the novel branch, and pushes the mean-reliable vector into the
queue. (Reference: `modules/exp.py:5050-5330, 4452-4600, 4680-4980`.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.e2e

from gcdlss_tpu.train.nops import (
    NopsConfig,
    create_nops_state,
    nops_train_step,
    swav_train_step,
)

CAP = 2048
HALF = CAP // 2


def _cfg(**kw):
    caps = (CAP, 1024, 512, 512, 256)
    base = dict(
        num_labeled_classes=17,
        num_unlabeled_classes=2,
        num_classes=19,
        unknown_label=17,
        voxel_caps=caps,
        sup_voxel_cap=HALF,
        num_sup_scans=2,
        arch="MinkUNet14",
        planes=(8, 8, 8, 8, 8, 8, 8, 8),
        feat_dim=8,
        cand_cap=256,
        queue_slots=4,
        kmeans_iters=3,
        prob_threshold=0.01,  # low so the fixture reliably mines candidates
        steps_per_epoch=2,
        epochs=2,
        warmup_epochs=1,
    )
    base.update(kw)
    return NopsConfig(**base)


def _mk_voxel(rng, cap, nsc, voxel_size=0.1):
    pts = rng.uniform(-15, 15, size=(cap, 3))
    coords = np.concatenate(
        [
            rng.integers(0, nsc, size=(cap, 1)).astype(np.int32),
            np.floor(pts / voxel_size).astype(np.int32),
        ],
        axis=1,
    )
    order = np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))
    coords = coords[order]
    return {
        "coords": jnp.asarray(coords),
        "feats": jnp.asarray(rng.uniform(0, 1, (cap, 1)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 17, cap).astype(np.int32)),
        "mapped_labels": jnp.asarray(rng.integers(0, 17, cap).astype(np.int32)),
        "valid": jnp.ones((cap,), bool),
        # per-row original-point identity (unique within scan): cross-view
        # candidate intersection key for the SwaV step
        "point_ids": jnp.asarray(np.arange(cap, dtype=np.int32)[order]),
    }


def test_expdiscover_step():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    sup = _mk_voxel(rng, HALF, 2)
    unsup = _mk_voxel(rng, CAP - HALF, 2)
    state = create_nops_state(jax.random.PRNGKey(0), cfg)
    state, m = nops_train_step(state, sup, unsup, cfg)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1
    if int(m["has_novel"]):
        assert int(jnp.sum(state.queue.counts)) >= 1
    # second step trains (donated state, loss finite)
    state2, m2 = nops_train_step(state, sup, unsup, cfg)
    assert np.isfinite(float(m2["loss"]))
    assert int(state2.step) == 2


def test_joint_step():
    cfg = _cfg(joint_logits=True, use_mix_features=True, novel_coeff=0.002)
    rng = np.random.default_rng(1)
    sup = _mk_voxel(rng, HALF, 2)
    unsup = _mk_voxel(rng, CAP - HALF, 2)
    state = create_nops_state(jax.random.PRNGKey(1), cfg)
    state, m = nops_train_step(state, sup, unsup, cfg)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["sup_seg"]))


def test_expmixdiscover_step():
    """ExpMixDiscover (`exp.py:3587-3990`): centroid mixing + unsup mixed
    seg loss + entropy minimization on the NOPS chassis, via its registry
    recipe."""
    from gcdlss_tpu.train.registry import MODULE_REGISTRY

    stage, overrides = MODULE_REGISTRY["ExpMixDiscover"]
    assert stage == "nops"
    cfg = _cfg(**overrides)
    assert cfg.mix_centroid and cfg.entropy_minimize
    assert cfg.unsup_mix_coeff == 0.1
    rng = np.random.default_rng(3)
    sup = _mk_voxel(rng, HALF, 2)
    unsup = _mk_voxel(rng, CAP - HALF, 2)
    state = create_nops_state(jax.random.PRNGKey(3), cfg)
    state, m = nops_train_step(state, sup, unsup, cfg)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["unsup_mix"]))
    assert float(m["unsup_mix"]) != 0.0  # pseudo-GT + mixed terms fired
    assert np.isfinite(float(m["entropy"]))
    state2, m2 = nops_train_step(state, sup, unsup, cfg)
    assert np.isfinite(float(m2["loss"]))


def test_swav_step():
    cfg = _cfg()
    rng = np.random.default_rng(2)
    sup = _mk_voxel(rng, HALF, 2)
    unsup = _mk_voxel(rng, CAP - HALF, 2)
    # second view: same scans/points (same identities), fresh feature draw --
    # two augmentation draws of the same data, like the paired loaders
    sup2 = dict(sup, feats=jnp.asarray(
        rng.uniform(0, 1, (HALF, 1)).astype(np.float32)))
    unsup2 = dict(unsup, feats=jnp.asarray(
        rng.uniform(0, 1, (CAP - HALF, 1)).astype(np.float32)))
    state = create_nops_state(jax.random.PRNGKey(2), cfg)
    state, m = swav_train_step(state, sup, unsup, sup2, unsup2, cfg)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_registry_resolves_nops():
    from gcdlss_tpu.train.registry import MODULE_REGISTRY, resolve_module

    for name in ("ExpDiscover", "ExpMixDiscoverJoint", "ExpMixDiscoverSwaV"):
        stage, overrides = resolve_module(name)
        assert stage in ("nops", "nops_swav")
    assert MODULE_REGISTRY["ExpMixDiscoverJoint"][1]["joint_logits"]
