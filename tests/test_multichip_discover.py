"""DP-invariance of the *discovery* step on the virtual 8-device CPU mesh.

The Stage-2 claims that matter under data parallelism are global-state
consistency: candidate mining, k-means, the queue and tau must see the same
global batch regardless of sharding (`train/discover.py` module docstring;
SURVEY §2.5 state-sync requirements). This asserts 1-device vs 8-device
equality of loss / tau / n_cand / n_rel / queue occupancy at realistic-ish
caps (8k voxels).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.e2e]

from gcdlss_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_voxel_batch,
    shard_point_batch,
)
from gcdlss_tpu.train.discover import (
    DiscoverConfig,
    create_discover_state,
    discover_train_step,
)

CAP = 8192
HALF = CAP // 2
POINT_CAP = 2048
NSCANS = 2


def _cfg():
    caps = (CAP, CAP // 2, CAP // 4, CAP // 8, CAP // 8)
    return DiscoverConfig(
        num_labeled_classes=17,
        num_unlabeled_classes=2,
        num_classes=19,
        unknown_label=17,
        voxel_caps=caps,
        sup_voxel_cap=HALF,
        mix_voxel_caps=caps,
        num_sup_scans=NSCANS,
        point_cap=POINT_CAP,
        voxel_size=0.1,
        arch="MinkUNet14",
        planes=(8, 8, 8, 8, 8, 8, 8, 8),
        feat_dim=8,
        cand_cap=512,
        queue_slots=4,
        queue_per_slot=128,
        kmeans_iters=3,
        steps_per_epoch=2,
        epochs=2,
        warmup_epochs=1,
    )


def _mk_voxel(rng, cap, nsc, voxel_size):
    pts = rng.uniform(-25, 25, size=(cap, 3))
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
        "labels": jnp.asarray(rng.integers(0, 18, cap).astype(np.int32)),
        "mapped_labels": jnp.asarray(rng.integers(0, 18, cap).astype(np.int32)),
        "valid": jnp.ones((cap,), bool),
    }


def _mk_points(rng, nsc, p, vcap):
    return {
        "xyz": jnp.asarray(rng.uniform(-25, 25, (nsc, p, 3)).astype(np.float32)),
        "feats": jnp.asarray(rng.uniform(0, 1, (nsc, p, 1)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 18, (nsc, p)).astype(np.int32)),
        "mapped_labels": jnp.asarray(rng.integers(0, 18, (nsc, p)).astype(np.int32)),
        "valid": jnp.ones((nsc, p), bool),
        "voxel_row": jnp.asarray(rng.integers(0, vcap, (nsc, p)).astype(np.int32)),
    }


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_discover_step_dp_invariant():
    cfg = _cfg()
    rng = np.random.default_rng(7)
    sup_vb = _mk_voxel(rng, HALF, NSCANS, cfg.voxel_size)
    unsup_vb = _mk_voxel(rng, CAP - HALF, NSCANS, cfg.voxel_size)
    sup_pb = _mk_points(rng, NSCANS, POINT_CAP, HALF)
    unsup_pb = _mk_points(rng, NSCANS, POINT_CAP, CAP - HALF)

    # single device
    state1 = create_discover_state(jax.random.PRNGKey(3), cfg)
    new1, m1 = discover_train_step(state1, sup_vb, sup_pb, unsup_vb, unsup_pb, cfg)
    q1 = int(jnp.sum(new1.queue.counts))

    # 8-device data parallel: params replicated, buffers sharded
    mesh = make_mesh(8)
    state8 = create_discover_state(jax.random.PRNGKey(3), cfg)
    state8 = replicate(state8, mesh)
    new8, m8 = discover_train_step(
        state8,
        shard_voxel_batch(sup_vb, mesh),
        shard_point_batch(sup_pb, mesh),
        shard_voxel_batch(unsup_vb, mesh),
        shard_point_batch(unsup_pb, mesh),
        cfg,
    )
    q8 = int(jnp.sum(new8.queue.counts))

    assert np.isfinite(float(m1["loss"]))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=2e-3)
    np.testing.assert_allclose(float(m8["tau"]), float(m1["tau"]), rtol=1e-4, atol=1e-6)
    assert int(m8["n_cand"]) == int(m1["n_cand"])
    assert int(m8["n_rel"]) == int(m1["n_rel"])
    assert q8 == q1
