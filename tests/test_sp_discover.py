"""Voxel-sharded (SP) Stage-2 discovery step parity on the virtual CPU mesh.

The discovery step's three backbone passes run inside shard_map with ring
halo exchange (`parallel/sp_discover.py`); mining/k-means/Hungarian/queue
stay global. Asserts the 8-way voxel-sharded step equals the single-device
step: loss/tau to float tolerance, candidate/reliable counts and queue
occupancy exactly, updated student params to tolerance, with zero halo
overflow.

The fixture is scan-shaped (bench.synth_scan_points) with per-level caps
fitted at an ALIGNED overhead factor over the measured coarsening counts:
random-uniform clouds leave the deep levels almost empty, which turns the
pool halos from structural (plane-sized) into fill-skew-sized — larger
than the ring's (d-1)/2-hop reach. Aligned fill fractions are exactly how
production caps are tuned (`train/common.default_caps`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.e2e]

from jax.sharding import Mesh

from gcdlss_tpu.parallel.sp_step import backbone_halos
from gcdlss_tpu.parallel.sp_discover import (
    make_sp_discover_step,
    probe_mix_plan,
)
from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.train.discover import (
    DiscoverConfig,
    _combine_batches,
    create_discover_state,
    discover_train_step,
)

NSCANS = 2
POINT_CAP = 2048
VOXEL = 0.5


def _pad8(n: int) -> int:
    return -(-int(n) // 8) * 8


def _level_counts(rows: np.ndarray, num_levels: int = 5) -> list:
    """Measured unique counts down the stride pyramid for [N,4] coords."""
    c = np.unique(rows, axis=0)
    out = []
    for _ in range(num_levels):
        out.append(len(c))
        c = np.unique(
            np.concatenate([c[:, :1], c[:, 1:] >> 1], axis=1), axis=0)
    return out


def _mk_side(rng, nsc):
    """nsc scan-like point clouds + their per-scan quantized voxel rows."""
    import bench as benchmod

    xyz = np.stack(
        [benchmod.synth_scan_points(rng, POINT_CAP) for _ in range(nsc)]
    ).astype(np.float32)
    vox = []
    for s in range(nsc):
        c = np.unique(np.floor(xyz[s] / VOXEL).astype(np.int32), axis=0)
        vox.append(np.concatenate([np.full((len(c), 1), s, np.int32), c], 1))
    return xyz, vox


def _vb(rng, vox_rows, cap):
    coords = np.concatenate(vox_rows)
    n = len(coords)
    assert n <= cap
    full = np.zeros((cap, 4), np.int32)
    full[:n] = coords
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    labels = rng.integers(0, 18, cap).astype(np.int32)
    return {
        "coords": jnp.asarray(full),
        "feats": jnp.asarray(rng.uniform(0, 1, (cap, 1)).astype(np.float32)),
        "labels": jnp.asarray(labels),
        "mapped_labels": jnp.asarray(labels),
        "valid": jnp.asarray(valid),
    }


def _pb(rng, xyz, vcap):
    nsc, p = xyz.shape[:2]
    return {
        "xyz": jnp.asarray(xyz),
        "feats": jnp.asarray(rng.uniform(0, 1, (nsc, p, 1)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 18, (nsc, p)).astype(np.int32)),
        "mapped_labels": jnp.asarray(
            rng.integers(0, 18, (nsc, p)).astype(np.int32)),
        "valid": jnp.ones((nsc, p), bool),
        "voxel_row": jnp.asarray(rng.integers(0, vcap, (nsc, p)).astype(np.int32)),
    }


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_discover_step_sp_parity():
    rng = np.random.default_rng(11)
    sup_xyz, sup_vox = _mk_side(rng, NSCANS)
    unsup_xyz, unsup_vox = _mk_side(rng, NSCANS)

    # side caps: equal, padded; combined cap0 = 2*S by construction
    n_sup = sum(len(v) for v in sup_vox)
    n_unsup = sum(len(v) for v in unsup_vox)
    S = _pad8(int(1.15 * max(n_sup, n_unsup)))

    # combined pyramid counts -> deeper caps at the SAME overhead factor
    # as level 0 (aligned fill fractions keep pool halos structural)
    comb = np.concatenate(
        sup_vox
        + [v + np.array([[NSCANS, 0, 0, 0]], np.int32) for v in unsup_vox]
    )
    counts = _level_counts(comb)
    factor = (2 * S) / counts[0]
    caps = (2 * S,) + tuple(_pad8(int(c * factor) + 8) for c in counts[1:])

    # mixed-cloud caps: per-pair voxel-set unions bound the mixed scans
    uni = np.concatenate([
        np.concatenate([
            np.full((len(sup_vox[s]) + len(unsup_vox[s]), 1), s, np.int32),
            np.concatenate([sup_vox[s][:, 1:], unsup_vox[s][:, 1:]]),
        ], axis=1)
        for s in range(NSCANS)
    ])
    mix_counts = _level_counts(uni)
    mix_caps = tuple(_pad8(int(c * 1.3) + 8) for c in mix_counts)

    cfg = DiscoverConfig(
        num_labeled_classes=17,
        num_unlabeled_classes=2,
        num_classes=19,
        unknown_label=17,
        voxel_caps=caps,
        sup_voxel_cap=S,
        mix_voxel_caps=mix_caps,
        num_sup_scans=NSCANS,
        point_cap=POINT_CAP,
        voxel_size=VOXEL,
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

    sup_vb = _vb(rng, sup_vox, S)
    unsup_vb = _vb(rng, unsup_vox, S)
    sup_pb = _pb(rng, sup_xyz, S)
    unsup_pb = _pb(rng, unsup_xyz, S)

    # single device
    state1 = create_discover_state(jax.random.PRNGKey(5), cfg)
    new1, m1 = discover_train_step(
        state1, sup_vb, sup_pb, unsup_vb, unsup_pb, cfg)

    # halo sizing: combined plan directly, mixed plan via the eager probe
    # (same state/batch/rng as the sharded run, so the probe is exact; the
    # 1.5x margin plus the sp_overflow metric cover real multi-step runs)
    coords, _, _, valid = _combine_batches(sup_vb, unsup_vb, cfg)
    plan = jax.jit(
        lambda c, v: build_unet_plan(c, v, cfg.voxel_caps, presorted=True)
    )(coords, valid)
    halos = backbone_halos(plan, 8)
    probe_state = create_discover_state(jax.random.PRNGKey(5), cfg)
    mix_plan = probe_mix_plan(
        cfg, probe_state, sup_vb, sup_pb, unsup_vb, unsup_pb)
    mix_halos = backbone_halos(mix_plan, 8)

    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    state8 = create_discover_state(jax.random.PRNGKey(5), cfg)
    step = make_sp_discover_step(cfg, mesh, halos, mix_halos)
    new8, m8 = step(state8, sup_vb, sup_pb, unsup_vb, unsup_pb)

    assert int(m8["sp_overflow"]) == 0, (halos, mix_halos)
    assert np.isfinite(float(m1["loss"]))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=2e-3)
    np.testing.assert_allclose(float(m8["tau"]), float(m1["tau"]),
                               rtol=1e-4, atol=1e-6)
    assert int(m8["n_cand"]) == int(m1["n_cand"])
    assert int(m8["n_rel"]) == int(m1["n_rel"])
    assert int(jnp.sum(new8.queue.counts)) == int(jnp.sum(new1.queue.counts))
    for a, b in zip(jax.tree_util.tree_leaves(new1.params_s),
                    jax.tree_util.tree_leaves(new8.params_s)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-4)
