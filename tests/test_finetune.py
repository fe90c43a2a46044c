"""Stage-1.5 fine-tuning step (NCC head calibration) e2e."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.e2e

from gcdlss_tpu.data import (
    write_synthetic_kitti, SemanticKITTIDataset, collate_batch,
    build_label_mapping, split_table, dataset_meta,
)
from gcdlss_tpu.train.common import voxel_batch_to_device
from gcdlss_tpu.train.finetune import (
    FineTuneConfig, create_finetune_state, finetune_train_step,
)

CAPS = (2048, 1024, 512, 512, 256)


def test_finetune_step(tmp_path):
    root = str(tmp_path / "kitti")
    write_synthetic_kitti(root, sequences=("00",), scans_per_seq=2,
                          num_points=900, seed=11)
    meta = dataset_meta("SemanticKITTI")
    unknown, _ = split_table("SemanticKITTI", 1)
    mapping, inv, unk = build_label_mapping(unknown, meta["learning_map_inv"].keys())
    cfg = FineTuneConfig(
        num_labeled_classes=17, num_classes=19, unknown_label=unk,
        voxel_caps=CAPS, arch="MinkUNet14", planes=(8,) * 8,
        steps_per_epoch=1, epochs=2, warmup_epochs=1,
    )
    ds = SemanticKITTIDataset(
        root, "train", voxel_size=0.15, downsampling=800, augment=True,
        label_mapping=mapping, unknown_labels=unknown, resize_aug=True, seed=0,
    )
    state = create_finetune_state(jax.random.PRNGKey(0), cfg)
    batch = collate_batch([ds[0], ds[1]], CAPS[0])
    vb = voxel_batch_to_device(batch["voxel"])
    state, m = finetune_train_step(state, vb, cfg)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["seg"])) and np.isfinite(float(m["calib"]))
    state, m2 = finetune_train_step(state, vb, cfg)
    assert int(state.step) == 2


def _mk_voxel(rng, cap, nsc=2, voxel_size=0.1):
    import jax.numpy as jnp

    pts = rng.uniform(-15, 15, size=(cap, 3))
    coords = np.concatenate(
        [rng.integers(0, nsc, size=(cap, 1)).astype(np.int32),
         np.floor(pts / voxel_size).astype(np.int32)], axis=1)
    coords = coords[np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))]
    return {
        "coords": jnp.asarray(coords),
        "feats": jnp.asarray(rng.uniform(0, 1, (cap, 1)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 17, cap).astype(np.int32)),
        "mapped_labels": jnp.asarray(rng.integers(0, 17, cap).astype(np.int32)),
        "valid": jnp.ones((cap,), bool),
    }


def test_mix_finetune_variants():
    """ExpMixFineTuning (pairs) and ExpBetaScheduling (centroid) steps run
    and return finite losses."""
    rng = np.random.default_rng(3)
    batch = _mk_voxel(rng, CAPS[0])
    for kw in (dict(mix_mode="pairs"),
               dict(mix_mode="centroid", mix_schedule="linear"),
               dict(mix_mode="pairs", entropy_minimize=True)):
        cfg = FineTuneConfig(
            num_labeled_classes=17, num_classes=19, unknown_label=17,
            voxel_caps=CAPS, arch="MinkUNet14", planes=(8,) * 8,
            steps_per_epoch=2, epochs=2, warmup_epochs=1, **kw,
        )
        state = create_finetune_state(jax.random.PRNGKey(0), cfg)
        state, m = finetune_train_step(state, batch, cfg)
        assert np.isfinite(float(m["loss"])), kw


def test_extra_scheduling_steps():
    """Extra family: combined sup+unsup step with each threshold schedule."""
    from gcdlss_tpu.train.finetune import finetune_extra_train_step, _threshold
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    half = CAPS[0] // 2
    sup = _mk_voxel(rng, half)
    unsup = _mk_voxel(rng, CAPS[0] - half)
    for sched in ("const", "step", "poly", "linear"):
        cfg = FineTuneConfig(
            num_labeled_classes=17, num_classes=19, unknown_label=17,
            voxel_caps=CAPS, arch="MinkUNet14", planes=(8,) * 8,
            sup_voxel_cap=half, num_sup_scans=2, mix_mode="pairs",
            entropy_minimize=True, thr_schedule=sched,
            steps_per_epoch=2, epochs=4, warmup_epochs=1,
        )
        state = create_finetune_state(jax.random.PRNGKey(1), cfg)
        state, m = finetune_extra_train_step(state, sup, unsup, cfg)
        assert np.isfinite(float(m["loss"])), sched
        assert float(m["thr"]) >= cfg.thr_init - 1e-6
    # schedule golden values at mid-training
    cfg_lin = FineTuneConfig(
        num_labeled_classes=17, num_classes=19, unknown_label=17,
        voxel_caps=CAPS, thr_schedule="linear", thr_init=0.1, thr_end=0.5,
        steps_per_epoch=10, epochs=10,
    )
    t = _threshold(cfg_lin, jnp.asarray(50))
    np.testing.assert_allclose(float(t), 0.1 + 0.4 * 0.5, rtol=1e-5)
    cfg_poly = cfg_lin.__class__(**{**cfg_lin.__dict__, "thr_schedule": "poly"})
    np.testing.assert_allclose(
        float(_threshold(cfg_poly, jnp.asarray(50))), 0.1 + 0.4 * 0.25, rtol=1e-5
    )


def test_uncertainty_ranking(tmp_path):
    """ExpUncertaintyCheck: scores every scan, writes a descending ordering."""
    from gcdlss_tpu.data import write_synthetic_kitti, SemanticKITTIDataset
    from gcdlss_tpu.train.uncertainty import rank_uncertain_scans

    root = str(tmp_path / "kitti")
    write_synthetic_kitti(root, scans_per_seq=3, num_points=600)
    ds = SemanticKITTIDataset(root, "train", voxel_size=0.2, downsampling=600)
    cfg = FineTuneConfig(
        num_labeled_classes=17, num_classes=19, unknown_label=17,
        voxel_caps=(1024, 512, 512, 256, 256), arch="MinkUNet14",
        planes=(8,) * 8,
    )
    state = create_finetune_state(jax.random.PRNGKey(2), cfg)
    out_file = str(tmp_path / "uncertain_idx.npy")
    order, scores = rank_uncertain_scans(
        state.params, state.batch_stats, ds, cfg, 1024, out_file
    )
    assert len(order) == len(ds)
    assert np.all(np.diff(scores[order]) <= 1e-7)  # descending
    loaded = np.load(out_file)
    np.testing.assert_array_equal(loaded, order)


def _mk_blobs_voxel(rng, cap, n_blobs=24, nsc=2):
    """Blobby unlabeled scans so DBSCAN(eps=3) finds >= K+1 clusters."""
    import jax.numpy as jnp

    centers = rng.uniform(-40, 40, size=(n_blobs, 3))
    idx = rng.integers(0, n_blobs, cap)
    pts = centers[idx] + rng.normal(0, 0.4, size=(cap, 3))
    coords = np.concatenate(
        [rng.integers(0, nsc, size=(cap, 1)).astype(np.int32),
         np.floor(pts).astype(np.int32)], axis=1)
    coords = coords[np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))]
    return {
        "coords": jnp.asarray(coords),
        "feats": jnp.asarray(rng.uniform(0, 1, (cap, 1)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 18, cap).astype(np.int32)),
        "mapped_labels": jnp.asarray(
            np.where(rng.random(cap) < 0.3, 17,
                     rng.integers(0, 17, cap)).astype(np.int32)),
        "valid": jnp.ones((cap,), bool),
    }


def test_rc_extra_and_cluster_modes():
    """ExpRCExtra (stored-GT novel rows) and ExpClusterFineTuning (host
    DBSCAN+kmeans+Hungarian callback) steps run and return finite losses."""
    from gcdlss_tpu.train.finetune import finetune_extra_train_step

    rng = np.random.default_rng(7)
    half = CAPS[0] // 2
    sup = _mk_voxel(rng, half)
    unsup = _mk_blobs_voxel(rng, CAPS[0] - half)
    for kw in (dict(extra_mode="rc_oracle", unsup_coeff=0.2,
                    calib_coeff=0.01, thr_init=0.21),
               dict(extra_mode="cluster", unsup_coeff=0.1)):
        cfg = FineTuneConfig(
            num_labeled_classes=17, num_classes=19, unknown_label=17,
            voxel_caps=CAPS, arch="MinkUNet14", planes=(8,) * 8,
            sup_voxel_cap=half, num_sup_scans=2,
            steps_per_epoch=2, epochs=2, warmup_epochs=1, **kw,
        )
        state = create_finetune_state(jax.random.PRNGKey(5), cfg)
        state, m = finetune_extra_train_step(state, sup, unsup, cfg)
        assert np.isfinite(float(m["loss"])), kw


def test_cluster_mask_host_finds_unknown():
    """The host miner marks exactly the clusters Hungarian maps to the
    unknown column; with K=2 separable blobs it returns a non-trivial mask."""
    from gcdlss_tpu.train.finetune import _cluster_unknown_mask_host

    rng = np.random.default_rng(9)
    K = 2
    n = 360
    blob = rng.integers(0, K + 1, n)
    coords = np.concatenate(
        [np.zeros((n, 1), np.int32),
         (blob[:, None] * 40 + rng.normal(0, 0.5, (n, 3))).astype(np.int32)],
        axis=1)
    feats = blob[:, None].astype(np.float32)
    probs = np.zeros((n, K), np.float32)
    probs[blob < K, :] = np.eye(K, dtype=np.float32)[blob[blob < K]]
    probs[blob == K] = 1.0 / K  # uncertain rows -> unknown cluster
    mask = _cluster_unknown_mask_host(
        coords, np.ones(n, bool), feats, probs)
    assert mask.shape == (n,)
    assert mask.any() and not mask.all()


def test_cosine_head_finetune():
    """ExpMixCosineFineTuning: cosine prototype heads + mixed-logit path."""
    rng = np.random.default_rng(11)
    batch = _mk_voxel(rng, CAPS[0])
    cfg = FineTuneConfig(
        num_labeled_classes=17, num_classes=19, unknown_label=17,
        voxel_caps=CAPS, arch="MinkUNet14", planes=(8,) * 8,
        head="cosine", mix_mode="pairs",
        steps_per_epoch=2, epochs=2, warmup_epochs=1,
    )
    state = create_finetune_state(jax.random.PRNGKey(6), cfg)
    assert "weight" in state.params["final"] and "weight" in state.params["final2"]
    state, m = finetune_train_step(state, batch, cfg)
    assert np.isfinite(float(m["loss"]))


def test_threshold_sweep_protocol(tmp_path):
    """ExpRCTest / ExpMixExtraTest: per-threshold strict-Hungarian results."""
    from gcdlss_tpu.data import write_synthetic_kitti, SemanticKITTIDataset
    from gcdlss_tpu.eval.sweep import threshold_sweep_test

    root = str(tmp_path / "kitti")
    write_synthetic_kitti(root, sequences=("08",), scans_per_seq=2,
                          num_points=500, seed=13)
    meta = dataset_meta("SemanticKITTI")
    unknown, _ = split_table("SemanticKITTI", 1)
    mapping, inv, unk = build_label_mapping(unknown, meta["learning_map_inv"].keys())
    cfg = FineTuneConfig(
        num_labeled_classes=17, num_classes=19, unknown_label=unk,
        voxel_caps=CAPS, arch="MinkUNet14", planes=(8,) * 8,
        num_sup_scans=1,
    )
    ds = SemanticKITTIDataset(
        root, "valid", voxel_size=0.2, label_mapping=mapping,
        unknown_labels=unknown,
    )
    state = create_finetune_state(jax.random.PRNGKey(7), cfg)
    known_real = [k for k, v in mapping.items() if v != unk]
    unknown_real = [k for k, v in mapping.items() if v == unk]
    for subdivide in (False, True):
        res = threshold_sweep_test(
            state.params, state.batch_stats, ds, cfg, inv,
            known_real, unknown_real, thresholds=(0.3, 0.6),
            subdivide=subdivide, num_workers=0, point_cap=500,
        )
        assert set(res) == {0.3, 0.6}
        for r in res.values():
            assert np.isfinite(r["mIoU"]) and 0 <= r["mIoU"] <= 1
