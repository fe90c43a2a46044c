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
