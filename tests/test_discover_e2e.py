"""End-to-end Stage-2 discovery step: teacher/student + LaserMix + NCC mining
+ kmeans + Hungarian + queue + EMA, all inside one jitted step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.e2e

from gcdlss_tpu.data import (
    write_synthetic_kitti,
    SemanticKITTIDataset,
    collate_batch,
    build_label_mapping,
    split_table,
    dataset_meta,
)
from gcdlss_tpu.train.common import voxel_batch_to_device, point_batch_to_device, inv_label_lut
from gcdlss_tpu.train.discover import (
    DiscoverConfig,
    create_discover_state,
    discover_train_step,
    discover_eval_step,
)

SUP_CAP = 1024
CAPS = (2048, 1536, 1024, 512, 512)
MIX_CAPS = (2048, 1536, 1024, 512, 512)
POINT_CAP = 700


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti2")
    write_synthetic_kitti(str(root), sequences=("00",), scans_per_seq=4,
                          num_points=900, seed=2)
    meta = dataset_meta("SemanticKITTI")
    unknown, _ = split_table("SemanticKITTI", 1)
    mapping, inv, unk = build_label_mapping(unknown, meta["learning_map_inv"].keys())
    cfg = DiscoverConfig(
        num_labeled_classes=17,
        num_unlabeled_classes=2,
        num_classes=19,
        unknown_label=unk,
        voxel_caps=CAPS,
        sup_voxel_cap=SUP_CAP,
        mix_voxel_caps=MIX_CAPS,
        num_sup_scans=2,
        point_cap=POINT_CAP,
        voxel_size=0.15,
        arch="MinkUNet14",
        cand_cap=256,
        queue_slots=4,
        queue_per_slot=64,
        kmeans_iters=5,
        steps_per_epoch=1,
        epochs=3,
        warmup_epochs=1,
    )
    lab_ds = SemanticKITTIDataset(
        str(root), "train", split_indices=np.array([0, 1]), labeled=True,
        voxel_size=0.15, downsampling=800, augment=True, label_mapping=mapping,
        unknown_labels=unknown, resize_aug=True, seed=0,
    )
    unlab_ds = SemanticKITTIDataset(
        str(root), "train", split_indices=np.array([0, 1]), labeled=False,
        voxel_size=0.15, downsampling=800, augment=True, label_mapping=mapping,
        unknown_labels=unknown, seed=1,
    )
    val_ds = SemanticKITTIDataset(
        str(root), "valid", voxel_size=0.15, label_mapping=mapping,
        unknown_labels=unknown,
    )
    return cfg, mapping, inv, unknown, lab_ds, unlab_ds, val_ds


def _device_batches(lab_ds, unlab_ds):
    sup = collate_batch([lab_ds[0], lab_ds[1]], SUP_CAP, point_cap=POINT_CAP)
    unsup = collate_batch([unlab_ds[0], unlab_ds[1]], CAPS[0] - SUP_CAP, point_cap=POINT_CAP)
    return (
        voxel_batch_to_device(sup["voxel"]),
        point_batch_to_device(sup["points"]),
        voxel_batch_to_device(unsup["voxel"]),
        point_batch_to_device(unsup["points"]),
    )


def test_discover_train_step(setup):
    cfg, mapping, inv, unknown, lab_ds, unlab_ds, val_ds = setup
    state = create_discover_state(jax.random.PRNGKey(0), cfg)
    sup_vb, sup_pb, unsup_vb, unsup_pb = _device_batches(lab_ds, unlab_ds)

    # snapshot before the step: the input state is donated
    t0 = np.asarray(jax.tree_util.tree_leaves(state.params_t)[0])

    # force some candidates: with a fresh model tau=0 some NCC logits exceed it
    state1, m = discover_train_step(state, sup_vb, sup_pb, unsup_vb, unsup_pb, cfg)
    for k in ("loss", "sup_seg", "mse", "lasermix", "calib", "thr_loss"):
        assert np.isfinite(float(m[k])), k
    # EMA: t1 == 0.99 * t0 + 0.01 * s1 exactly (`:246-248,2223-2224`)
    t1 = np.asarray(jax.tree_util.tree_leaves(state1.params_t)[0])
    s1 = np.asarray(jax.tree_util.tree_leaves(state1.params_s)[0])
    np.testing.assert_allclose(t1, 0.99 * t0 + 0.01 * s1, rtol=1e-5, atol=1e-6)
    # second step runs from donated state
    state2, m2 = discover_train_step(state1, sup_vb, sup_pb, unsup_vb, unsup_pb, cfg)
    assert np.isfinite(float(m2["loss"]))
    assert int(state2.step) == 2


def test_discover_cylinder3d_backbone(setup):
    """BASELINE config #4: the full Stage-2 discovery step runs and learns
    on the Cylinder3D backbone (`discover.make_model` arch switch; the
    reference's own wrapper is dead code,
    `/root/reference/models/cylinder3d.py:84-85`)."""
    import dataclasses
    cfg, mapping, inv, unknown, lab_ds, unlab_ds, val_ds = setup
    ccfg = dataclasses.replace(cfg, arch="Cylinder3D", feat_dim=128)
    sup_vb, sup_pb, unsup_vb, unsup_pb = _device_batches(lab_ds, unlab_ds)
    state = create_discover_state(jax.random.PRNGKey(3), ccfg)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params_s)[0]).copy()
    state, m = discover_train_step(state, sup_vb, sup_pb, unsup_vb, unsup_pb, ccfg)
    for k in ("loss", "sup_seg", "mse", "lasermix", "calib", "thr_loss"):
        assert np.isfinite(float(m[k])), k
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params_s)[0])
    assert not np.allclose(p0, p1)  # the student actually trained
    state, m2 = discover_train_step(state, sup_vb, sup_pb, unsup_vb, unsup_pb, ccfg)
    assert np.isfinite(float(m2["loss"]))
    assert int(state.step) == 2


def test_discover_eval_protocol(setup):
    cfg, mapping, inv, unknown, lab_ds, unlab_ds, val_ds = setup
    state = create_discover_state(jax.random.PRNGKey(1), cfg)
    unknown_real = [k for k, v in mapping.items() if v == cfg.unknown_label]
    extra = {cfg.unknown_label + i: unknown_real[i] for i in range(len(unknown_real))}
    lut = jnp.asarray(
        inv_label_lut(inv, cfg.num_labeled_classes + cfg.num_unlabeled_classes, extra)
    )
    batch = collate_batch([val_ds[0], val_ds[1]], CAPS[0], point_cap=1024)
    conf = discover_eval_step(
        state,
        voxel_batch_to_device(batch["voxel"]),
        point_batch_to_device(batch["points"]),
        lut,
        cfg,
    )
    conf = np.asarray(conf)
    assert conf.shape == (19, 19)
    assert conf.sum() > 0

    from gcdlss_tpu.eval.metrics import discovery_iou

    known_real = [k for k, v in mapping.items() if v != cfg.unknown_label]
    iou, miou, miou_old, miou_new = discovery_iou(conf, known_real, unknown_real, 19)
    assert iou.shape == (19,)
    assert 0.0 <= miou <= 1.0


def test_discover_variant_configs(setup):
    """The threshold/assigner/LiON variant family compiles and runs."""
    import dataclasses
    cfg, mapping, inv, unknown, lab_ds, unlab_ds, val_ds = setup
    sup_vb, sup_pb, unsup_vb, unsup_pb = _device_batches(lab_ds, unlab_ds)
    for overrides in (
        dict(threshold_mode="fixed_prob"),
        dict(assigner="sinkhorn"),
        dict(use_lion=True),
        # PolarMix-MT (feature mixing, no LaserMix) + the bare variant
        dict(mix_mode="feature", threshold_mode="fixed_prob"),
        dict(mix_mode="none"),
    ):
        vcfg = dataclasses.replace(cfg, **overrides)
        state = create_discover_state(jax.random.PRNGKey(2), vcfg)
        state, m = discover_train_step(state, sup_vb, sup_pb, unsup_vb, unsup_pb, vcfg)
        assert np.isfinite(float(m["loss"])), overrides


@pytest.mark.slow
def test_discovery_quality_minimal(tmp_path):
    """The Stage-1 -> Stage-2 protocol discovers planted novel classes on
    the learnable fixture: mIoU_new rises well above its chance-level start
    (observed curves at this reduced scale: 0.001 -> 0.024..0.041 over 8
    epochs across 3 seeds, strictly rising; the 0.02 floor sits just under
    the weakest observed seed (0.024) and ~25x the epoch-0 value, so a
    regression that halves discovery quality trips it while seed spread
    does not). Reduced version of the committed run in
    docs/discovery_quality_r3.json (mIoU_new 0.0 -> 0.28 over 15 epochs at
    full fixture scale). Stays in the slow tier: the run is a 14-epoch
    two-stage subprocess (~20 min on this rig), far over the smoke budget;
    the smoke tier covers the discovery step itself via the step tests."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wd = str(tmp_path / "dq")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "discovery_quality.py"),
         "--workdir", wd, "--scans-per-seq", "10", "--points", "3000",
         "--voxel-cap", "3072", "--stage1-epochs", "6", "--stage2-epochs",
         "8"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=2400,
    )
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    r = json.load(open(os.path.join(wd, "result.json")))
    curve = r["stage2_miou_new"]
    assert curve, "no mIoU_new curve logged"
    assert max(curve) > 0.02, curve
    assert np.mean(curve[-3:]) > np.mean(curve[:3]) + 0.01, curve


def test_mixed_plan_voxel_matches_point_oracle():
    """The voxel-level mixed-plan builder (`_mixed_plan_voxel`) is exactly
    the point path (`_mixed_plan_point`, the reference-faithful in-step
    re-quantize) whenever no voxel straddles a pitch-band boundary: same
    level-0 coords/valid, same neighbor maps, same features and labels.
    Geometry is crafted with a pitch margin around every band edge of every
    num_areas in {3..6} so the no-straddle precondition holds exactly."""
    import dataclasses

    from gcdlss_tpu.ops.plan import build_unet_plan
    from gcdlss_tpu.train.discover import _mixed_plan_point, _mixed_plan_voxel

    rng = np.random.default_rng(7)
    vsize = 0.05
    down, up = -25.0 / 180 * np.pi, 3.0 / 180 * np.pi
    edges = np.unique(np.concatenate([
        down + np.arange(na + 1) * (up - down) / na for na in (3, 4, 5, 6)
    ]))

    def make_scan(n, seed_off):
        r = np.random.default_rng(7 + seed_off)
        pts = []
        while len(pts) < n:
            pitch = r.uniform(down + 0.01, up - 0.01, size=4 * n)
            # >= 0.6 deg from every band edge: a 0.05 m voxel at <= 40 m
            # subtends < 0.1 deg, so point and voxel-center parity agree
            ok = np.abs(pitch[:, None] - edges[None, :]).min(1) > 0.6 / 180 * np.pi
            pitch = pitch[ok][: n - len(pts)]
            rad = r.uniform(5.0, 40.0, size=pitch.shape[0])
            yaw = r.uniform(-np.pi, np.pi, size=pitch.shape[0])
            rho = rad * np.cos(pitch)
            pts.append(np.stack(
                [rho * np.cos(yaw), rho * np.sin(yaw), rad * np.sin(pitch)], 1))
        return np.concatenate(pts)[:n].astype(np.float32)

    from gcdlss_tpu.data.quantize_np import sparse_quantize_np

    P, CAPX = 600, 1536
    caps = (CAPX, 1024, 512, 256, 256)
    scans = []
    for s in range(2):  # one sup + one unsup scan
        pts = make_scan(P, s)
        vox, sel, inv = sparse_quantize_np(pts, vsize)
        m = vox.shape[0]
        xyz = np.zeros((P, 3), np.float32)
        xyz[:m] = pts[sel]  # one point per voxel: rep == that point
        valid = np.zeros(P, bool)
        valid[:m] = True
        feats = np.zeros((P, 1), np.float32)
        feats[:m, 0] = rng.normal(size=m)
        labels = np.full(P, -1, np.int32)
        labels[:m] = rng.integers(0, 17, size=m)
        scans.append(dict(coords=vox, m=m, xyz=xyz, valid=valid,
                          feats=feats, labels=labels))

    sup, uns = scans
    coords = np.zeros((CAPX, 4), np.int32)
    feats_in = np.zeros((CAPX, 1), np.float32)
    mapped_in = np.full(CAPX, -1, np.int32)
    valid_in = np.zeros(CAPX, bool)
    sup_cap = CAPX // 2
    coords[: sup["m"], 1:] = sup["coords"]
    coords[sup_cap : sup_cap + uns["m"], 0] = 1
    coords[sup_cap : sup_cap + uns["m"], 1:] = uns["coords"]
    feats_in[: sup["m"]] = sup["feats"][: sup["m"]]
    feats_in[sup_cap : sup_cap + uns["m"]] = uns["feats"][: uns["m"]]
    mapped_in[: sup["m"]] = sup["labels"][: sup["m"]]
    valid_in[: sup["m"]] = True
    valid_in[sup_cap : sup_cap + uns["m"]] = True

    plan = build_unet_plan(
        jnp.asarray(coords), jnp.asarray(valid_in), caps, presorted=True)
    ok = np.asarray(plan.rep) < CAPX
    safe = np.where(ok, np.asarray(plan.rep), 0)
    feats0 = jnp.asarray(np.where(ok[:, None], feats_in[safe], 0.0))
    mapped0 = jnp.asarray(np.where(ok, mapped_in[safe], -1))
    is_sup = jnp.asarray(ok & (safe < sup_cap) & (np.asarray(plan.rep) < sup_cap))

    # per-voxel pseudo labels (simulated teacher) + their point-side twin
    pseudo_vox_np = np.where(
        np.asarray(plan.levels[0].valid) & ~np.asarray(is_sup),
        np.random.default_rng(3).integers(-1, 18, size=CAPX), -1
    ).astype(np.int32)
    # map each unsup point (one per voxel) to its plan row's pseudo label
    uq = {tuple(c): i for i, c in enumerate(np.asarray(plan.levels[0].coords))
          if np.asarray(plan.levels[0].valid)[i]}
    pseudo_pts = np.full((1, P), -1, np.int32)
    for j in range(uns["m"]):
        row = uq.get((1, *uns["coords"][j]))
        if row is not None:
            pseudo_pts[0, j] = pseudo_vox_np[row]

    def pb(scan, lab):
        return {
            "xyz": jnp.asarray(scan["xyz"][None]),
            "feats": jnp.asarray(scan["feats"][None]),
            "mapped_labels": jnp.asarray(lab[None]),
            "valid": jnp.asarray(scan["valid"][None]),
        }

    cfg = DiscoverConfig(
        num_labeled_classes=17, num_unlabeled_classes=2, num_classes=19,
        unknown_label=17, voxel_caps=caps, sup_voxel_cap=sup_cap,
        mix_voxel_caps=caps, num_sup_scans=1, point_cap=P, voxel_size=vsize,
    )
    for na in (3, 4, 5, 6):
        na_j = jnp.asarray(na, jnp.int32)
        plan_p, feats_p, labels_p = _mixed_plan_point(
            cfg, pb(sup, sup["labels"]), pb(uns, uns["labels"]),
            jnp.asarray(pseudo_pts), na_j)
        plan_v, feats_v, labels_v = _mixed_plan_voxel(
            cfg, plan, feats0, mapped0, is_sup, jnp.asarray(pseudo_vox_np),
            na_j)
        assert np.array_equal(np.asarray(plan_p.levels[0].valid),
                              np.asarray(plan_v.levels[0].valid)), na
        v = np.asarray(plan_v.levels[0].valid)
        assert np.array_equal(np.asarray(plan_p.levels[0].coords)[v],
                              np.asarray(plan_v.levels[0].coords)[v]), na
        assert np.array_equal(np.asarray(plan_p.levels[0].nbr3)[v],
                              np.asarray(plan_v.levels[0].nbr3)[v]), na
        assert np.array_equal(np.asarray(plan_p.stem_nbr)[v],
                              np.asarray(plan_v.stem_nbr)[v]), na
        assert np.allclose(np.asarray(feats_p)[v], np.asarray(feats_v)[v]), na
        assert np.array_equal(np.asarray(labels_p)[v],
                              np.asarray(labels_v)[v]), na
