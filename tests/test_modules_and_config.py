"""Experiment-module orchestration + config system tests."""

import numpy as np
import pytest

from gcdlss_tpu.config import ExperimentConfig, load_config
from gcdlss_tpu.data import (
    write_synthetic_kitti,
    SemanticKITTIDataset,
    build_label_mapping,
    split_table,
    dataset_meta,
)
from gcdlss_tpu.train.discover import DiscoverConfig, make_discover_config
from gcdlss_tpu.train.modules import ExpMergeDiscoverLaserMixMeanTeacherNCCAdaptive

TINY = dict(
    arch="MinkUNet14",
    planes=(8, 8, 8, 8, 8, 8, 8, 8),
    feat_dim=8,
)


def test_config_label_space_and_yaml(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("dataset: SemanticKITTI\nvoxel_size: 0.1\nepochs: 7\n")
    cfg = load_config(str(p), split=2)
    assert cfg.voxel_size == 0.1 and cfg.epochs == 7 and cfg.split == 2
    space = cfg.label_space()
    assert space["unknown_labels"] == [2, 4, 5]
    assert space["num_labeled_classes"] == 16
    assert space["unknown_label"] == 16
    caps = cfg.resolved_caps()
    assert len(caps) == 5 and caps[0] >= caps[1] >= caps[2]


def test_discover_module_fit(tmp_path):
    root = tmp_path / "kitti"
    write_synthetic_kitti(str(root), sequences=("00",), scans_per_seq=4,
                          num_points=700, seed=5)
    meta = dataset_meta("SemanticKITTI")
    unknown, _ = split_table("SemanticKITTI", 1)
    mapping, inv, unk = build_label_mapping(unknown, meta["learning_map_inv"].keys())
    cap = 1536
    cfg = DiscoverConfig(
        num_labeled_classes=17, num_unlabeled_classes=2, num_classes=19,
        unknown_label=unk, voxel_caps=(cap,) * 5, sup_voxel_cap=cap // 2,
        mix_voxel_caps=(cap,) * 5, num_sup_scans=2, point_cap=700,
        voxel_size=0.2, cand_cap=128, queue_slots=2, queue_per_slot=32,
        kmeans_iters=3, steps_per_epoch=1, epochs=1, warmup_epochs=1,
        **TINY, **make_discover_config("SemanticKITTI"),
    )
    common = dict(voxel_size=0.2, downsampling=600, augment=True,
                  label_mapping=mapping, unknown_labels=unknown)
    lab = SemanticKITTIDataset(str(root), "train", split_indices=np.array([0, 1]),
                               labeled=True, resize_aug=True, seed=0, **common)
    unlab = SemanticKITTIDataset(str(root), "train", split_indices=np.array([0, 1]),
                                 labeled=False, seed=1, **common)
    val = SemanticKITTIDataset(str(root), "valid", voxel_size=0.2,
                               label_mapping=mapping, unknown_labels=unknown)
    module = ExpMergeDiscoverLaserMixMeanTeacherNCCAdaptive(cfg, mapping, inv)
    history = module.fit(lab, unlab, val, epochs=1, num_workers=1)
    assert len(history) == 1
    rec = history[0]
    assert np.isfinite(rec["train/loss"])
    assert "valid/mIoU" in rec
    assert 0.0 <= rec["valid/mIoU"] <= 1.0


def test_merge_registry_cli_resolution():
    """Every discover-stage registry name resolves through main.py's Merge
    branch to a DiscoverConfig whose fields match the registry recipe
    (reference dispatches each variant by class name,
    `/root/reference/main.py:172-293`)."""
    import main as cli
    from gcdlss_tpu.train.registry import MODULE_REGISTRY

    for name, (stage, overrides) in MODULE_REGISTRY.items():
        if stage != "discover":
            continue
        for dataset in ("SemanticKITTI", "nuScenes"):
            kw = cli.resolve_discover_overrides(name, dataset)
            cfg = DiscoverConfig(
                num_labeled_classes=17, num_unlabeled_classes=2,
                num_classes=19, unknown_label=17,
                voxel_caps=(64,) * 5, sup_voxel_cap=32,
                mix_voxel_caps=(64,) * 5, num_sup_scans=1, point_cap=64,
                **kw,
            )
            for field, want in overrides.items():
                assert getattr(cfg, field) == want, (name, field)
            # dataset defaults survive unless overridden
            if "calib_coeff" not in overrides:
                assert cfg.calib_coeff == (
                    0.1 if dataset == "nuScenes" else 0.05)

    with pytest.raises(NameError):
        cli.resolve_discover_overrides("ExpPretrain", "SemanticKITTI")


def test_shipped_dataset_yamls():
    """Every shipped dataset YAML loads into a resolvable label space
    (reference ships 4 dataset configs: `config/semkitti_minkunet.yaml`,
    `nuscenes_minkunet.yaml`, `semkitti_cylinder3d.yaml:1`,
    `semposs_dataset.yaml:1`)."""
    import glob
    import os

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "gcdlss_tpu",
                           "configs")
    yamls = sorted(glob.glob(os.path.join(cfg_dir, "*.yaml")))
    assert len(yamls) >= 4
    for y in yamls:
        cfg = load_config(y)
        assert cfg.label_space()["num_labeled_classes"] > 0
    cyl = load_config(os.path.join(cfg_dir, "semkitti_cylinder3d.yaml"))
    assert cyl.arch == "Cylinder3D" and cyl.dataset == "SemanticKITTI"
    poss = load_config(os.path.join(cfg_dir, "semposs_dataset.yaml"))
    assert poss.dataset == "SemanticPOSS" and poss.split == 0
    sp = poss.label_space()
    # 13 POSS train classes, fully supervised (no discovery splits exist
    # for POSS in the reference)
    assert sp["num_labeled_classes"] == 13
    assert sp["num_unlabeled_classes"] == 0


def test_pretrain_resume_continues_from_saved_epoch(tmp_path, capsys):
    """A killed-and-resumed pretrain continues from the saved epoch instead
    of restarting at 0 (reference resumes any branch via the PL Trainer,
    `/root/reference/main.py:173-183`)."""
    import main as cli

    root = tmp_path / "kitti"
    write_synthetic_kitti(str(root), sequences=("00",), scans_per_seq=4,
                          num_points=700, seed=7)
    base = [
        "--dataset", "SemanticKITTI", "--module", "ExpPretrain",
        "--dataset_path", str(root), "--arch", "MinkUNet14",
        "--voxel_size", "0.2", "--downsampling", "600",
        "--batch_size", "2", "--num_workers", "1", "--voxel_cap", "2048",
        "--experiment", "resume-test",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
        "--split_dir", str(tmp_path / "split_npy"),
    ]
    # first run: 1 epoch, saves epoch 0 then is "killed" (run ends)
    cli.main(cli.parser.parse_args(base + ["--epochs", "1"]))
    first = capsys.readouterr().out
    assert "epoch 0:" in first
    # resumed run asks for 2 total epochs -> only epoch 1 should execute
    cli.main(cli.parser.parse_args(
        base + ["--epochs", "2", "--resume_checkpoint", "latest"]))
    second = capsys.readouterr().out
    assert "resumed from saved epoch 0" in second
    assert "epoch 0:" not in second
    assert "epoch 1:" in second


@pytest.mark.smoke
def test_new_ablation_registry_names():
    """Round-3 inventory tail: the remaining reference ablation classes
    resolve to the right recipes (`exp.py:493,975,1123,1758,3000,3150`)."""
    from gcdlss_tpu.train.registry import resolve_module

    assert resolve_module("ExpCosinePretrain") == (
        "pretrain", dict(head="cosine"))
    recipe, kw = resolve_module("ExpMixCosineFineTuning")
    assert recipe == "finetune" and kw["head"] == "cosine"
    recipe, kw = resolve_module("ExpRCExtra")
    assert recipe == "finetune_extra" and kw["extra_mode"] == "rc_oracle"
    assert kw["calib_coeff"] == 0.01 and kw["unsup_coeff"] == 0.2
    recipe, kw = resolve_module("ExpClusterFineTuning")
    assert recipe == "finetune_extra" and kw["extra_mode"] == "cluster"
    recipe, kw = resolve_module("ExpRCTest")
    assert recipe == "finetune_test" and not kw.get("subdivide_novel")
    recipe, kw = resolve_module("ExpMixExtraTest")
    assert recipe == "finetune_test" and kw["subdivide_novel"]
