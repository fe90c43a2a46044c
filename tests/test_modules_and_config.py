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
