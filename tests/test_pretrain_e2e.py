"""End-to-end Stage-1 slice: synthetic scans -> voxelize -> MinkUNet fwd/bwd ->
CE -> SGD -> Hungarian mIoU eval. (SURVEY §7.5: first runnable milestone.)"""

import numpy as np
import jax
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
from gcdlss_tpu.train.common import default_caps, voxel_batch_to_device, point_batch_to_device
from gcdlss_tpu.train.pretrain import (
    PretrainConfig,
    ExpPretrain,
    pretrain_train_step,
    pretrain_eval_step,
)

CAPS = (2048, 1536, 1024, 512, 512)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    write_synthetic_kitti(str(root), sequences=("00",), scans_per_seq=2,
                          num_points=1200, seed=1)
    meta = dataset_meta("SemanticKITTI")
    unknown, _ = split_table("SemanticKITTI", 1)
    mapping, inv, unk = build_label_mapping(unknown, meta["learning_map_inv"].keys())
    cfg = PretrainConfig(
        num_labeled_classes=17,
        num_classes=19,
        unknown_label=unk,
        voxel_caps=CAPS,
        arch="MinkUNet14",
        steps_per_epoch=1,
        epochs=3,
        warmup_epochs=1,
    )
    train_ds = SemanticKITTIDataset(
        str(root), "train", voxel_size=0.15, downsampling=1000, augment=True,
        label_mapping=mapping, unknown_labels=unknown, seed=0,
    )
    val_ds = SemanticKITTIDataset(
        str(root), "valid", voxel_size=0.15, label_mapping=mapping,
        unknown_labels=unknown,
    )
    return cfg, mapping, inv, train_ds, val_ds


def test_pretrain_step_and_eval(setup):
    cfg, mapping, inv, train_ds, val_ds = setup
    module = ExpPretrain(cfg, mapping, inv)

    batch = collate_batch([train_ds[0], train_ds[1]], CAPS[0], point_cap=1536)
    vb = voxel_batch_to_device(batch["voxel"])

    state0 = module.state
    state1, m1 = pretrain_train_step(state0, vb, cfg)
    loss1 = float(m1["loss"])
    assert np.isfinite(loss1) and loss1 > 0
    state2, m2 = pretrain_train_step(state1, vb, cfg)
    assert np.isfinite(float(m2["loss"]))
    module.state = state2

    # eval on the valid split
    vbatch = collate_batch([val_ds[0], val_ds[1]], CAPS[0], point_cap=2048)
    conf, loss = pretrain_eval_step(
        module.state,
        voxel_batch_to_device(vbatch["voxel"]),
        point_batch_to_device(vbatch["points"]),
        module.inv_lut,
        cfg,
    )
    conf = np.asarray(conf)
    assert conf.shape == (19, 19)
    assert conf.sum() > 0
    # every counted point carries a real label of a known class' raw id space
    assert np.isfinite(float(loss))


def test_pretrain_loss_decreases(setup):
    cfg, mapping, inv, train_ds, _ = setup
    module = ExpPretrain(cfg, mapping, inv)
    batch = collate_batch([train_ds[0], train_ds[1]], CAPS[0])
    vb = voxel_batch_to_device(batch["voxel"])
    losses = []
    for _ in range(8):
        module.state, m = pretrain_train_step(module.state, vb, cfg)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
