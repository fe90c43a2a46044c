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
