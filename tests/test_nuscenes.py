import os
import pickle

import numpy as np
import pytest

from gcdlss_tpu.data.nuscenes import (
    NuScenesDataset,
    decode_panoptic,
    write_synthetic_nuscenes,
)
from gcdlss_tpu.data import build_label_mapping, split_table, dataset_meta


@pytest.mark.smoke
def test_panoptic_decode_golden(tmp_path):
    """Hand-packed panoptic labels decode to the exact (sem, inst) pairs of
    the reference's `label//1000`/`label%1000`
    (`utils/dataset_remission_mean_teacher.py:2101-2103`), and a dataset
    over the hand-built file yields exactly the learning-mapped labels."""
    # (sem, inst) pairs incl. edge cases: inst=0, inst=999 (max), sem=0
    # (noise -> ignore), sem=31 (ignore), sem=30 (max mapped id)
    pairs = [(9, 5), (14, 999), (2, 0), (0, 7), (31, 3), (30, 1)]
    raw = np.array([s * 1000 + i for s, i in pairs], np.uint16)
    sem, inst = decode_panoptic(raw)
    assert sem.tolist() == [p[0] for p in pairs]
    assert inst.tolist() == [p[1] for p in pairs]

    # e2e through the dataset: standard 32->16 learning map
    # (9->0 car? no: 9=barrier->0 ... values pinned from config meta:
    #  9->0, 14->1, 2->6, 30->15; 0 and 31 -> ignore, dropped)
    root = str(tmp_path / "nusc")
    os.makedirs(os.path.join(root, "samples"), exist_ok=True)
    os.makedirs(os.path.join(root, "panoptic"), exist_ok=True)
    n = len(pairs)
    pts = np.zeros((n, 5), np.float32)
    pts[:, 0] = np.arange(n) * 5.0  # distinct voxels, identity order
    pts[:, 3] = np.arange(n) / 10.0  # intensity
    pts.tofile(os.path.join(root, "samples", "scan.bin"))
    np.savez(os.path.join(root, "panoptic", "scan.npz"), data=raw)
    infos = [{"lidar_path": "samples/scan.bin",
              "panoptic_path": "panoptic/scan.npz", "token": "t0"}]
    with open(os.path.join(root, "nuscenes_infos_train.pkl"), "wb") as f:
        pickle.dump({"infos": infos}, f)

    ds = NuScenesDataset(root, "train", voxel_size=0.1, augment=False,
                         downsampling=-1)
    s = ds[0]
    assert s.labels.tolist() == [0, 1, 6, 15]  # ignore rows dropped
    assert s.points.shape == (4, 3)
    np.testing.assert_allclose(s.features[:, 0], [0.0, 0.1, 0.2, 0.5])


def test_nuscenes_pipeline(tmp_path):
    root = str(tmp_path / "nusc")
    write_synthetic_nuscenes(root, num_scans=4, num_points=1500, seed=0)
    meta = dataset_meta("nuScenes")
    unknown, ratio = split_table("nuScenes", 1)
    assert unknown == [1, 8] and ratio == 0.45
    mapping, inv, unk = build_label_mapping(unknown, meta["learning_map_inv"].keys())
    assert unk == 14  # 16 - 2 unknown

    ds = NuScenesDataset(
        root, "train", split_indices=np.array([0, 1]), labeled=True,
        voxel_size=0.2, downsampling=1200, augment=True,
        label_mapping=mapping, unknown_labels=unknown, resize_aug=True, seed=0,
    )
    assert len(ds) == 2
    s = ds[0]
    assert s.points.shape[1] == 3
    assert s.voxel_coords.shape[0] <= s.points.shape[0]
    assert s.mapped_labels.min() >= 0
    assert s.mapped_labels.max() <= unk
    # unlabeled complement
    un = NuScenesDataset(
        root, "train", split_indices=np.array([0, 1]), labeled=False,
        voxel_size=0.2, label_mapping=mapping, unknown_labels=unknown,
    )
    assert len(un) == 2
