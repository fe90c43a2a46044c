import numpy as np

from gcdlss_tpu.data.nuscenes import NuScenesDataset, write_synthetic_nuscenes
from gcdlss_tpu.data import build_label_mapping, split_table, dataset_meta


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
