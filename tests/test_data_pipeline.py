import os

import numpy as np
import jax.numpy as jnp
import pytest

from gcdlss_tpu.data import (
    write_synthetic_kitti,
    SemanticKITTIDataset,
    collate_batch,
    ensure_split_file,
    load_split_indices,
    build_label_mapping,
    split_table,
    dataset_meta,
)
from gcdlss_tpu.data.quantize_np import sparse_quantize_np
from gcdlss_tpu.ops.voxelize import sparse_quantize

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_kitti")
    return write_synthetic_kitti(str(root), sequences=("00",), scans_per_seq=4,
                                 num_points=1500, seed=0)


def test_label_mapping_golden():
    meta = dataset_meta("SemanticKITTI")
    unknown, ratio = split_table("SemanticKITTI", 1)
    assert unknown == [4, 6] and ratio == 0.50
    mapping, inv, unk = build_label_mapping(unknown, meta["learning_map_inv"].keys())
    assert unk == 17  # 19 classes - 2 unknown
    assert mapping[4] == 17 and mapping[6] == 17
    # knowns compress order-preserving: 0->0,1->1,2->2,3->3,5->4,7->5,...
    assert mapping[0] == 0 and mapping[3] == 3 and mapping[5] == 4 and mapping[7] == 5
    assert inv[4] == 5  # compressed 4 -> train label 5 (person)
    assert len(inv) == 17


def test_host_device_quantize_parity(kitti_root):
    ds = SemanticKITTIDataset(kitti_root, "train", voxel_size=0.1)
    s = ds[0]
    # host result
    coords_h, unique_map, inverse_h = sparse_quantize_np(s.points, 0.1)
    # device result
    p = s.points
    out = sparse_quantize(
        jnp.asarray(p), jnp.zeros(p.shape[0], jnp.int32),
        jnp.ones(p.shape[0], bool), 0.1, p.shape[0],
    )
    m = int(out["count"])
    assert m == coords_h.shape[0]
    np.testing.assert_array_equal(np.asarray(out["coords"])[:m, 1:], coords_h)
    np.testing.assert_array_equal(np.asarray(out["rep"])[:m], unique_map)
    np.testing.assert_array_equal(np.asarray(out["inverse"]), inverse_h)


def test_dataset_and_collation(kitti_root):
    unknown, ratio = split_table("SemanticKITTI", 1)
    meta = dataset_meta("SemanticKITTI")
    mapping, inv, unk = build_label_mapping(unknown, meta["learning_map_inv"].keys())
    ds = SemanticKITTIDataset(
        kitti_root, "train", voxel_size=0.1, downsampling=1200, augment=True,
        label_mapping=mapping, unknown_labels=unknown, resize_aug=True, seed=3,
    )
    s = ds[1]
    assert s.points.shape[0] == s.labels.shape[0] == s.inverse_map.shape[0]
    assert s.voxel_coords.shape[0] == s.voxel_features.shape[0]
    assert s.voxel_coords.shape[0] <= s.points.shape[0]
    # inverse map round trip: voxel coords of each point match its own quantized coords
    assert s.inverse_map.max() < s.voxel_coords.shape[0]
    # mapped labels: known in [0,17], synthetic 100 -> 17
    assert s.mapped_labels.min() >= 0
    assert s.mapped_labels.max() <= unk

    batch = collate_batch([ds[0], ds[1]], voxel_cap=4096, point_cap=2048)
    vb, pb = batch["voxel"], batch["points"]
    assert vb.coords.shape == (4096, 4)
    n0 = int(vb.num_voxels[0])
    assert np.all(vb.coords[:n0, 0] == 0)
    assert np.all(vb.valid[: n0 + int(vb.num_voxels[1])])
    # voxel_row of scan1 points offset by scan0 voxel count
    ok = pb.valid[1]
    assert np.all(pb.voxel_row[1][ok] >= n0)
    # collated voxel order is globally sorted so plan build is a no-op permutation
    from gcdlss_tpu.ops.coords import encode_coords

    hi, lo = encode_coords(jnp.asarray(vb.coords), jnp.asarray(vb.valid))
    hi = np.asarray(hi)
    nvalid = int(vb.valid.sum())
    assert np.all(np.diff(hi[:nvalid].astype(np.int64)) >= 0)


def test_multiprocess_loader(kitti_root):
    """MultiprocessLoader yields the same batch structure as PrefetchLoader
    (forked workers, dataset copy per worker; torch-DataLoader analog)."""
    from gcdlss_tpu.data.loader import MultiprocessLoader, PrefetchLoader

    ds = SemanticKITTIDataset(
        kitti_root, "train", voxel_size=0.1, downsampling=1200, augment=False,
        seed=5,
    )
    kw = dict(point_cap=1500, shuffle=False, seed=7)
    thr = list(PrefetchLoader(ds, 2, 4096, num_workers=2, **kw))
    prc = list(MultiprocessLoader(ds, 2, 4096, num_workers=2, **kw))
    assert len(thr) == len(prc) == len(ds) // 2
    tb, pb = thr[0]["voxel"], prc[0]["voxel"]
    assert tb.coords.shape == pb.coords.shape
    assert tb.valid.dtype == pb.valid.dtype
    # augment=False -> identical content regardless of worker backend
    np.testing.assert_array_equal(tb.coords, pb.coords)
    np.testing.assert_array_equal(
        thr[0]["points"].xyz, prc[0]["points"].xyz)


def test_split_files(kitti_root, tmp_path):
    path = ensure_split_file(str(tmp_path), "SemanticKITTI", 1, num_scans=4)
    assert path.endswith("selected_idx_in__ex_4_6_50%.npy")
    idx = load_split_indices(path)
    assert len(idx) == 2
    lab = SemanticKITTIDataset(kitti_root, "train", split_indices=idx, labeled=True)
    unlab = SemanticKITTIDataset(kitti_root, "train", split_indices=idx, labeled=False)
    assert len(lab) == 2 and len(unlab) == 2
    assert set(lab.scan_files).isdisjoint(unlab.scan_files)


def test_polarmix_dataset(kitti_root):
    unknown, _ = split_table("SemanticKITTI", 1)
    meta = dataset_meta("SemanticKITTI")
    mapping, inv, unk = build_label_mapping(unknown, meta["learning_map_inv"].keys())
    ds = SemanticKITTIDataset(
        kitti_root, "train", voxel_size=0.1, downsampling=1200, augment=True,
        label_mapping=mapping, unknown_labels=unknown, polarmix=True, seed=7,
    )
    s = ds[0]
    # mixed cloud has points from two scans plus rotate-pasted instances
    assert s.points.shape[0] == s.labels.shape[0] == s.mapped_labels.shape[0]
    assert s.voxel_coords.shape[0] <= s.points.shape[0]
    assert s.mapped_labels.min() >= 0


def test_balanced_unknown_labels_golden():
    """Percentage-balanced split chooser reproduces the reference algorithm
    (utils/unkn_labels.py:3-24) on the real KITTI class frequencies."""
    from gcdlss_tpu.data.labels import balanced_unknown_labels

    meta = dataset_meta("SemanticKITTI")
    splits = [
        balanced_unknown_labels(s, meta["content"], meta["learning_map"],
                                meta["learning_map_inv"])
        for s in range(4)
    ]
    # 19 classes -> sizes [5, 5, 5, 4], disjoint, sorted by point mass
    assert [len(s) for s in splits] == [5, 5, 5, 4]
    all_ids = sorted(sum(splits, []))
    assert all_ids == list(range(19))
    # split 0 holds the most frequent classes (vegetation=14, road=8 lead)
    assert splits[0][0] == 14 and splits[0][1] == 8


def test_real_instance_resize():
    from gcdlss_tpu.data.augment import real_instance_resize

    rng = np.random.default_rng(0)
    n = 1000
    xyz = rng.normal(0, 1, (n, 3)).astype(np.float32) + 10
    labels = np.full(n, 3, np.int32)  # truck (known)
    inst = np.zeros(n, np.int32)
    inst[:400] = 1  # one big instance
    out_xyz, out_labels = real_instance_resize(
        np.random.default_rng(1), xyz, labels, inst, unknown_classes=[4, 6]
    )
    changed = (out_labels == 100).sum()
    # instance either resized+relabeled to 100 (p=0.5) or untouched
    assert changed in (0, 400)
    if changed:
        # resized about its centroid: centroid preserved, spread scaled
        m0, m1 = xyz[:400].mean(0), out_xyz[:400].mean(0)
        np.testing.assert_allclose(m0, m1, atol=1e-3)
        s0 = np.abs(xyz[:400] - m0).mean()
        s1 = np.abs(out_xyz[:400] - m1).mean()
        ratio = s1 / s0
        assert 0.2 < ratio < 0.55 or 1.4 < ratio < 3.1
    # unknown-class instances are never resized
    labels2 = np.full(n, 4, np.int32)
    out_xyz2, out_labels2 = real_instance_resize(
        np.random.default_rng(2), xyz, labels2, inst, unknown_classes=[4, 6]
    )
    np.testing.assert_array_equal(out_labels2, labels2)
    np.testing.assert_array_equal(out_xyz2, xyz)


def test_two_view_ssl_wrapper(kitti_root):
    from gcdlss_tpu.data.ssl import SSLPrefetchLoader

    unknown, _ = split_table("SemanticKITTI", 1)
    meta = dataset_meta("SemanticKITTI")
    mapping, inv, unk = build_label_mapping(unknown, meta["learning_map_inv"].keys())
    ds = SemanticKITTIDataset(
        kitti_root, "train", voxel_size=0.1, downsampling=1200, augment=True,
        label_mapping=mapping, unknown_labels=unknown, seed=4,
    )
    loader = SSLPrefetchLoader(ds, batch_size=2, voxel_cap=4096, seed=1)
    batch = next(iter(loader))
    a, b = batch["view_a"]["voxel"], batch["view_b"]["voxel"]
    assert a.coords.shape == b.coords.shape == (4096, 4)
    # the two views are differently augmented
    assert not np.array_equal(a.coords, b.coords)
