import pytest
import numpy as np

from gcdlss_tpu.utils.visualize import write_ply, read_ply, get_color
from gcdlss_tpu.utils.misc import cluster_acc, AverageMeter

pytestmark = pytest.mark.smoke


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "cloud.ply")
    write_ply(p, [xyz, rgb], ["x", "y", "z", "red", "green", "blue"])
    data = read_ply(p)
    np.testing.assert_allclose(data["x"], xyz[:, 0])
    np.testing.assert_array_equal(data["red"], rgb[:, 0])


def test_get_color_known_classes():
    labels = np.array([0, 8, 14], np.int32)  # car, road, vegetation
    rgb = get_color(labels)
    assert rgb.shape == (3, 3)
    assert rgb.dtype == np.uint8
    # car raw color is BGR [245,150,100] -> RGB [100,150,245]
    np.testing.assert_array_equal(rgb[0], [100, 150, 245])


def test_cluster_acc_and_meter():
    y = np.array([0, 0, 1, 1, 2, 2])
    pred = np.array([1, 1, 0, 0, 2, 2])  # permuted but consistent
    assert cluster_acc(y, pred) == 1.0
    m = AverageMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0
