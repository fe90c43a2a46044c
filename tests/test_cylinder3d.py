import numpy as np
import jax
import jax.numpy as jnp

from gcdlss_tpu.models.cylinder3d import (
    MultiHeadCylinder3D,
    Cylinder3DHead,
    build_cyl_plan,
)
from gcdlss_tpu.ops.asym import offset_subset
from gcdlss_tpu.ops.scatter import dynamic_scatter, cylindrical_coords, scatter_mean
from gcdlss_tpu.ops.lovasz import lovasz_softmax

import pytest

pytestmark = pytest.mark.slow


def test_offset_subsets():
    assert len(offset_subset((1, 3, 3))) == 9
    assert len(offset_subset((3, 1, 3))) == 9
    assert len(offset_subset((3, 1, 1))) == 3
    assert len(offset_subset((3, 3, 3))) == 27


def test_dynamic_scatter_max_mean():
    pts = jnp.asarray(np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]], np.float32))
    coords = jnp.asarray(np.array([[0, 0, 0, 0], [0, 0, 0, 0], [0, 5, 5, 5]], np.int32))
    feats = jnp.asarray(np.array([[1.0, -2.0], [3.0, -4.0], [7.0, 8.0]], np.float32))
    valid = jnp.ones(3, bool)
    out = dynamic_scatter(feats, coords, valid, 8, mode="max")
    assert int(out["count"]) == 2
    np.testing.assert_allclose(np.asarray(out["feats"])[0], [3.0, -2.0])
    np.testing.assert_allclose(np.asarray(out["feats"])[1], [7.0, 8.0])
    out = dynamic_scatter(feats, coords, valid, 8, mode="mean")
    np.testing.assert_allclose(np.asarray(out["feats"])[0], [2.0, -3.0])


def test_lovasz_softmax_basics():
    labels = jnp.asarray(np.array([0, 1, 1, -1], np.int32))
    perfect = jax.nn.one_hot(jnp.clip(labels, 0, 1), 2)
    l_perfect = float(lovasz_softmax(perfect, labels))
    wrong = 1.0 - perfect
    l_wrong = float(lovasz_softmax(wrong, labels))
    assert l_perfect < 1e-5
    assert l_wrong > 0.5


def test_cylinder3d_forward():
    rng = np.random.default_rng(0)
    p = 512
    xyz = np.zeros((p, 3), np.float32)
    r = rng.uniform(2, 45, p)
    th = rng.uniform(-np.pi, np.pi, p)
    xyz[:, 0] = r * np.cos(th)
    xyz[:, 1] = r * np.sin(th)
    xyz[:, 2] = rng.uniform(-3.5, 1.5, p)
    feats = rng.uniform(0, 1, (p, 3)).astype(np.float32)  # xyz extras/intensity
    bidx = np.repeat(np.arange(2, dtype=np.int32), p // 2)
    model = MultiHeadCylinder3D(
        num_labeled=14, num_unlabeled=2, num_heads=2, overcluster_factor=3,
        base_channels=4, grid_shape=(60, 45, 10), caps=(512, 256, 128, 64, 64),
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(xyz), jnp.asarray(feats),
        jnp.asarray(bidx), jnp.ones(p, bool), train=False,
    )
    out = model.apply(
        variables, jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(bidx),
        jnp.ones(p, bool), train=False,
    )
    assert out["logits_lab"].shape == (512, 14)
    assert out["logits_unlab"].shape == (2, 512, 2)
    assert out["logits_unlab_over"].shape == (2, 512, 6)
    assert out["feats"].shape[-1] == 16  # 4 * base_channels
    # head loss runs
    labels = jnp.asarray(rng.integers(-1, 14, 512).astype(np.int32))
    loss, parts = Cylinder3DHead.loss(
        out["logits_lab"], labels, out["voxel_valid"]
    )
    assert np.isfinite(float(loss))


def test_hard_voxelize():
    import jax.numpy as jnp
    from gcdlss_tpu.ops.scatter import hard_voxelize

    pts = np.array([[0.1, 0.1, 0.1], [0.15, 0.12, 0.11], [0.12, 0.13, 0.14],
                    [3.0, 3.0, 0.5], [99.0, 0.0, 0.0]], np.float32)
    feats = np.arange(10, dtype=np.float32).reshape(5, 2)
    out = hard_voxelize(
        jnp.asarray(pts), jnp.asarray(feats),
        jnp.zeros(5, jnp.int32), jnp.ones(5, bool),
        point_cloud_range=(0, 0, 0, 10, 10, 10), voxel_size=(1.0, 1.0, 1.0),
        max_voxels=8, max_points=2,
    )
    # voxel (0,0,0) holds 3 points but max_points=2
    num = np.asarray(out["num_points"])
    assert int(out["count"]) == 2
    assert sorted(num[num > 0].tolist()) == [1, 2]
    # out-of-range point dropped
    assert np.asarray(out["valid"]).sum() == 2


def test_cylinder_train_step():
    from gcdlss_tpu.train.cylinder import (
        CylinderConfig, create_cylinder_state, cylinder_train_step,
        cylinder_eval_step,
    )
    from gcdlss_tpu.train.common import inv_label_lut
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    cfg = CylinderConfig(
        num_labeled_classes=14, num_classes=16, unknown_label=14,
        num_unlabeled_classes=2, grid_shape=(60, 45, 10),
        caps=(512, 256, 128, 64, 64), base_channels=4, point_cap=256,
        num_scans=2, steps_per_epoch=1, epochs=2, warmup_epochs=1,
    )
    state = create_cylinder_state(jax.random.PRNGKey(0), cfg)
    s, p = 2, 256
    r = rng.uniform(3, 45, (s, p))
    th = rng.uniform(-np.pi, np.pi, (s, p))
    xyz = np.stack([r * np.cos(th), r * np.sin(th),
                    rng.uniform(-3.5, 1.5, (s, p))], -1).astype(np.float32)
    pts = {
        "xyz": jnp.asarray(xyz),
        "feats": jnp.asarray(rng.uniform(0, 1, (s, p, 3)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 15, (s, p)).astype(np.int32)),
        "mapped_labels": jnp.asarray(rng.integers(0, 14, (s, p)).astype(np.int32)),
        "valid": jnp.ones((s, p), bool),
    }
    state, m = cylinder_train_step(state, pts, cfg)
    assert np.isfinite(float(m["loss"]))
    state, m2 = cylinder_train_step(state, pts, cfg)
    assert np.isfinite(float(m2["loss"]))
    lut = jnp.asarray(inv_label_lut({i: i for i in range(14)}, 14))
    conf = cylinder_eval_step(state, pts, lut, cfg)
    assert np.asarray(conf).sum() > 0
