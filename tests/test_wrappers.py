import numpy as np
import jax
import jax.numpy as jnp

from gcdlss_tpu.models.wrappers import (
    MultiHeadMinkUnet,
    MultiHeadSelfSupMinkUnet,
    MinkUNetSegCosine,
)
from gcdlss_tpu.models.orca import MinkUnetToy18, MinkUnet34ORCA
from gcdlss_tpu.models.backbone_mm import MultiHeadMinkUnet18
from gcdlss_tpu.models.voxelizer import Voxelizer
from gcdlss_tpu.ops.plan import build_unet_plan

CAP = 512


def _plan():
    rng = np.random.default_rng(0)
    coords = np.unique(
        np.concatenate(
            [np.zeros((CAP, 1), np.int32),
             rng.integers(-10, 10, (CAP, 3)).astype(np.int32)], axis=1
        ), axis=0,
    )
    pad = np.zeros((CAP, 4), np.int32)
    pad[: len(coords)] = coords
    valid = np.zeros(CAP, bool)
    valid[: len(coords)] = True
    return build_unet_plan(jnp.asarray(pad), jnp.asarray(valid),
                           (CAP, CAP // 2, CAP // 2, CAP // 4, CAP // 4))


def test_wrapper_zoo_shapes():
    plan = _plan()
    feats = jnp.ones((CAP, 1), jnp.float32)
    tiny = dict(arch="MinkUNet14", planes=(4,) * 8)

    m = MultiHeadMinkUnet(num_labeled=5, num_unlabeled=2, num_heads=2,
                          overcluster_factor=3, **tiny)
    v = m.init(jax.random.PRNGKey(0), plan, feats, train=False)
    out = m.apply(v, plan, feats, train=False)
    assert out["logits_lab"].shape == (CAP, 5)
    assert out["logits_unlab"].shape == (2, CAP, 2)
    assert out["logits_unlab_over"].shape == (2, CAP, 6)

    s = MultiHeadSelfSupMinkUnet(out_dim=16, simgcd=True, **tiny)
    v = s.init(jax.random.PRNGKey(1), plan, feats, train=False)
    out = s.apply(v, plan, feats, train=False)
    assert out["proj_feats"].shape == (CAP, 256)
    assert out["logits"].shape == (CAP, 16)

    c = MinkUNetSegCosine(num_classes=7, **tiny)
    v = c.init(jax.random.PRNGKey(2), plan, feats, train=False)
    out = c.apply(v, plan, feats, train=False)
    assert out["logits"].shape == (CAP, 7)

    t = MinkUnetToy18(num_classes=5, **tiny)
    v = t.init(jax.random.PRNGKey(3), plan, feats, train=False)
    out = t.apply(v, plan, feats, train=False)
    assert out["logits"].shape == (CAP, 5)
    assert out["feats"].shape[0] == CAP

    o = MinkUnet34ORCA(num_classes=6, **tiny)
    v = o.init(jax.random.PRNGKey(4), plan, feats, train=False)
    out = o.apply(v, plan, feats, train=False)
    assert out["logits"].shape == (CAP, 6)
    # cosine head: logits bounded by the 10x scale
    assert float(jnp.max(jnp.abs(out["logits"]))) <= 10.0 + 1e-5

    mm = MultiHeadMinkUnet18(num_labeled=5, num_unlabeled=2, num_heads=2,
                             overcluster_factor=3, base_channels=4,
                             encoder_channels=(4, 4, 8, 8),
                             decoder_channels=(8, 8, 4, 4))
    v = mm.init(jax.random.PRNGKey(5), plan, feats, train=False)
    out = mm.apply(v, plan, feats, train=False)
    assert out["logits_lab"].shape == (CAP, 5)
    assert out["logits_unlab"].shape == (2, CAP, 2)
    assert out["logits_unlab_over"].shape == (2, CAP, 6)
    assert out["feats"].shape == (CAP, 4)
    # mmdet3d topology: two-conv k3 stem + channel-asymmetric stages
    enc = v["params"]["backbone"]
    assert "conv_input1" in enc and "enc0_down" in enc and "dec3_blocks" in enc


def test_voxelizer_modes():
    rng = np.random.default_rng(1)
    pts = rng.uniform(2, 40, (300, 3)).astype(np.float32)
    feats = rng.uniform(0, 1, (300, 2)).astype(np.float32)
    bidx = jnp.zeros(300, jnp.int32)
    valid = jnp.ones(300, bool)
    for vt in ("hard", "dynamic", "cylindrical", "minkunet"):
        vx = Voxelizer(
            voxel_type=vt, voxel_size=(0.5, 0.5, 0.5),
            point_cloud_range=(0, -50, -50, 50, 50, 50),
            max_voxels=512, max_num_points=8,
        )
        out = vx.voxelize(jnp.asarray(pts), jnp.asarray(feats), bidx, valid)
        assert "coords" in out
