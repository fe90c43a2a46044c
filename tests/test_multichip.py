"""Data-parallel invariance on the virtual 8-device CPU mesh (SURVEY §4 plan):
the same jitted step must produce the same loss whether inputs live on one
device or are sharded across the mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from gcdlss_tpu.parallel.mesh import make_mesh, replicate, shard_voxel_batch
from gcdlss_tpu.train.pretrain import (
    PretrainConfig,
    create_pretrain_state,
    pretrain_train_step,
)

CAPS = (1024, 512, 512, 256, 256)


def _batch(rng, cap, nscans=2):
    pts = rng.uniform(-20, 20, size=(cap, 3))
    coords = np.concatenate(
        [
            rng.integers(0, nscans, size=(cap, 1)).astype(np.int32),
            np.floor(pts / 0.2).astype(np.int32),
        ],
        axis=1,
    )
    order = np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0]))
    coords = coords[order]
    return {
        "coords": jnp.asarray(coords),
        "feats": jnp.asarray(rng.uniform(0, 1, (cap, 1)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 17, cap).astype(np.int32)),
        "mapped_labels": jnp.asarray(rng.integers(0, 17, cap).astype(np.int32)),
        "valid": jnp.ones((cap,), bool),
    }


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pretrain_step_dp_invariant():
    cfg = PretrainConfig(
        num_labeled_classes=17, num_classes=19, unknown_label=17,
        voxel_caps=CAPS, arch="MinkUNet14", planes=(8,) * 8,
        steps_per_epoch=1, epochs=2, warmup_epochs=1,
    )
    rng = np.random.default_rng(0)
    batch = _batch(rng, CAPS[0])

    state1 = create_pretrain_state(jax.random.PRNGKey(0), cfg)
    _, m1 = pretrain_train_step(state1, batch, cfg)
    loss_single = float(m1["loss"])

    mesh = make_mesh(8)
    state8 = create_pretrain_state(jax.random.PRNGKey(0), cfg)
    state8 = replicate(state8, mesh)
    sharded = shard_voxel_batch(batch, mesh)
    _, m8 = pretrain_train_step(state8, sharded, cfg)
    loss_sharded = float(m8["loss"])

    assert np.isfinite(loss_single)
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-4)
