import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gcdlss_tpu.losses_zoo import (
    hybrid_distance_cross_entropy,
    attractive_loss,
    prototype_regularization,
    adv_loss,
    pairwise_bce,
    supcon_loss,
    distill_loss,
)
from gcdlss_tpu.losses_lion import gambler_loss, energy_loss, crude_dynamic_energy_loss

pytestmark = pytest.mark.smoke


def test_loss_zoo_finite_and_sane():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    protos = jnp.asarray(rng.normal(size=(5, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, 32).astype(np.int32))

    assert np.isfinite(float(hybrid_distance_cross_entropy(f, protos, labels)))
    assert np.isfinite(float(attractive_loss(f, protos, labels)))
    assert float(prototype_regularization(protos)) >= 0
    assert np.isfinite(float(adv_loss(f, protos)))

    p1 = jax.nn.softmax(jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32)))
    p2 = jax.nn.softmax(jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32)))
    simi = jnp.asarray(rng.choice([-1.0, 1.0], 16).astype(np.float32))
    assert np.isfinite(float(pairwise_bce(p1, p2, simi)))


def test_supcon_loss_prefers_tight_clusters():
    rng = np.random.default_rng(1)
    labels = jnp.asarray(np.repeat([0, 1], 8))
    # tight: same-class features identical
    base = rng.normal(size=(2, 8)).astype(np.float32)
    tight = np.repeat(base, 8, axis=0)
    tight = tight / np.linalg.norm(tight, axis=1, keepdims=True)
    loose = rng.normal(size=(16, 8)).astype(np.float32)
    loose = loose / np.linalg.norm(loose, axis=1, keepdims=True)
    lt = float(supcon_loss(jnp.asarray(tight)[:, None, :], labels))
    ll = float(supcon_loss(jnp.asarray(loose)[:, None, :], labels))
    assert lt < ll


def test_distill_loss_runs():
    rng = np.random.default_rng(2)
    s = jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(8, 10)).astype(np.float32))
    v = float(distill_loss(s, t, epoch=3, warmup_teacher_temp_epochs=5, nepochs=20))
    assert np.isfinite(v)


def test_lion_losses_finite():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 8, 64).astype(np.int32))
    valid = jnp.ones(64, bool)
    g = float(gambler_loss(logits, targets, valid, unknown_cls_idx=5,
                           reward_default=4.5))
    e, energy = energy_loss(logits, targets, valid, ood_ind=5)
    c, _ = crude_dynamic_energy_loss(logits, targets, valid,
                                     details_targets=targets, ood_ind=5)
    assert np.isfinite(g) and np.isfinite(float(e)) and np.isfinite(float(c))
    assert energy.shape == (64,)
