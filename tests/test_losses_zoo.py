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
    supcon_loss_with_auxiliary,
    metric_supcon_loss,
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


def _torch_supcon(feats_nvc, labels, aux=None, metric="dot", ignore=None,
                  temperature=0.07):
    """Independent torch re-derivation of the reference SupCon family
    (`utils/loss.py:169-476`) for oracle comparison; two views, cat along
    dim 1 unbind order (view-major)."""
    import torch

    f = torch.tensor(feats_nvc)
    n, v, c = f.shape
    lab = torch.tensor(labels).view(-1, 1)
    mask = (lab == lab.T).float()
    contrast = torch.cat(torch.unbind(f, dim=1), dim=0)
    anchors = contrast
    if aux is not None:
        contrast = torch.cat([contrast, torch.tensor(aux)], dim=0)
    if metric in ("dot", "reverse_dot"):
        raw = anchors @ contrast.T / temperature
    else:
        t = torch.tanh(anchors)
        raw = -((t.unsqueeze(1) - torch.tanh(contrast).unsqueeze(0))
                ** 2).mean(-1) / temperature
    mx = raw.max(dim=1, keepdim=True).values
    logits = (-raw if metric.startswith("reverse") else raw) - mx
    big = mask.repeat(v, v)
    if aux is not None:
        big = torch.cat([big, torch.zeros(n * v, aux.shape[0])], dim=1)
    lm = torch.ones_like(big)
    lm[torch.arange(n * v), torch.arange(n * v)] = 0
    big = big * lm
    dm = lm
    if ignore is not None:
        ig = torch.tensor(ignore).repeat(v).view(-1, 1)
        dm = dm * (ig == ig.T).float()
    expv = torch.exp(logits) * dm
    logp = logits - torch.log(expv.sum(1, keepdim=True))
    mean_pos = (big * logp).sum(1) / big.sum(1).clamp(min=1)
    return float(-mean_pos.view(v, n).mean())


def test_supcon_auxiliary_vs_torch_oracle():
    """`SupConLossWithAuxiliary` (`utils/loss.py:261-352`): aux rows are
    pure negatives — in the denominator, never anchors/positives."""
    rng = np.random.default_rng(5)
    f = rng.normal(size=(10, 2, 6)).astype(np.float32)
    f /= np.linalg.norm(f, axis=2, keepdims=True)
    labels = rng.integers(0, 3, 10).astype(np.int32)
    aux = rng.normal(size=(4, 6)).astype(np.float32)
    aux /= np.linalg.norm(aux, axis=1, keepdims=True)
    want = _torch_supcon(f, labels, aux=aux)
    got = float(supcon_loss_with_auxiliary(
        jnp.asarray(f), jnp.asarray(labels), jnp.asarray(aux)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # adding aux negatives can only increase the loss (bigger denominator)
    base = float(supcon_loss(jnp.asarray(f), jnp.asarray(labels)))
    assert got > base


def test_metric_supcon_vs_torch_oracle():
    """`MetricSupConLoss` (`utils/loss.py:354-476`): all four metrics +
    the ignore-restricted denominator, against the torch re-derivation;
    'dot' must equal plain supcon_loss."""
    rng = np.random.default_rng(6)
    f = rng.normal(size=(8, 2, 5)).astype(np.float32)
    f /= np.linalg.norm(f, axis=2, keepdims=True)
    labels = rng.integers(0, 3, 8).astype(np.int32)
    for metric in ("dot", "reverse_dot", "sign_l2", "reverse_sign_l2"):
        want = _torch_supcon(f, labels, metric=metric)
        got = float(metric_supcon_loss(
            jnp.asarray(f), jnp.asarray(labels), metric=metric))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=metric)
    np.testing.assert_allclose(
        float(metric_supcon_loss(jnp.asarray(f), jnp.asarray(labels))),
        float(supcon_loss(jnp.asarray(f), jnp.asarray(labels))), atol=1e-6)
    ignore = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.int32)
    want = _torch_supcon(f, labels, ignore=ignore)
    got = float(metric_supcon_loss(
        jnp.asarray(f), jnp.asarray(labels), ignore=jnp.asarray(ignore)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_supcon_two_views_vs_torch_oracle():
    """V=2 stacking order matches torch.cat(torch.unbind(dim=1))
    (view-major); anchor-major stacking breaks the tiled mask blocks."""
    rng = np.random.default_rng(7)
    f = rng.normal(size=(6, 2, 4)).astype(np.float32)
    f /= np.linalg.norm(f, axis=2, keepdims=True)
    labels = rng.integers(0, 2, 6).astype(np.int32)
    want = _torch_supcon(f, labels)
    got = float(supcon_loss(jnp.asarray(f), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, atol=1e-5)


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
