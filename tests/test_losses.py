import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from gcdlss_tpu.losses import (
    cross_entropy,
    calibration_loss,
    mse_prob_loss,
    adaptive_threshold_loss,
    soft_cross_entropy,
)
from gcdlss_tpu.train.lasermix import band_parity
from gcdlss_tpu.data.augment import lasermix_masks

pytestmark = pytest.mark.smoke


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(50, 7)).astype(np.float32)
    labels = rng.integers(-1, 7, 50).astype(np.int32)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels, dtype=torch.long),
        ignore_index=-1,
    ).item()
    assert abs(ours - ref) < 1e-5


def test_calibration_loss_matches_reference_semantics():
    rng = np.random.default_rng(1)
    k, unknown = 5, 4
    logits = rng.normal(size=(30, k)).astype(np.float32)
    labels = rng.integers(0, k, 30).astype(np.int32)
    ours = float(
        calibration_loss(jnp.asarray(logits), jnp.asarray(labels), unknown)
    )
    # torch reference: mask GT logit to -1e9, target=unknown, ignore GT==unknown
    pl = torch.tensor(logits).clone()
    tl = torch.tensor(labels, dtype=torch.long)
    pl[torch.arange(30), tl] = -1e9
    dummy = torch.full((30,), unknown, dtype=torch.long)
    dummy[tl == unknown] = -1
    ref = F.cross_entropy(pl, dummy, ignore_index=-1).item()
    assert abs(ours - ref) < 1e-4


def test_mse_prob_loss_matches_torch():
    rng = np.random.default_rng(2)
    a = jax.nn.softmax(jnp.asarray(rng.normal(size=(20, 6)).astype(np.float32)))
    b = jax.nn.softmax(jnp.asarray(rng.normal(size=(20, 6)).astype(np.float32)))
    ours = float(mse_prob_loss(a, b))
    ref = F.mse_loss(torch.tensor(np.asarray(a)), torch.tensor(np.asarray(b))).item()
    assert abs(ours - ref) < 1e-6


def test_adaptive_threshold_loss():
    ncc = jnp.asarray([2.0, -1.0, 0.5, -0.5])
    labels = jnp.asarray([0, 1, 9, 9])  # unknown_label = 9
    tau = jnp.asarray(0.0)
    # known: relu(2-0)+relu(-1-0) -> mean(2,0)=1; unknown: relu(0-0.5)+relu(0+0.5) -> mean(0,.5)=.25
    out = float(adaptive_threshold_loss(ncc, labels, 9, tau))
    assert abs(out - 1.25) < 1e-6
    # empty unknown set contributes 0
    out2 = float(adaptive_threshold_loss(ncc, jnp.asarray([0, 1, 2, 3]), 9, tau))
    assert abs(out2 - float(jnp.mean(jax.nn.relu(ncc - 0)))) < 1e-6


def test_lasermix_band_parity_matches_numpy_twin():
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-40, 40, (500, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(-10, 5, 500)
    for num_areas in (3, 4, 5, 6):
        par = np.asarray(band_parity(jnp.asarray(xyz), jnp.asarray(num_areas)))
        rho = np.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
        pitch = np.arctan2(xyz[:, 2], rho)
        sup_in_1, _ = lasermix_masks(pitch, pitch, num_areas)
        np.testing.assert_array_equal(par == 0, sup_in_1)
