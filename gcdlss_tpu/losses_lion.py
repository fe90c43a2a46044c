"""LiON-variant energy-based OOD losses (jax).

Functional rebuilds of `utils/loss_LiON.py` for the
`ExpMergeDiscover_LaserMix_LiON_MeanTeacher` variant
(`modules/exp_merge_mean_teacher.py:4190-4589`): Gambler reservation loss with
an energy-score reward, 3D gaussian blur, smooth/sparsity regularizers, and
the (crude-)dynamic energy margin losses. Point-cloud (row) layouts replace
the reference's dense [B,C,X,Y,Z] voxel grids: the blur becomes an optional
neighborhood average supplied by the caller, and the smoothness regularizer
operates on voxel-neighbor pairs from a plan's k=3 neighbor map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_M_IN = -12.0
_M_OUT = -6.0


def _in_distribution(logits, ood_ind: int):
    return jnp.concatenate([logits[:, 1:ood_ind], logits[:, ood_ind + 1 :]], axis=-1)


def energy_of(logits, ood_ind: int, temperature: float = 1.0):
    """E(x) = -T logsumexp(in-distribution logits / T); class 0 + ood excluded."""
    return -(temperature * jax.scipy.special.logsumexp(
        _in_distribution(logits, ood_ind) / temperature, axis=-1
    ))


def smooth_reg(energy, nbr, valid, lam: float = 3e-6):
    """Neighbor smoothness on the sparse voxel graph: sum over edges of
    (E_i - E_j)^2 (replaces the dense shifted-array version)."""
    safe = jnp.where(nbr >= 0, nbr, 0)
    e_n = energy[safe]
    ok = (nbr >= 0) & valid[:, None]
    d2 = jnp.square(energy[:, None] - e_n) * ok
    return lam * jnp.sum(d2) / 3.0


def sparsity_reg(values, mask, lam: float = 5e-4):
    m = mask.astype(values.dtype)
    return lam * jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(values) * m), 1e-12))


def _masked_mean(x, m):
    mm = m.astype(jnp.float32)
    s = jnp.sum(mm)
    return jnp.where(s > 0, jnp.sum(x * mm) / jnp.maximum(s, 1.0), 0.0)


def energy_loss(logits, targets, valid, ood_ind: int = 5,
                nbr=None):
    """Hinge^2 energy margins: in-distribution below m_in, OOD above m_out."""
    energy = energy_of(logits, ood_ind)
    is_out = (targets == ood_ind) & valid
    is_in = (targets != ood_ind) & (targets != 0) & (targets >= 0) & valid
    has_out = jnp.sum(is_out) > 0
    l_in = _masked_mean(jnp.square(jax.nn.relu(energy - _M_IN)), is_in)
    l_out = _masked_mean(jnp.square(jax.nn.relu(_M_OUT - energy)), is_out)
    loss = jnp.where(has_out, 0.5 * (l_in + l_out) + sparsity_reg(energy, is_out), l_in)
    if nbr is not None:
        loss = loss + smooth_reg(energy, nbr, valid)
    return loss, energy


def crude_dynamic_energy_loss(
    logits, targets, valid, details_targets, ood_ind: int = 5,
    m_out_max: float = 0.0, resized_point_label: int = 20,
    resize_m_out: float = -6.0, nbr=None,
):
    """Separate energy margins for REAL-resized points vs ShapeNet-inserted
    points (`loss_LiON.py:339-383`)."""
    shapenet_label = resized_point_label + 1
    energy = energy_of(logits, ood_ind)
    is_out = (targets == ood_ind) & valid
    is_in = (targets != ood_ind) & (targets != 0) & (targets >= 0) & valid
    has_out = jnp.sum(is_out) > 0

    l_in = _masked_mean(jnp.square(jax.nn.relu(energy - _M_IN)), is_in)
    resized = (details_targets == resized_point_label) & valid
    spn = (details_targets >= shapenet_label) & valid
    l_resized = _masked_mean(jnp.square(jax.nn.relu(resize_m_out - energy)), resized)
    l_spn = _masked_mean(jnp.square(jax.nn.relu(m_out_max - energy)), spn)
    cnt = (jnp.sum(resized) > 0).astype(jnp.float32) + (jnp.sum(spn) > 0).astype(
        jnp.float32
    )
    l_out = (l_resized + l_spn) / (cnt + 1e-8)
    loss = jnp.where(
        has_out, 0.5 * (l_out + l_in) + sparsity_reg(energy, is_out), l_in
    )
    if nbr is not None:
        loss = loss + smooth_reg(energy, nbr, valid)
    return loss, energy


def gambler_loss(
    logits, targets, valid, unknown_cls_idx: int, reward_default: float,
    ood_reg: float = 0.1, has_ood: bool = True,
):
    """Reservation (gambler) loss: the unknown-class probability acts as an
    abstention channel scaled by a squared energy reward (`loss_LiON.py:46-181`).

    The reference's 3D gaussian blur of the reward is approximated by the raw
    per-voxel reward (callers may pre-smooth via `smooth_reg`-style neighbor
    averaging); class 0 is excluded throughout.
    """
    neg = jnp.full_like(logits[:, :1], -99999.0)
    logits = jnp.concatenate([neg, logits[:, 1:]], axis=-1)
    prob = jnp.clip(jax.nn.softmax(logits, axis=-1), 1e-7, 1.0)
    true_pred = jnp.concatenate(
        [prob[:, :unknown_cls_idx], prob[:, unknown_cls_idx + 1 :]], axis=-1
    )
    reservation = prob[:, unknown_cls_idx]
    reward = jnp.square(
        jax.scipy.special.logsumexp(_in_distribution(logits, unknown_cls_idx), axis=-1)
    )
    reward = jnp.maximum(reward, reward_default)
    reservation = reservation / reward

    is_ood = (targets == unknown_cls_idx) & valid
    is_void = (targets <= 0) | ~valid
    # shift targets past the removed unknown channel
    t = jnp.where(is_ood | is_void, 0, targets)
    shifted = t - (t > unknown_cls_idx).astype(t.dtype)
    shifted = jnp.clip(shifted, 0, true_pred.shape[1] - 1)
    g_in = jnp.take_along_axis(true_pred, shifted[:, None], axis=1)[:, 0] + reservation
    in_mask = ~is_ood & ~is_void
    loss_in = _masked_mean(jnp.log(jnp.maximum(g_in, 1e-7)), in_mask)
    if has_ood:
        boost = jnp.log(jnp.maximum(true_pred + reservation[:, None], 1e-7))
        loss_out = ood_reg * _masked_mean(
            jnp.mean(boost, axis=-1), is_ood
        )
        return -(loss_in + loss_out)
    return -loss_in
