"""Auxiliary loss zoo used by the reference's ablation experiments.

Functional jax rebuilds of `utils/loss.py`:
  HybridDistanceCrossEntropyLoss, AttractiveLoss, RegularizationTerm, AdvLoss,
  pairwise BCE, SupConLoss (+auxiliary / metric variants), DistillLoss
  (DINO-style temperature-scheduled distillation).
All take explicit masks instead of relying on dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def hybrid_distance_cross_entropy(features, prototypes, labels, valid=None,
                                  normalized=True):
    """CE over (cosine or euclidean-similarity) feature-prototype distances."""
    if normalized:
        logits = _normalize(features) @ _normalize(prototypes).T
    else:
        d = jnp.sum(
            jnp.square(features[:, None, :] - prototypes[None, :, :]), axis=-1
        )
        logits = -d
    from .losses import cross_entropy

    return cross_entropy(logits, labels, valid)


def attractive_loss(features, prototypes, labels, valid=None):
    """Pull features towards their class prototype (mean squared distance)."""
    safe = jnp.clip(labels, 0, prototypes.shape[0] - 1)
    target = prototypes[safe]
    d = jnp.sum(jnp.square(features - target), axis=-1)
    mask = labels >= 0
    if valid is not None:
        mask = mask & valid
    m = mask.astype(jnp.float32)
    return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1.0)


def prototype_regularization(prototypes):
    """Penalize prototype similarity (off-diagonal cosine)."""
    sim = _normalize(prototypes) @ _normalize(prototypes).T
    k = prototypes.shape[0]
    off = sim - jnp.eye(k) * sim
    return jnp.sum(jnp.abs(off)) / jnp.maximum(k * (k - 1), 1)


def adv_loss(synthetic_features, prototypes, epsilon=1e-6):
    """Push synthetic (unseen-class) features away from all seen prototypes."""
    sim = _normalize(synthetic_features) @ _normalize(prototypes).T
    p = jax.nn.softmax(sim, axis=-1)
    return -jnp.mean(jnp.sum(p * jnp.log(p + epsilon), axis=-1))


def pairwise_bce(prob1, prob2, simi):
    """Pairwise similarity BCE: simi in {+1, -1} per pair."""
    p = jnp.sum(prob1 * prob2, axis=-1)
    signed = simi * (p - 1.0) / 2.0 + (1.0 + p) / 2.0
    signed = jnp.clip(signed, 1e-7, 1.0 - 1e-7)
    return -jnp.mean(jnp.log(signed))


def supcon_loss(features, labels=None, mask=None, valid=None,
                temperature=0.07, base_temperature=0.07):
    """Supervised contrastive loss (Khosla et al.) over [N, V, C] features.

    `features` must be L2-normalized per view. If `labels` given, positives
    share a label; else `mask` [N, N] marks positives.
    """
    n, v, c = features.shape
    if valid is None:
        valid = jnp.ones((n,), bool)
    if mask is None:
        if labels is None:
            mask = jnp.eye(n)
        else:
            mask = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    # view-major stacking ([view0 rows; view1 rows; ...]) to match
    # torch.cat(torch.unbind(features, dim=1)) — required for the
    # tile(mask, (v, v)) block structure to line up when v > 1
    feats = features.transpose(1, 0, 2).reshape(n * v, c)
    sim = feats @ feats.T / temperature
    # numeric stability
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))
    big_mask = jnp.tile(mask, (v, v))
    vvalid = jnp.tile(valid, (v,))
    logits_mask = (1.0 - jnp.eye(n * v)) * vvalid[None, :]
    big_mask = big_mask * logits_mask
    exp = jnp.exp(sim) * logits_mask
    log_prob = sim - jnp.log(jnp.maximum(jnp.sum(exp, axis=1, keepdims=True), 1e-12))
    pos_cnt = jnp.maximum(jnp.sum(big_mask, axis=1), 1.0)
    mean_log_prob_pos = jnp.sum(big_mask * log_prob, axis=1) / pos_cnt
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    m = vvalid.astype(jnp.float32)
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)


def supcon_loss_with_auxiliary(features, labels, aux_features,
                               valid=None, aux_valid=None,
                               temperature=0.07, base_temperature=0.07):
    """SupCon with auxiliary pure-negative features.

    Rebuilds `SupConLossWithAuxiliary` (`utils/loss.py:261-352`): the aux
    rows join the contrast set (denominator) but are never anchors and never
    positives — their mask columns are zero, so they only push anchors away.
    `features` [N, V, C] L2-normalized per view; `aux_features` [M, C].
    """
    n, v, c = features.shape
    m = aux_features.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if aux_valid is None:
        aux_valid = jnp.ones((m,), bool)
    mask = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    # view-major stacking (see supcon_loss / metric_supcon_loss)
    anchors = features.transpose(1, 0, 2).reshape(n * v, c)
    contrast = jnp.concatenate([anchors, aux_features], axis=0)
    sim = anchors @ contrast.T / temperature
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))
    big_mask = jnp.tile(mask, (v, v))
    big_mask = jnp.concatenate(
        [big_mask, jnp.zeros((n * v, m))], axis=1)  # aux: never positive
    vvalid = jnp.concatenate([jnp.tile(valid, (v,)), aux_valid])
    logits_mask = jnp.concatenate(
        [1.0 - jnp.eye(n * v), jnp.ones((n * v, m))], axis=1
    ) * vvalid[None, :]
    big_mask = big_mask * logits_mask
    exp = jnp.exp(sim) * logits_mask
    log_prob = sim - jnp.log(
        jnp.maximum(jnp.sum(exp, axis=1, keepdims=True), 1e-12))
    pos_cnt = jnp.maximum(jnp.sum(big_mask, axis=1), 1.0)
    mean_log_prob_pos = jnp.sum(big_mask * log_prob, axis=1) / pos_cnt
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    am = jnp.tile(valid, (v,)).astype(jnp.float32)
    return jnp.sum(loss * am) / jnp.maximum(jnp.sum(am), 1.0)


def metric_supcon_loss(features, labels=None, mask=None, ignore=None,
                       valid=None, metric: str = "dot",
                       temperature=0.07, base_temperature=0.07,
                       reduction: bool = True):
    """SupCon under alternative similarity metrics.

    Rebuilds `MetricSupConLoss` (`utils/loss.py:354-476`): metric one of
    dot | reverse_dot | sign_l2 | reverse_sign_l2 ('dot' degenerates to the
    original SupCon; 'reverse_*' negate the similarity AFTER the stability
    max-subtraction, exactly as the reference does; 'sign_l2' uses negative
    mean squared distance between tanh-squashed features). `ignore` [N]
    restricts each anchor's denominator to rows sharing its ignore id.
    """
    n, v, c = features.shape
    if valid is None:
        valid = jnp.ones((n,), bool)
    if mask is None:
        if labels is None:
            mask = jnp.eye(n)
        else:
            mask = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    # view-major stacking ([view0 rows; view1 rows; ...]) to match
    # torch.cat(torch.unbind(features, dim=1)) — required for the
    # tile(mask, (v, v)) block structure to line up when v > 1
    feats = features.transpose(1, 0, 2).reshape(n * v, c)
    if metric in ("dot", "reverse_dot"):
        raw = feats @ feats.T / temperature
    elif metric in ("sign_l2", "reverse_sign_l2"):
        t = jnp.tanh(feats)
        d2 = jnp.mean(
            jnp.square(t[:, None, :] - t[None, :, :]), axis=-1)
        raw = -d2 / temperature
    else:
        raise NotImplementedError(metric)
    # reference quirk preserved: the stability max is taken on the raw
    # similarities, then the 'reverse' variants negate raw but still
    # subtract that same (un-negated) max
    mx = jax.lax.stop_gradient(jnp.max(raw, axis=1, keepdims=True))
    sim = (-raw if metric.startswith("reverse") else raw) - mx
    big_mask = jnp.tile(mask, (v, v))
    vvalid = jnp.tile(valid, (v,))
    logits_mask = (1.0 - jnp.eye(n * v)) * vvalid[None, :]
    big_mask = big_mask * logits_mask
    denom_mask = logits_mask
    if ignore is not None:
        ig = jnp.tile(ignore, (v,))
        denom_mask = denom_mask * (
            ig[:, None] == ig[None, :]).astype(jnp.float32)
    exp = jnp.exp(sim) * denom_mask
    log_prob = sim - jnp.log(
        jnp.maximum(jnp.sum(exp, axis=1, keepdims=True), 1e-12))
    pos_cnt = jnp.maximum(jnp.sum(big_mask, axis=1), 1.0)
    mean_log_prob_pos = jnp.sum(big_mask * log_prob, axis=1) / pos_cnt
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    if not reduction:
        return loss.reshape(v, n)
    m = vvalid.astype(jnp.float32)
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)


def distill_loss(student_out, teacher_out, epoch,
                 warmup_teacher_temp_epochs: int, nepochs: int,
                 ncrops: int = 2, warmup_teacher_temp: float = 0.07,
                 teacher_temp: float = 0.04, student_temp: float = 0.1):
    """DINO-style distillation with linear teacher-temperature warmup."""
    frac = jnp.clip(epoch / jnp.maximum(warmup_teacher_temp_epochs, 1), 0.0, 1.0)
    t_temp = warmup_teacher_temp + frac * (teacher_temp - warmup_teacher_temp)
    s = student_out / student_temp
    t = jax.nn.softmax(teacher_out / t_temp, axis=-1)
    t = jax.lax.stop_gradient(t)
    s_chunks = jnp.split(s, ncrops)
    t_chunks = jnp.split(t, ncrops)
    total, nterms = 0.0, 0
    for iq, q in enumerate(t_chunks):
        for iv, p in enumerate(s_chunks):
            if iv == iq:
                continue
            total = total + jnp.mean(
                jnp.sum(-q * jax.nn.log_softmax(p, axis=-1), axis=-1)
            )
            nterms += 1
    return total / max(nterms, 1)
