"""Feature-mixing augmentations for the PolarMix mean-teacher variant.

Rebuild of `mix_features` / `mix_unsup_features` / `mix_unsup_centroid`
(`modules/exp_merge_mean_teacher.py:2639-2734`): random permutation pairs of
voxel features convex-combined with a Beta(0.5, 0.5)-sampled ratio, producing
soft (two-hot) targets; unsup variants target the unknown slot. Masked,
fixed-shape (invalid rows carry zero weight in the downstream soft CE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mix_features(rng, feats, labels, valid, num_classes: int,
                 beta_coeff: float = 0.5, mixing_ratio: float | None = None):
    """Returns (mix_feats [N, C], mix_probs [N, num_classes], mix_valid [N])."""
    n = feats.shape[0]
    k1, k2, kb = jax.random.split(rng, 3)
    p1 = jax.random.permutation(k1, n)
    p2 = jax.random.permutation(k2, n)
    l1, l2 = labels[p1], labels[p2]
    ok = (l1 != l2) & valid[p1] & valid[p2] & (l1 >= 0) & (l2 >= 0)
    if mixing_ratio is None:
        r = jax.random.beta(kb, beta_coeff, beta_coeff)
    else:
        r = jnp.asarray(mixing_ratio, jnp.float32)
    mix = r * feats[p1] + (1.0 - r) * feats[p2]
    mix = jax.lax.stop_gradient(mix) * ok[:, None]
    probs = (
        r * jax.nn.one_hot(jnp.clip(l1, 0, num_classes - 1), num_classes)
        + (1.0 - r) * jax.nn.one_hot(jnp.clip(l2, 0, num_classes - 1), num_classes)
    )
    probs = probs / jnp.maximum(jnp.sum(probs, axis=-1, keepdims=True), 1e-12)
    return mix, probs * ok[:, None], ok


def mix_centroid_sup(rng, feats, labels, valid, unknown_label: int):
    """Average labeled feature triples with pairwise-distinct labels.

    Rebuild of `ExpMixExtraFineTuning.mix_centroid_features`
    (`modules/exp.py:1494-1517`): three independent permutations of the
    labeled rows, kept only where all three labels differ, averaged and
    targeted at the unknown slot. Masked fixed-shape (invalid rows carry
    label -1 and zero features)."""
    n = feats.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    p1 = jax.random.permutation(k1, n)
    p2 = jax.random.permutation(k2, n)
    p3 = jax.random.permutation(k3, n)
    l1, l2, l3 = labels[p1], labels[p2], labels[p3]
    ok = (
        valid[p1] & valid[p2] & valid[p3]
        & (l1 >= 0) & (l2 >= 0) & (l3 >= 0)
        & (l1 != l2) & (l2 != l3) & (l1 != l3)
    )
    mix = jax.lax.stop_gradient(
        (feats[p1] + feats[p2] + feats[p3]) / 3.0
    ) * ok[:, None]
    mix_labels = jnp.where(ok, unknown_label, -1).astype(jnp.int32)
    return mix, mix_labels, ok


def mix_unsup_features(rng, feats, valid, unknown_label: int,
                       beta_coeff: float = 0.5):
    """Mix random unsup feature pairs; targets are the unknown slot."""
    n = feats.shape[0]
    k1, k2, kb = jax.random.split(rng, 3)
    p1 = jax.random.permutation(k1, n)
    p2 = jax.random.permutation(k2, n)
    ok = valid[p1] & valid[p2]
    r = jax.random.beta(kb, beta_coeff, beta_coeff)
    mix = jax.lax.stop_gradient(r * feats[p1] + (1.0 - r) * feats[p2]) * ok[:, None]
    labels = jnp.where(ok, unknown_label, -1).astype(jnp.int32)
    return mix, labels, ok


def mix_unsup_centroid(rng, feats, valid, unknown_label: int):
    """Average random feature triples; targets are the unknown slot."""
    n = feats.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    p1 = jax.random.permutation(k1, n)
    p2 = jax.random.permutation(k2, n)
    p3 = jax.random.permutation(k3, n)
    ok = valid[p1] & valid[p2] & valid[p3]
    mix = jax.lax.stop_gradient(
        (feats[p1] + feats[p2] + feats[p3]) / 3.0
    ) * ok[:, None]
    labels = jnp.where(ok, unknown_label, -1).astype(jnp.int32)
    return mix, labels, ok
