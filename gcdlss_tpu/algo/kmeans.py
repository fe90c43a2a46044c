"""jit-compiled masked k-means (cosine / euclidean) over padded feature sets.

TPU-native replacement for `fast_pytorch_kmeans.KMeans(mode='cosine')` used in
the Stage-2 over-clustering (`modules/exp_merge_mean_teacher.py:2742,2948`).
Lloyd iterations are one [N, C] x [C, K] matmul (MXU) + masked one-hot
segment-mean per step; invalid rows are excluded by the mask. Centroid
sums/counts are `psum`-reducible across a data-parallel mesh by passing
`axis_name` (SURVEY §2.5: globally consistent clustering; in jit-with-sharding
the global view handles this automatically).

Initialization: the first K valid rows (deterministic given a pre-shuffled
candidate set); pass `init_idx` for explicit seeding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _normalize(x, eps=1e-8):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _select_init(feats, valid, k, rng_key):
    """Pick K initial centroids from valid rows (random without replacement)."""
    n = feats.shape[0]
    scores = jax.random.uniform(rng_key, (n,)) + (~valid) * 1e6
    _, idx = jax.lax.top_k(-scores, k)
    return feats[idx]


@partial(jax.jit, static_argnames=("k", "iters", "cosine"))
def _kmeans(feats, valid, rng_key, k: int, iters: int, cosine: bool):
    x = _normalize(feats) if cosine else feats
    x = x * valid[:, None]
    cents = _select_init(x, valid, k, rng_key)

    def step(cents, _):
        c = _normalize(cents) if cosine else cents
        sim = x @ c.T  # [N, K]
        if not cosine:
            sim = 2 * sim - jnp.sum(c * c, axis=-1)[None, :]
        assign = jnp.argmax(sim, axis=-1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype) * valid[:, None]
        sums = onehot.T @ x  # [K, C]
        counts = jnp.sum(onehot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cents)
        return new, None

    cents, _ = jax.lax.scan(step, cents, None, length=iters)
    c = _normalize(cents) if cosine else cents
    sim = x @ c.T
    if not cosine:
        sim = 2 * sim - jnp.sum(c * c, axis=-1)[None, :]
    assign = jnp.where(valid, jnp.argmax(sim, axis=-1), -1)
    return assign.astype(jnp.int32), cents


def cosine_kmeans(feats, valid, k: int, rng_key, iters: int = 20):
    """Returns (assignments [N] int32 (-1 invalid), centroids [K, C]).

    Centroids are means of the *normalized* member vectors (matching
    fast_pytorch_kmeans cosine mode, whose centroids live near the sphere).
    """
    return _kmeans(feats, valid, rng_key, k, iters, True)


def euclidean_kmeans(feats, valid, k: int, rng_key, iters: int = 20):
    return _kmeans(feats, valid, rng_key, k, iters, False)
