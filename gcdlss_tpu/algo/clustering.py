"""Semi-supervised clustering library (jax).

Rebuild of `utils/clustering.py`:
  * `pairwise_distance` — batched squared euclidean distances;
  * `OnlineSemiKMeans` — semi-supervised k-means with labeled-centroid
    anchoring and k-means++ init (`clustering.py:93-411`), used by the offline
    full-validation clustering evaluation (BASELINE config #5);
  * `SemiSupervisedStreamKM` — coreset streaming k-means (`:9-53`).

Core iterations are jit-compiled; orchestration (restarts, tolerance checks)
stays in python on host-sized arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_distance(a, b):
    """Squared euclidean distances [N, M] (one fused matmul on MXU)."""
    a2 = jnp.sum(jnp.square(a), axis=-1, keepdims=True)
    b2 = jnp.sum(jnp.square(b), axis=-1)
    return a2 - 2.0 * (a @ b.T) + b2[None, :]


def kmeans_pp_init(rng_key, x, valid, k: int, pre_centers=None):
    """k-means++ seeding; optionally anchored on pre-existing centers."""
    n = x.shape[0]
    n_pre = 0 if pre_centers is None else pre_centers.shape[0]
    centers = jnp.zeros((k, x.shape[1]), x.dtype)
    if n_pre:
        centers = centers.at[:n_pre].set(pre_centers)
        d = jnp.min(pairwise_distance(x, pre_centers), axis=1)
    else:
        rng_key, k0 = jax.random.split(rng_key)
        p0 = valid / jnp.maximum(jnp.sum(valid), 1)
        i0 = jax.random.choice(k0, n, p=p0)
        centers = centers.at[0].set(x[i0])
        d = pairwise_distance(x, centers[0:1])[:, 0]
        n_pre = 1
    d = jnp.where(valid, d, 0.0)
    for i in range(n_pre, k):
        rng_key, ki = jax.random.split(rng_key)
        p = d / jnp.maximum(jnp.sum(d), 1e-12)
        idx = jax.random.choice(ki, n, p=p)
        centers = centers.at[i].set(x[idx])
        d = jnp.minimum(d, pairwise_distance(x, centers[i : i + 1])[:, 0])
        d = jnp.where(valid, d, 0.0)
    return centers


@partial(jax.jit, static_argnames=("k", "iters", "n_labeled_clusters"))
def _semi_lloyd(x, valid, l_feats, l_valid, l_targets, centers, k: int,
                iters: int, n_labeled_clusters: int):
    """Lloyd iterations where the first `n_labeled_clusters` centroids are
    re-anchored each step to the labeled-class means mixed with assigned
    unlabeled points (the `fit_mix_once` update rule)."""

    # labeled per-class means (fixed)
    lv = l_valid[:, None].astype(x.dtype)
    onehot_l = jax.nn.one_hot(jnp.clip(l_targets, 0, n_labeled_clusters - 1),
                              n_labeled_clusters, dtype=x.dtype) * lv
    l_sums = onehot_l.T @ l_feats
    l_cnts = jnp.sum(onehot_l, axis=0)[:, None]

    def step(centers, _):
        d = pairwise_distance(x, centers)
        assign = jnp.argmax(-d, axis=-1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype) * valid[:, None]
        sums = onehot.T @ x
        cnts = jnp.sum(onehot, axis=0)[:, None]
        # labeled clusters mix labeled + assigned-unlabeled mass
        sums = sums.at[:n_labeled_clusters].add(l_sums)
        cnts = cnts.at[:n_labeled_clusters].add(l_cnts)
        new = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    assign = jnp.argmax(-pairwise_distance(x, centers), axis=-1)
    inertia = jnp.sum(
        jnp.min(pairwise_distance(x, centers), axis=-1) * valid
    )
    return centers, jnp.where(valid, assign, -1), inertia


class OnlineSemiKMeans:
    """Semi-supervised k-means: labeled features anchor the first L centroids."""

    def __init__(self, k: int = 3, max_iterations: int = 100, n_init: int = 3,
                 seed: int = 0):
        self.k = k
        self.max_iterations = max_iterations
        self.n_init = n_init
        self.seed = seed
        self.cluster_centers_ = None
        self.labels_ = None

    def fit(self, x: np.ndarray):
        x = jnp.asarray(x)
        valid = jnp.ones((x.shape[0],), bool)
        best = None
        for i in range(self.n_init):
            key = jax.random.PRNGKey(self.seed + i)
            centers = kmeans_pp_init(key, x, valid.astype(x.dtype), self.k)
            centers, labels, inertia = _semi_lloyd(
                x, valid, x[:1] * 0, jnp.zeros((1,), bool), jnp.zeros((1,), jnp.int32),
                centers, self.k, self.max_iterations, 0,
            )
            if best is None or float(inertia) < best[0]:
                best = (float(inertia), centers, labels)
        self.cluster_centers_ = np.asarray(best[1])
        self.labels_ = np.asarray(best[2])
        return self

    def fit_mix(self, u_feats: np.ndarray, l_feats: np.ndarray,
                l_targets: np.ndarray, cluster_center=None, center_only=False):
        """Cluster unlabeled features with labeled-class-anchored centroids.

        Returns all-point labels ordered [labeled, unlabeled] like the
        reference's `fit_mix`.
        """
        u = jnp.asarray(u_feats)
        l = jnp.asarray(l_feats)
        lt = jnp.asarray(l_targets, jnp.int32)
        n_lab = int(jnp.max(lt)) + 1 if l_targets.size else 0
        uvalid = jnp.ones((u.shape[0],), bool)
        lvalid = jnp.ones((l.shape[0],), bool)
        # labeled class means as anchors
        onehot = jax.nn.one_hot(lt, n_lab)
        anchors = (onehot.T @ l) / jnp.maximum(
            jnp.sum(onehot, axis=0)[:, None], 1.0
        )
        best = None
        for i in range(self.n_init):
            key = jax.random.PRNGKey(self.seed + i)
            if cluster_center is not None:
                centers = jnp.asarray(cluster_center)
            else:
                centers = kmeans_pp_init(
                    key, u, uvalid.astype(u.dtype), self.k, pre_centers=anchors
                )
            centers, ulabels, inertia = _semi_lloyd(
                u, uvalid, l, lvalid, lt, centers, self.k,
                self.max_iterations, n_lab,
            )
            if best is None or float(inertia) < best[0]:
                best = (float(inertia), centers, ulabels)
        self.cluster_centers_ = np.asarray(best[1])
        u_labels = np.asarray(best[2])
        if center_only:
            return self.cluster_centers_
        l_labels = np.asarray(
            jnp.argmax(-pairwise_distance(l, jnp.asarray(best[1])), axis=-1)
        )
        self.labels_ = np.concatenate([l_labels, u_labels])
        return self.labels_


class SemiSupervisedStreamKM:
    """Streaming coreset k-means: labeled batches contribute class means,
    unlabeled batches contribute mini-batch k-means centers."""

    def __init__(self, num_clusters: int, coreset_size: int = 1000,
                 batch_size: int = 100, seed: int = 0):
        self.num_clusters = num_clusters
        self.coreset_size = coreset_size
        self.batch_size = batch_size
        self.coreset: list = []
        self.seed = seed
        self._calls = 0

    def add_to_coreset(self, centers: np.ndarray):
        for c in np.atleast_2d(centers):
            self.coreset.append(c)
        if len(self.coreset) > self.coreset_size:
            self.coreset = self.coreset[-self.coreset_size :]

    def partial_fit(self, new_data: np.ndarray, labels: np.ndarray | None = None):
        if labels is not None:
            for c in np.unique(labels):
                self.add_to_coreset(new_data[labels == c].mean(axis=0))
        else:
            from .kmeans import euclidean_kmeans

            self._calls += 1
            k = min(self.batch_size, max(1, new_data.shape[0] // 2))
            _, cents = euclidean_kmeans(
                jnp.asarray(new_data),
                jnp.ones((new_data.shape[0],), bool),
                k,
                jax.random.PRNGKey(self.seed + self._calls),
            )
            self.add_to_coreset(np.asarray(cents))

    def get_cluster_centers(self):
        from .kmeans import euclidean_kmeans

        data = np.stack(self.coreset)
        _, cents = euclidean_kmeans(
            jnp.asarray(data), jnp.ones((data.shape[0],), bool),
            self.num_clusters, jax.random.PRNGKey(self.seed),
        )
        return np.asarray(cents)
