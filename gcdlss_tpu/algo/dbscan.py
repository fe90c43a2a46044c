"""Density-based clustering ablation hooks (host-side).

The reference imports `sklearn.cluster.DBSCAN` / `hdbscan` for
candidate-clustering ablations (`modules/exp.py:28-30`) — an alternative to
the cosine k-means of the discovery step. These run on the host at epoch
granularity (they are not on the jitted training path), so a numpy
implementation is appropriate; sklearn is used when importable, with a
first-party grid-bucketed fallback.
"""

from __future__ import annotations

import numpy as np


def dbscan(x: np.ndarray, eps: float = 0.5, min_samples: int = 5) -> np.ndarray:
    """Cluster rows of x; returns int labels, -1 = noise.

    Uses sklearn when available; otherwise a grid-bucket + BFS region-grow
    implementation with identical semantics (core points = >= min_samples
    within eps, clusters = connected core points plus their reachable
    border points).
    """
    try:
        from sklearn.cluster import DBSCAN

        return DBSCAN(eps=eps, min_samples=min_samples).fit(x).labels_
    except ImportError:  # pragma: no cover - sklearn present in CI image
        return _dbscan_np(x, eps, min_samples)


def _dbscan_np(x: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    n, d = x.shape
    cell = np.floor(x / eps).astype(np.int64)
    # bucket points by grid cell; candidate neighbors live in adjacent cells
    order = np.lexsort(cell.T[::-1])
    from collections import defaultdict

    buckets: dict = defaultdict(list)
    for i in range(n):
        buckets[tuple(cell[i])].append(i)

    from itertools import product

    shifts = list(product((-1, 0, 1), repeat=d))

    def neighbors(i):
        c = cell[i]
        cand = []
        for s in shifts:
            cand.extend(buckets.get(tuple(c + np.asarray(s)), ()))
        cand = np.asarray(cand)
        dist = np.linalg.norm(x[cand] - x[i], axis=1)
        return cand[dist <= eps]

    labels = np.full(n, -1, np.int64)
    visited = np.zeros(n, bool)
    cid = 0
    for i in range(n):
        if visited[i]:
            continue
        visited[i] = True
        nbrs = neighbors(i)
        if len(nbrs) < min_samples:
            continue
        labels[i] = cid
        frontier = [j for j in nbrs if j != i]
        while frontier:
            j = frontier.pop()
            if labels[j] == -1:
                labels[j] = cid
            if visited[j]:
                continue
            visited[j] = True
            nbrs_j = neighbors(j)
            if len(nbrs_j) >= min_samples:
                frontier.extend(k for k in nbrs_j if not visited[k])
        cid += 1
    return labels


def cluster_candidates_density(
    feats: np.ndarray,
    eps: float = 0.3,
    min_samples: int = 10,
    max_clusters: int | None = None,
):
    """DBSCAN over (l2-normalized) candidate features — the ablation
    counterpart of the discovery step's cosine k-means.

    Returns (labels [N] with -1 noise, centroids [C, D] l2-normalized,
    counts [C]). Clusters are ordered by descending size; with
    `max_clusters`, smaller clusters are merged into noise.
    """
    nrm = np.linalg.norm(feats, axis=1, keepdims=True)
    xn = feats / np.maximum(nrm, 1e-12)
    labels = dbscan(xn, eps=eps, min_samples=min_samples)
    uniq, counts = np.unique(labels[labels >= 0], return_counts=True)
    order = np.argsort(-counts)
    uniq, counts = uniq[order], counts[order]
    if max_clusters is not None and len(uniq) > max_clusters:
        drop = set(uniq[max_clusters:].tolist())
        labels = np.where(np.isin(labels, list(drop)), -1, labels)
        uniq, counts = uniq[:max_clusters], counts[:max_clusters]
    remap = {int(u): i for i, u in enumerate(uniq)}
    labels = np.asarray([remap.get(int(l), -1) for l in labels], np.int64)
    cents = np.zeros((len(uniq), feats.shape[1]), np.float64)
    for i in range(len(uniq)):
        m = labels == i
        c = xn[m].mean(axis=0)
        cents[i] = c / max(np.linalg.norm(c), 1e-12)
    return labels, cents, counts
