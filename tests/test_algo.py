import numpy as np
import jax
import jax.numpy as jnp

from gcdlss_tpu.algo.kmeans import cosine_kmeans
from gcdlss_tpu.algo.hungarian_jax import hungarian_small
from gcdlss_tpu.algo.queue import queue_init, queue_push, queue_flatten
from gcdlss_tpu.algo.sinkhorn import (
    sinkhorn_knopp,
    semi_sinkhorn_knopp,
    balanced_sinkhorn,
)
from gcdlss_tpu.algo.clustering import OnlineSemiKMeans, pairwise_distance


def test_cosine_kmeans_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.05, (40, 8)) + np.eye(8)[0]
    b = rng.normal(0, 0.05, (40, 8)) + np.eye(8)[3]
    feats = np.vstack([a, b]).astype(np.float32)
    valid = np.ones(80, bool)
    valid[70:] = False
    assign, cents = cosine_kmeans(
        jnp.asarray(feats), jnp.asarray(valid), 2, jax.random.PRNGKey(0), iters=10
    )
    assign = np.asarray(assign)
    assert np.all(assign[:40][valid[:40]] == assign[0])
    assert np.all(assign[40:70] == assign[40])
    assert assign[0] != assign[40]
    assert np.all(assign[70:] == -1)


def test_hungarian_small_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(1)
    for k in (2, 3, 4):
        cost = rng.integers(0, 100, (k, k)).astype(np.float32)
        row_of_col = np.asarray(hungarian_small(jnp.asarray(cost), maximize=True))
        r, c = linear_sum_assignment(cost.max() - cost)
        expected = np.empty(k, np.int64)
        expected[c] = r
        got = sum(cost[row_of_col[j], j] for j in range(k))
        best = sum(cost[expected[j], j] for j in range(k))
        assert got == best  # same optimal value (ties allowed)


def test_queue_fifo():
    q = queue_init(slots=3, per_slot=4, dim=2)
    for i in range(5):
        feats = jnp.full((6, 2), float(i))
        valid = jnp.asarray([True, True, True, False, False, False])
        q = queue_push(q, feats, valid)
    flat, valid = queue_flatten(q)
    vals = np.asarray(flat)[np.asarray(valid)][:, 0]
    # slots hold pushes 2,3,4 (oldest evicted), 3 valid rows each
    assert sorted(set(vals.tolist())) == [2.0, 3.0, 4.0]
    assert len(vals) == 9


def test_sinkhorn_knopp_assignment_properties():
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(32, 16)).astype(np.float32)
    head = rng.normal(size=(16, 4)).astype(np.float32)
    q = np.asarray(sinkhorn_knopp(jnp.asarray(feats), jnp.asarray(head)))
    assert q.shape == (32, 4)
    np.testing.assert_allclose(q.sum(axis=1), 1.0, atol=1e-3)
    # queue rows participate but are not returned
    queue = rng.normal(size=(8, 16)).astype(np.float32)
    q2 = sinkhorn_knopp(
        jnp.asarray(feats), jnp.asarray(head),
        valid=jnp.ones(32, bool), queue=jnp.asarray(queue),
        queue_valid=jnp.ones(8, bool),
    )
    assert q2.shape == (32, 4)


def test_semi_sinkhorn_runs():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(24, 5)).astype(np.float32))
    plan, loss, kl = semi_sinkhorn_knopp(logits, num_iters=50)
    assert np.isfinite(float(loss)) and np.isfinite(float(kl))
    np.testing.assert_allclose(np.asarray(plan).sum(), 24.0, rtol=0.2)


def test_balanced_sinkhorn_vs_torch_oracle():
    """`Balanced_sinkhorn` (`utils/sinkhorn_knopp.py:55-79`): the inner
    SGD-on-marginal loop (momentum .99, grad-clip 1, KL-to-uniform reg)
    must match an independent torch-autograd implementation of the same
    formula, and the learned marginal must tilt toward the data's true
    cluster imbalance."""
    import math

    import torch

    rng = np.random.default_rng(11)
    # imbalanced clusters: 24 points near prototype 0, 8 near prototype 2
    head = rng.normal(size=(16, 3)).astype(np.float32)
    hn = head / np.linalg.norm(head, axis=0, keepdims=True)
    feats = np.vstack([
        hn[:, 0] + rng.normal(0, 0.05, (24, 16)),
        hn[:, 2] + rng.normal(0, 0.05, (8, 16)),
    ]).astype(np.float32)

    q, marg = balanced_sinkhorn(jnp.asarray(feats), jnp.asarray(head))
    q, marg = np.asarray(q), np.asarray(marg)
    np.testing.assert_allclose(q.sum(axis=1), 1.0, atol=1e-3)
    # marginal learned away from uniform, toward the 3:1 imbalance
    assert marg[0] > 1 / 3 > marg[1]

    # torch oracle: same math, autograd through the sinkhorn iteration
    tf = torch.tensor(feats)
    th = torch.tensor(head)
    z = torch.nn.functional.normalize(tf, dim=1)
    c = th / th.norm(dim=0, keepdim=True).clamp_min(1e-8)
    preds = z @ c
    B, K = feats.shape[0], 3
    w = torch.full((K,), 1.0 / K, requires_grad=True)
    vel = torch.zeros(K)
    q_ref = None
    for _ in range(10):
        logq = preds / 0.05
        for _ in range(3):
            logq = logq - torch.logsumexp(logq, 0, keepdim=True)
            logq = logq + torch.log_softmax(w, 0)[None, :]
            logq = logq - torch.logsumexp(logq, 1, keepdim=True)
            logq = logq - math.log(B)
        qt = torch.exp(logq) * B
        q_ref = qt.detach()
        loss = -(qt * preds).sum() / B
        t = 1.0 / K
        reg = (t * (math.log(t) - torch.log_softmax(w, 0))).sum() / K
        (g,) = torch.autograd.grad(loss + 5.0 * reg, w)
        gn = g.norm()
        if gn > 1:
            g = g / gn
        vel = 0.99 * vel + g
        w = (w - 0.1 * vel).detach().requires_grad_(True)
    np.testing.assert_allclose(q, q_ref.numpy(), atol=2e-3)
    np.testing.assert_allclose(
        marg, torch.softmax(w.detach(), 0).numpy(), atol=2e-3)


def test_online_semi_kmeans_fit_mix():
    rng = np.random.default_rng(4)
    l_feats = np.vstack(
        [rng.normal(i * 4, 0.1, (20, 3)) for i in range(2)]
    ).astype(np.float32)
    l_targets = np.repeat([0, 1], 20)
    u_feats = np.vstack(
        [rng.normal(i * 4, 0.1, (15, 3)) for i in (0, 1, 3)]
    ).astype(np.float32)
    km = OnlineSemiKMeans(k=3, max_iterations=20, n_init=2)
    labels = km.fit_mix(u_feats, l_feats, l_targets)
    u_labels = labels[40:]
    # unlabeled points near labeled class 0/1 join those clusters; the novel
    # blob gets the extra cluster
    assert u_labels[0] == 0 and u_labels[15] == 1
    assert u_labels[30] == 2


def test_dbscan_fallback_matches_sklearn():
    import numpy as np
    from gcdlss_tpu.algo.dbscan import _dbscan_np, dbscan, cluster_candidates_density

    rng = np.random.default_rng(0)
    blobs = np.concatenate([
        rng.normal([0, 0], 0.05, (40, 2)),
        rng.normal([2, 2], 0.05, (30, 2)),
        rng.uniform(-4, 6, (6, 2)),  # sparse noise
    ])
    ours = _dbscan_np(blobs, eps=0.3, min_samples=5)
    ref = dbscan(blobs, eps=0.3, min_samples=5)  # sklearn in this image
    # same partition up to label permutation
    for lab in (ours, ref):
        assert len(set(lab[lab >= 0])) == 2
    core = ref >= 0
    np.testing.assert_array_equal(ours >= 0, core)
    # pairwise co-membership identical
    co_a = ours[core][:, None] == ours[core][None, :]
    co_b = ref[core][:, None] == ref[core][None, :]
    np.testing.assert_array_equal(co_a, co_b)

    feats = np.concatenate([
        rng.normal([1, 0, 0], 0.01, (50, 3)),
        rng.normal([0, 1, 0], 0.01, (20, 3)),
    ])
    labels, cents, counts = cluster_candidates_density(feats, eps=0.2, min_samples=5)
    assert cents.shape[0] == 2 and counts[0] >= counts[1]
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, rtol=1e-6)


def test_dataset_factory_presets(tmp_path):
    import numpy as np
    from gcdlss_tpu.data import write_synthetic_kitti
    from gcdlss_tpu.data.semantic_kitti import get_dataset

    root = str(tmp_path / "kitti")
    write_synthetic_kitti(root, scans_per_seq=4, num_points=300)
    mk_lab = get_dataset("SemanticKITTI", "labeled")
    mk_unl = get_dataset("SemanticKITTI", "unlabeled")
    idx = np.array([0, 2])
    ds_l = mk_lab(root, "train", split_indices=idx, downsampling=300)
    ds_u = mk_unl(root, "train", split_indices=idx, downsampling=300)
    assert len(ds_l) == 2 and len(ds_u) == 2
    assert set(ds_l.scan_files).isdisjoint(ds_u.scan_files)
    ft = get_dataset("SemanticKITTI", "finetuning")(root, "train", downsampling=300)
    assert ft.resize_aug
    toy = get_dataset("SemanticKITTI", "toy")(root, "train", percentage=50,
                                              downsampling=300)
    assert len(toy) == 2
    import pytest
    with pytest.raises(NameError):
        get_dataset("SemanticKITTI", "nope")
