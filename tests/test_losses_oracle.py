"""Torch oracle for the Stage-2 discovery objectives.

Independent pure-torch implementations of the reference's loss math
(`/root/reference/modules/exp_merge_mean_teacher.py:2827-3057`): supervised
CE, mean-teacher MSE on probabilities, calibration CE (GT logit -> -1e9,
target = unknown slot), the learnable-threshold hinge pair, and the three
novel-CE assemblies (cluster CE over [known[:-1] | final3], sup novel CE,
NCC unsup CE over [known[:-1] | max(final2)]) — asserted against the JAX
losses (`gcdlss_tpu/losses.py`) and the exact concatenation/masking used by
`train/discover.py`'s loss_fn on a fixed tiny batch. This is the strongest
Stage-2 parity evidence available offline (no real data / checkpoints on
this rig): the torch side uses torch's own CrossEntropyLoss/mse_loss
reductions, ignore_index handling, and softmax, so any divergence in
masking or normalization conventions fails the test.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from gcdlss_tpu.losses import (
    cross_entropy,
    calibration_loss,
    mse_prob_loss,
    adaptive_threshold_loss,
)

K = 7          # num_labeled_classes
UNK = 7        # unknown slot id (= K)
KU = 3         # num_unlabeled (novel) classes
NCC = 3        # ncc head width
FDIM = 16
NSUP, NUNSUP = 24, 16
N = NSUP + NUNSUP
CAND = 8
ATOL = 1e-5


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(42)
    dummy_s = rng.normal(size=(N, K + 1)).astype(np.float32)  # [final|maxNCC]
    dummy_t = rng.normal(size=(N, K + 1)).astype(np.float32)
    feats_s = rng.normal(size=(N, FDIM)).astype(np.float32)
    # sup labels 0..K with some ignores; synthetic unknowns carry label K
    labels = rng.integers(0, K + 1, N).astype(np.int32)
    labels[[3, 17]] = -1
    sup_mask = np.zeros(N, bool)
    sup_mask[:NSUP] = True
    valid = np.ones(N, bool)
    valid[[5, 30]] = False
    tau = np.float32(0.3)
    w2 = rng.normal(size=(FDIM, NCC)).astype(np.float32)
    b2 = rng.normal(size=(NCC,)).astype(np.float32)
    w3 = rng.normal(size=(FDIM, KU)).astype(np.float32)
    b3 = rng.normal(size=(KU,)).astype(np.float32)
    cand_rows = np.array([24, 26, 29, 31, 33, 35, 36, 39], np.int32)
    cand_feats = feats_s[cand_rows] + rng.normal(
        0, 0.1, (CAND, FDIM)).astype(np.float32)
    rel_mask = np.array([1, 1, 0, 1, 1, 1, 0, 1], bool)
    mapped_novel = rng.integers(K, K + KU, CAND).astype(np.int32)
    return dict(dummy_s=dummy_s, dummy_t=dummy_t, feats_s=feats_s,
                labels=labels, sup_mask=sup_mask, valid=valid, tau=tau,
                w2=w2, b2=b2, w3=w3, b3=b3, cand_rows=cand_rows,
                cand_feats=cand_feats, rel_mask=rel_mask,
                mapped_novel=mapped_novel)


def _ce_torch(logits, labels):
    return F.cross_entropy(torch.tensor(logits),
                           torch.tensor(labels, dtype=torch.long),
                           ignore_index=-1).item()


def test_sup_ce_oracle(batch):
    """`mix_seg_loss = criterion(logits_sup_s, labels)` (`:2827-2828`)."""
    b = batch
    sup_targets = np.where(b["sup_mask"] & b["valid"], b["labels"], -1)
    want = _ce_torch(b["dummy_s"], sup_targets)
    got = float(cross_entropy(jnp.asarray(b["dummy_s"]),
                              jnp.asarray(np.where(b["sup_mask"], b["labels"], -1)),
                              jnp.asarray(b["valid"])))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_mse_oracle(batch):
    """`mse_loss = F.mse_loss(softmax_s, softmax_t) * 200` (`:2833-2839`)."""
    b = batch
    unsup = ~b["sup_mask"]
    ps = torch.softmax(torch.tensor(b["dummy_s"][unsup]), dim=1)
    pt = torch.softmax(torch.tensor(b["dummy_t"][unsup]), dim=1)
    want = (F.mse_loss(ps, pt) * 200.0).item()
    probs_s = jnp.asarray(
        torch.softmax(torch.tensor(b["dummy_s"]), dim=1).numpy())
    probs_t = jnp.asarray(
        torch.softmax(torch.tensor(b["dummy_t"]), dim=1).numpy())
    got = float(200.0 * mse_prob_loss(probs_s, probs_t, jnp.asarray(unsup)))
    np.testing.assert_allclose(got, want, atol=ATOL * 200)


def test_calibration_oracle(batch):
    """GT logit -> -1e9, target = unknown slot, GT==unknown -> ignore
    (`:2879-2895`)."""
    b = batch
    sup_targets = np.where(b["sup_mask"] & b["valid"], b["labels"], -1)
    logits = torch.tensor(b["dummy_s"]).clone()
    labels_dummy = np.full(N, UNK, np.int64)
    for i, t in enumerate(sup_targets):
        if t < 0:
            labels_dummy[i] = -1
        else:
            logits[i, t] = -1e9
            if t == UNK:
                labels_dummy[i] = -1
    want = F.cross_entropy(logits, torch.tensor(labels_dummy),
                           ignore_index=-1).item()
    got = float(calibration_loss(
        jnp.asarray(b["dummy_s"]),
        jnp.asarray(np.where(b["sup_mask"], b["labels"], -1)),
        UNK, jnp.asarray(b["valid"])))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_threshold_hinge_oracle(batch):
    """hinge(known ncc - tau) + hinge(tau - unknown ncc), each a mean over
    its own set (`:2901-2918`)."""
    b = batch
    sup_targets = np.where(b["sup_mask"] & b["valid"], b["labels"], -1)
    ncc = torch.tensor(b["dummy_s"][:, -1])
    known = torch.tensor((sup_targets >= 0) & (sup_targets != UNK))
    unknown = torch.tensor(sup_targets == UNK)
    want = 0.0
    if known.sum() > 0:
        want += torch.relu(ncc[known] - b["tau"]).mean().item()
    if unknown.sum() > 0:
        want += torch.relu(torch.tensor(b["tau"]) - ncc[unknown]).mean().item()
    got = float(adaptive_threshold_loss(
        jnp.asarray(b["dummy_s"][:, -1]),
        jnp.asarray(np.where(b["sup_mask"], b["labels"], -1)),
        UNK, jnp.asarray(b["tau"]), jnp.asarray(b["valid"])))
    np.testing.assert_allclose(got, want, atol=ATOL)
    # empty-set behavior: no unknowns -> only the known hinge term
    no_unk = np.where(sup_targets == UNK, 0, sup_targets)
    got2 = float(adaptive_threshold_loss(
        jnp.asarray(b["dummy_s"][:, -1]), jnp.asarray(no_unk), UNK,
        jnp.asarray(b["tau"])))
    want2 = torch.relu(
        ncc[torch.tensor(no_unk >= 0)] - b["tau"]).mean().item()
    np.testing.assert_allclose(got2, want2, atol=ATOL)


def test_novel_cluster_ce_oracle(batch):
    """`novel_unsup_loss = 0.1 * CE(cat[known[:-1] | final3(cand)],
    hungarian-mapped labels + K)` with use_sup_logit (`:3023-3031`)."""
    b = batch
    cand_known = b["dummy_s"][b["cand_rows"]][:, :-1]           # [CAND, K]
    nov = b["cand_feats"] @ b["w3"] + b["b3"]                   # [CAND, KU]
    cat = np.concatenate([cand_known, nov], axis=1)
    labels = np.where(b["rel_mask"], b["mapped_novel"], -1)
    want = 0.1 * _ce_torch(cat, labels)
    got = float(0.1 * cross_entropy(
        jnp.concatenate([jnp.asarray(cand_known), jnp.asarray(nov)], axis=-1),
        jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_sup_novel_ce_oracle(batch):
    """`novel_sup_loss = 1 * CE(cat[logits_sup[:-1] | final3(feats_sup)],
    sup labels)` — label K (synthetic unknown) lands on novel col 0
    (`:3033-3041`)."""
    b = batch
    nov = b["feats_s"] @ b["w3"] + b["b3"]
    cat = np.concatenate([b["dummy_s"][:, :-1], nov], axis=1)
    sup_targets = np.where(b["sup_mask"] & b["valid"], b["labels"], -1)
    want = _ce_torch(cat, sup_targets)
    got = float(cross_entropy(
        jnp.asarray(cat),
        jnp.asarray(np.where(b["sup_mask"], b["labels"], -1)),
        jnp.asarray(b["valid"])))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_ncc_unsup_ce_oracle(batch):
    """`ncc_unsup_loss = 0.1 * CE(cat[known[:-1] | max(final2(cand))],
    unknown_label)` (`:3043-3057`)."""
    b = batch
    cand_known = b["dummy_s"][b["cand_rows"]][:, :-1]
    ncc = (b["cand_feats"] @ b["w2"] + b["b2"]).max(axis=1, keepdims=True)
    cat = np.concatenate([cand_known, ncc], axis=1)
    labels = np.where(b["rel_mask"], UNK, -1)
    want = 0.1 * _ce_torch(cat, labels)
    got = float(0.1 * cross_entropy(jnp.asarray(cat), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_eight_loss_sum_oracle(batch):
    """The full 8-term sum with reference coefficients (KITTI defaults:
    calib .05, thr .2, mse 200, lasermix .1 — `exp_merge_mean_teacher.py:
    1454-1488,2744-2748`) matches torch term-by-term when assembled the way
    `train/discover.py:loss_fn` assembles it."""
    b = batch
    sup_targets_np = np.where(b["sup_mask"] & b["valid"], b["labels"], -1)
    unsup = ~b["sup_mask"]

    # ---- torch side ----
    t_sup = _ce_torch(b["dummy_s"], sup_targets_np)
    ps = torch.softmax(torch.tensor(b["dummy_s"][unsup]), 1)
    pt = torch.softmax(torch.tensor(b["dummy_t"][unsup]), 1)
    t_mse = (200.0 * F.mse_loss(ps, pt)).item()
    logits = torch.tensor(b["dummy_s"]).clone()
    labels_dummy = np.full(N, UNK, np.int64)
    for i, t in enumerate(sup_targets_np):
        if t < 0 or t == UNK:
            labels_dummy[i] = -1
        if t >= 0:
            logits[i, t] = -1e9
    t_cal = 0.05 * F.cross_entropy(
        logits, torch.tensor(labels_dummy), ignore_index=-1).item()
    ncc_col = torch.tensor(b["dummy_s"][:, -1])
    known = torch.tensor((sup_targets_np >= 0) & (sup_targets_np != UNK))
    unknown = torch.tensor(sup_targets_np == UNK)
    t_thr = 0.2 * (
        torch.relu(ncc_col[known] - b["tau"]).mean()
        + torch.relu(torch.tensor(b["tau"]) - ncc_col[unknown]).mean()
    ).item()
    cand_known = b["dummy_s"][b["cand_rows"]][:, :-1]
    nov_c = b["cand_feats"] @ b["w3"] + b["b3"]
    t_nov_unsup = 0.1 * _ce_torch(
        np.concatenate([cand_known, nov_c], 1),
        np.where(b["rel_mask"], b["mapped_novel"], -1))
    nov_s = b["feats_s"] @ b["w3"] + b["b3"]
    t_nov_sup = _ce_torch(
        np.concatenate([b["dummy_s"][:, :-1], nov_s], 1), sup_targets_np)
    ncc_c = (b["cand_feats"] @ b["w2"] + b["b2"]).max(1, keepdims=True)
    t_ncc = 0.1 * _ce_torch(
        np.concatenate([cand_known, ncc_c], 1),
        np.where(b["rel_mask"], UNK, -1))
    torch_total = t_sup + t_mse + t_cal + t_thr + t_nov_unsup + t_nov_sup + t_ncc

    # ---- jax side (losses.py + the discover.py assembly) ----
    ds = jnp.asarray(b["dummy_s"])
    labels_j = jnp.asarray(np.where(b["sup_mask"], b["labels"], -1))
    valid_j = jnp.asarray(b["valid"])
    j_sup = cross_entropy(ds, labels_j, valid_j)
    probs_s = jnp.asarray(torch.softmax(torch.tensor(b["dummy_s"]), 1).numpy())
    probs_t = jnp.asarray(torch.softmax(torch.tensor(b["dummy_t"]), 1).numpy())
    j_mse = 200.0 * mse_prob_loss(probs_s, probs_t, jnp.asarray(unsup))
    j_cal = 0.05 * calibration_loss(ds, labels_j, UNK, valid_j)
    j_thr = 0.2 * adaptive_threshold_loss(
        ds[:, -1], labels_j, UNK, jnp.asarray(b["tau"]), valid_j)
    j_nov_unsup = 0.1 * cross_entropy(
        jnp.asarray(np.concatenate([cand_known, nov_c], 1)),
        jnp.asarray(np.where(b["rel_mask"], b["mapped_novel"], -1)))
    j_nov_sup = cross_entropy(
        jnp.asarray(np.concatenate([b["dummy_s"][:, :-1], nov_s], 1)),
        labels_j, valid_j)
    j_ncc = 0.1 * cross_entropy(
        jnp.asarray(np.concatenate([cand_known, ncc_c], 1)),
        jnp.asarray(np.where(b["rel_mask"], UNK, -1)))
    jax_total = float(j_sup + j_mse + j_cal + j_thr + j_nov_unsup
                      + j_nov_sup + j_ncc)

    for name, tj, tt in [
        ("sup", j_sup, t_sup), ("mse", j_mse, t_mse), ("cal", j_cal, t_cal),
        ("thr", j_thr, t_thr), ("nov_unsup", j_nov_unsup, t_nov_unsup),
        ("nov_sup", j_nov_sup, t_nov_sup), ("ncc", j_ncc, t_ncc),
    ]:
        np.testing.assert_allclose(float(tj), tt, atol=5e-5, err_msg=name)
    np.testing.assert_allclose(jax_total, torch_total, atol=2e-4)
