"""NOPS-style single-model discovery loops (no mean teacher).

TPU-native rebuilds of the reference's unexported discovery ablations:

  * ``ExpDiscover``          — `modules/exp.py:5050-5340`: one MinkUNetRC over
    the combined sup+unsup batch; sup CE + calibration; novel branch = fixed
    NCC-prob threshold 0.2 -> euclidean k-means (k = Ku+1) over candidates +
    queue -> drop the ONE cluster whose center is closest (summed L2) to the
    base-class prototypes -> Hungarian(novel-head argmax vs cluster id) ->
    novel CE (coeff 1); queue stores the MEAN reliable feature per step
    (20 slots, `exp.py:5035-5048,5320-5322`).
  * ``ExpMixDiscoverJoint``  — `modules/exp.py:4452-4600`: same, plus
    feature-mixing in the sup loss (`mix_features`), novel CE over the JOINT
    [base | novel] logits with labels shifted by K, coeff 0.002.
  * ``ExpMixDiscoverSwaV``   — `modules/exp.py:4680-4980`: two augmented
    views, per-view clustering, swapped-prediction CE on the novel head.
    The reference implementation is dead code (calls `self.swav_loss()` /
    `self.update_queue()` with no arguments and hits a `breakpoint()`,
    `exp.py:4952-4956`); this is a runnable realization of the documented
    intent: view-A cluster labels supervise view-B novel logits and vice
    versa (candidate sets intersected by voxel row).

All steps are single jitted functions with masked fixed-shape control flow;
the per-step Hungarian runs in-graph (`algo/hungarian_jax.py`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models.minkunet import MinkUNetRC, assemble_dummy_logits
from ..losses import cross_entropy, calibration_loss, soft_cross_entropy
from ..algo.kmeans import euclidean_kmeans
from ..algo.hungarian_jax import hungarian_small
from ..algo.queue import FeatureQueue, queue_init, queue_push
from ..eval.metrics import confusion_update
from ..ops.plan import build_unet_plan
from .common import make_sgd
from .schedule import make_lr_schedule
from .discover import _combine_batches
from .feature_mixing import mix_centroid_sup, mix_features, mix_unsup_centroid


@dataclass(frozen=True)
class NopsConfig:
    num_labeled_classes: int
    num_unlabeled_classes: int
    num_classes: int
    unknown_label: int
    voxel_caps: tuple
    sup_voxel_cap: int
    num_sup_scans: int
    arch: str = "MinkUNet34"
    planes: tuple = (32, 64, 128, 256, 256, 128, 96, 96)
    in_channels: int = 1
    dtype: str = "float32"
    remat: bool = False
    feat_dim: int = 96
    ncc_heads: int = 3
    # discovery knobs (`exp.py:5052-5054,3596-3614`)
    prob_threshold: float = 0.2
    cand_cap: int = 4096
    queue_slots: int = 20  # mean reliable feature per step
    kmeans_iters: int = 15
    calib_coeff: float = 0.05
    novel_coeff: float = 1.0  # 0.002 for Joint (`exp.py:4458`)
    # variant switches
    joint_logits: bool = False  # Joint: CE over [base|novel], labels += K
    use_mix_features: bool = False  # Joint: feature-mixing in the sup loss
    beta_coeff: float = 0.5
    # ExpMixDiscover switches (`exp.py:3587-3990`)
    mix_centroid: bool = False  # sup mixing = label-distinct triples -> unknown
    unsup_mix_coeff: float = 0.0  # pseudo-GT CE on non-candidates + mixed
    #                               unsup-as-unknown CE (0.1 in the reference)
    entropy_minimize: bool = False  # OpenMatch-style entropy terms
    id_entropy_coeff: float = 1.0
    ood_entropy_coeff: float = 1e-3
    # optimizer
    lr: float = 1e-2
    momentum: float = 0.9
    weight_decay: float = 1e-4
    use_scheduler: bool = True
    warmup_epochs: int = 4
    min_lr: float = 1e-5
    epochs: int = 50
    steps_per_epoch: int = 1000
    # shim so discover-style helpers work
    num_scans_total: int = 4


class NopsState(struct.PyTreeNode):
    params: dict
    batch_stats: dict
    opt_state: tuple
    queue: FeatureQueue
    step: jax.Array
    rng: jax.Array


def make_model(cfg: NopsConfig) -> MinkUNetRC:
    return MinkUNetRC(
        num_labeled=cfg.num_labeled_classes,
        num_novel=cfg.num_unlabeled_classes,
        ncc_heads=cfg.ncc_heads,
        arch=cfg.arch,
        planes=cfg.planes,
        dtype=jnp.dtype(cfg.dtype),
        remat=cfg.remat,
    )


def create_nops_state(
    rng: jax.Array, cfg: NopsConfig, pretrained_params: dict | None = None
) -> NopsState:
    model = make_model(cfg)
    cap0 = min(cfg.voxel_caps[0], 4096)
    caps = tuple(min(c, 4096) for c in cfg.voxel_caps)
    coords = np.zeros((cap0, 4), np.int32)
    coords[:, 1] = np.arange(cap0) % 101
    coords[:, 2] = np.arange(cap0) // 101
    tx = make_sgd(cfg, make_lr_schedule(cfg))
    rng, k1 = jax.random.split(rng)

    @jax.jit
    def _init(rng, k1, coords):
        plan = build_unet_plan(coords, jnp.ones((cap0,), bool), caps)
        feats = jnp.zeros((cap0, cfg.in_channels), jnp.float32)
        variables = model.init(k1, plan, feats, train=False)
        params = variables["params"]
        if pretrained_params is not None:
            params = dict(params)
            for key in ("encoder", "final", "final2"):
                if key in pretrained_params:
                    params[key] = pretrained_params[key]
        return NopsState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            queue=queue_init(cfg.queue_slots, 1, cfg.feat_dim),
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )

    return _init(rng, k1, jnp.asarray(coords))


def _novel_branch(cfg: NopsConfig, dummy, feats, unsup_mask, queue, params, k_kmeans):
    """Candidate mining -> euclidean k-means -> drop-closest-to-base ->
    compact relabel -> in-graph Hungarian. Returns everything the loss needs."""
    K = cfg.num_labeled_classes
    Ku = cfg.num_unlabeled_classes
    probs = jax.nn.softmax(dummy, axis=-1)
    cand_mask = (probs[:, -1] > cfg.prob_threshold) & unsup_mask
    n_cand = jnp.sum(cand_mask.astype(jnp.int32))
    cand_cap = min(cfg.cand_cap, dummy.shape[0])
    order = jnp.argsort(~cand_mask, stable=True)
    cand_rows = order[:cand_cap]
    cand_valid = jnp.arange(cand_cap) < jnp.minimum(n_cand, cand_cap)
    feats_sg = jax.lax.stop_gradient(feats)
    cand_feats = feats_sg[cand_rows] * cand_valid[:, None]

    # queue holds one mean-reliable vector per past step (`exp.py:5320-5322`)
    qfeats = queue.feats[:, 0, :]
    qvalid = queue.counts > 0
    all_feats = jnp.concatenate([cand_feats, qfeats], axis=0)
    all_valid = jnp.concatenate([cand_valid, qvalid], axis=0)
    n_all = jnp.sum(all_valid.astype(jnp.int32))

    nclu = Ku + 1
    assign_all, cents = euclidean_kmeans(
        all_feats, all_valid, nclu, k_kmeans, iters=cfg.kmeans_iters
    )
    # the UNRELIABLE cluster = argmin of summed L2 distance from its center to
    # the base prototypes (final kernel columns), `exp.py:5283-5293`
    base_protos = jax.lax.stop_gradient(params["final"]["kernel"]).T  # [K, C]
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum((cents[:, None, :] - base_protos[None, :, :]) ** 2, axis=-1),
            1e-12,
        )
    ).sum(axis=1)
    unreliable = jnp.argmin(d)
    assign = assign_all[:cand_cap]
    rel_mask = cand_valid & (assign != unreliable)
    n_rel = jnp.sum(rel_mask.astype(jnp.int32))
    has_novel = (n_all > (Ku + 1)) & (n_rel > 0)

    # compact relabel of surviving clusters to 0..M-1 (`exp.py:5300-5310`)
    present = jnp.zeros((nclu,), bool).at[
        jnp.where(rel_mask, assign, nclu - 1)
    ].max(rel_mask)
    new_id = jnp.cumsum(present.astype(jnp.int32)) - 1
    rel_labels = jnp.clip(new_id[jnp.clip(assign, 0, nclu - 1)], 0, Ku - 1)

    # per-step Hungarian: novel-head argmax vs cluster label (`exp.py:5312-5330`)
    # DIVERGENCE: the reference minimizes linear_sum_assignment over the raw
    # confusion (`exp.py:5320`) — i.e. it picks the permutation the heads
    # agree with LEAST — and then supervises with mapped argmax predictions
    # (self-distilling its own argmax). Both look like bugs; here the
    # assignment MAXIMIZES agreement and supervises with the mapped CLUSTER
    # labels, which is the standard deep-cluster alignment (and what the
    # Stage-2 module does, discover.py). Kept as an intentional fix.
    w3 = jax.lax.stop_gradient(params["final3"]["kernel"])
    b3 = jax.lax.stop_gradient(params["final3"]["bias"])
    novel_preds = jnp.argmax(cand_feats @ w3 + b3, axis=-1)
    cost = confusion_update(novel_preds, rel_labels, Ku, rel_mask)
    row_of_col = hungarian_small(cost.astype(jnp.float32), maximize=True)
    mapped_novel = row_of_col[rel_labels]
    return dict(
        cand_rows=cand_rows,
        cand_valid=cand_valid,
        cand_feats=cand_feats,
        rel_mask=rel_mask,
        mapped_novel=mapped_novel,
        has_novel=has_novel,
        n_cand=n_cand,
        n_rel=n_rel,
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def nops_train_step(state: NopsState, sup_vb: dict, unsup_vb: dict, cfg: NopsConfig):
    """One ExpDiscover / ExpMixDiscoverJoint step (`exp.py:5163-5330,4463-4600`)."""
    model = make_model(cfg)
    tx = make_sgd(cfg, make_lr_schedule(cfg))
    K = cfg.num_labeled_classes
    rng, k_kmeans, k_mix, k_umix = jax.random.split(state.rng, 4)

    coords, feats, mapped, valid = _combine_batches(sup_vb, unsup_vb, cfg)
    plan = build_unet_plan(coords, valid, cfg.voxel_caps, presorted=True)
    n_in = coords.shape[0]
    ok = plan.rep < n_in
    safe = jnp.where(ok, plan.rep, 0)
    feats0 = feats[safe] * ok[:, None].astype(feats.dtype)
    mapped0 = jnp.where(ok, mapped[safe], -1)
    valid0 = plan.levels[0].valid
    is_sup = ok & (plan.rep < cfg.sup_voxel_cap)
    sup_mask = is_sup & valid0
    unsup_mask = valid0 & ~is_sup

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            plan, feats0, train=True, mutable=["batch_stats"],
        )
        dummy = assemble_dummy_logits(out)  # [N, K+1]
        h = out["feats"]

        def _mix_dummy(mixf):
            # mixed feats through the raw final/final2 kernels -> [M, K+1]
            # dummy logits (`exp.py:3799-3805,4504-4518`)
            kin = mixf @ params["final"]["kernel"] + params["final"]["bias"]
            kout = (mixf @ params["final2"]["kernel"]
                    + params["final2"]["bias"])
            return jnp.concatenate(
                [kin, jnp.max(kout, axis=-1, keepdims=True)], axis=-1
            )

        sup_targets = jnp.where(sup_mask, mapped0, -1)
        l_sup = cross_entropy(dummy, sup_targets, valid0)
        mix_logits = None
        mix_labels = None
        if cfg.use_mix_features and cfg.mix_centroid:
            # ExpMixDiscover: label-distinct triples averaged and targeted
            # at the unknown slot (`exp.py:3793-3809` via `exp.py:1494-1517`)
            mixf, mix_labels, mixok = mix_centroid_sup(
                k_mix, h, sup_targets, sup_mask, cfg.unknown_label
            )
            mix_logits = _mix_dummy(mixf)
            l_sup = l_sup + cross_entropy(mix_logits, mix_labels, mixok)
        elif cfg.use_mix_features:
            # Joint prepends feature-mixed logits to the sup CE
            # (`exp.py:4504-4518`): soft two-hot targets over K+1 columns.
            mixf, mixp, mixok = mix_features(
                k_mix, h, sup_targets, sup_mask, K + 1, cfg.beta_coeff
            )
            mix_logits = _mix_dummy(mixf)
            l_sup = l_sup + soft_cross_entropy(mix_logits, mixp, mixok)

        l_cal = cfg.calib_coeff * calibration_loss(
            dummy, sup_targets, cfg.unknown_label, valid0
        )

        # ---- ExpMixDiscover unsup mixed seg loss (`exp.py:3848-3874`):
        # CE of non-candidate unsup rows against their own argmax pseudo-GT,
        # plus centroid-mixed unsup features targeted at the unknown slot,
        # both under one coefficient (0.1 in the reference).
        l_unsup_mix = 0.0
        # live softmax: the entropy terms differentiate through it
        # (`exp.py:3852,3940`); the argmax/threshold consumers carry no
        # gradient either way
        probs_uns = jax.nn.softmax(dummy, axis=-1)
        if cfg.unsup_mix_coeff > 0.0:
            cand = (probs_uns[:, -1] > cfg.prob_threshold) & unsup_mask
            pseudo = jnp.argmax(probs_uns, axis=-1)
            keep = unsup_mask & ~cand
            l_pseudo = cross_entropy(dummy, jnp.where(keep, pseudo, -1))
            mixuf, mixul, mixuok = mix_unsup_centroid(
                k_umix, h, unsup_mask, cfg.unknown_label
            )
            l_umixed = cross_entropy(_mix_dummy(mixuf), mixul, mixuok)
            l_unsup_mix = cfg.unsup_mix_coeff * (l_pseudo + l_umixed)

        # ---- OpenMatch-style entropy minimization (`exp.py:3826-3838`):
        # id term = -mean of sum(p[:, :-1] log p), ood term = SUM (not mean,
        # `exp.py:3832`: torch.sum reduces the row axis before torch.mean
        # sees a scalar) of p_last log p_last, over the [sup | mixed-sup]
        # rows.
        l_ent = 0.0
        if cfg.entropy_minimize:
            def ent_terms(lg, m):
                p = jax.nn.softmax(lg, axis=-1)
                mf = m.astype(jnp.float32)
                nrow = jnp.maximum(jnp.sum(mf), 1.0)
                plogp = p * jnp.log(p + 1e-8)
                ide = -jnp.sum(jnp.sum(plogp[:, :-1], axis=-1) * mf) / nrow
                ood = jnp.sum(plogp[:, -1] * mf)
                return ide, ood

            ide, ood = ent_terms(dummy, sup_mask)
            if mix_logits is not None:
                # reference entropy runs over the concatenated rows; the
                # masked split keeps the id term a per-population mean
                ide_m, ood_m = ent_terms(mix_logits, mix_labels >= 0)
                ide, ood = ide + ide_m, ood + ood_m
            l_ent = cfg.id_entropy_coeff * ide + cfg.ood_entropy_coeff * ood

        nb = _novel_branch(
            cfg, jax.lax.stop_gradient(dummy), h, unsup_mask,
            state.queue, jax.lax.stop_gradient(params), k_kmeans,
        )
        g = nb["has_novel"].astype(jnp.float32)
        nov_logits = (
            nb["cand_feats"] @ params["final3"]["kernel"]
            + params["final3"]["bias"]
        )
        targets = jnp.where(nb["rel_mask"], nb["mapped_novel"], -1)
        if cfg.joint_logits:
            # Joint: CE over [base | novel] with labels shifted by K
            # (`exp.py:4597-4600`)
            base_logits = (
                nb["cand_feats"] @ params["final"]["kernel"]
                + params["final"]["bias"]
            )
            cat = jnp.concatenate([base_logits, nov_logits], axis=-1)
            l_nov = cfg.novel_coeff * cross_entropy(
                cat, jnp.where(nb["rel_mask"], targets + K, -1)
            )
        else:
            l_nov = cfg.novel_coeff * cross_entropy(nov_logits, targets)

        # has_novel-gated unsup entropy terms: the reference computes them
        # (`exp.py:3940-3947`) but re-adds the SUP terms due to variable
        # shadowing (`loss += id_entropy_loss` names the sup-side local);
        # we apply the evident intent and add the unsup terms once.
        l_ent_u = 0.0
        if cfg.entropy_minimize:
            mf = unsup_mask.astype(jnp.float32)
            nrow = jnp.maximum(jnp.sum(mf), 1.0)
            plogp = probs_uns * jnp.log(probs_uns + 1e-8)
            ide_u = -jnp.sum(jnp.sum(plogp[:, :-1], axis=-1) * mf) / nrow
            ood_u = jnp.sum(plogp[:, -1] * mf)
            l_ent_u = g * (cfg.id_entropy_coeff * ide_u
                           + cfg.ood_entropy_coeff * ood_u)

        loss = l_sup + l_cal + g * l_nov + l_unsup_mix + l_ent + l_ent_u
        metrics = {
            "loss": loss,
            "sup_seg": l_sup,
            "calib": l_cal,
            "novel_unsup": g * l_nov,
            "unsup_mix": l_unsup_mix,
            "entropy": l_ent + l_ent_u,
            "n_cand": nb["n_cand"],
            "n_rel": nb["n_rel"],
            "has_novel": nb["has_novel"].astype(jnp.int32),
        }
        aux = (mut["batch_stats"], metrics, nb)
        return loss, aux

    (loss, (new_bs, metrics, nb)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

    # queue push: MEAN reliable feature (one row), gated by has_novel
    nrel = jnp.maximum(jnp.sum(nb["rel_mask"].astype(jnp.float32)), 1.0)
    mean_rel = jnp.sum(
        nb["cand_feats"] * nb["rel_mask"][:, None], axis=0, keepdims=True
    ) / nrel
    new_queue = queue_push(state.queue, mean_rel, jnp.ones((1,), bool))
    queue = jax.tree_util.tree_map(
        lambda new, old: jnp.where(nb["has_novel"], new, old),
        new_queue, state.queue,
    )

    return NopsState(
        params=params,
        batch_stats=new_bs,
        opt_state=opt_state,
        queue=queue,
        step=state.step + 1,
        rng=rng,
    ), metrics


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def swav_train_step(
    state: NopsState,
    sup_vb: dict,
    unsup_vb: dict,
    sup_vb2: dict,
    unsup_vb2: dict,
    cfg: NopsConfig,
):
    """ExpMixDiscoverSwaV: two augmented views, swapped novel supervision.

    Runnable realization of the broken reference loop (`exp.py:4763-4956`):
    both views contain the SAME scans under independent augmentation draws
    (the caller pairs the loaders; `swav_wrapper_ssl` calls `__getitem__`
    twice per index, `utils/dataset_remission.py:2572-2599`). Each view
    mines candidates and clusters them; candidates are then intersected
    across views by original-point identity — the fixed-shape equivalent of
    the reference's `torch.isin` over selected point indices
    (`exp.py:4997-5000`) — and view X's novel logits are supervised by the
    matched view-Y candidate's Hungarian-aligned cluster label.
    """
    model = make_model(cfg)
    tx = make_sgd(cfg, make_lr_schedule(cfg))
    rng, k1, k2 = jax.random.split(state.rng, 3)

    def fwd(params, bstats, svb, uvb):
        coords, feats, mapped, valid = _combine_batches(svb, uvb, cfg)
        plan = build_unet_plan(coords, valid, cfg.voxel_caps,
                               presorted=True)
        n_in = coords.shape[0]
        ok = plan.rep < n_in
        safe = jnp.where(ok, plan.rep, 0)
        feats0 = feats[safe] * ok[:, None].astype(feats.dtype)
        mapped0 = jnp.where(ok, mapped[safe], -1)
        valid0 = plan.levels[0].valid
        is_sup = ok & (plan.rep < cfg.sup_voxel_cap)
        # cross-view identity per level-0 row: (scan-in-batch, original
        # point index of the voxel representative); -1 where unavailable
        pids = jnp.concatenate(
            [svb["point_ids"], uvb["point_ids"]], axis=0
        )
        key_in = jnp.where(
            valid & (pids >= 0), coords[:, 0] * (1 << 20) + pids, -1
        )
        key0 = jnp.where(ok, key_in[safe], -1)
        out, mut = model.apply(
            {"params": params, "batch_stats": bstats},
            plan, feats0, train=True, mutable=["batch_stats"],
        )
        return (out, mut, mapped0, valid0, is_sup & valid0,
                valid0 & ~is_sup, key0)

    def loss_fn(params):
        out_a, mut_a, map_a, val_a, sup_a, uns_a, key_a = fwd(
            params, state.batch_stats, sup_vb, unsup_vb
        )
        out_b, mut_b, map_b, val_b, sup_b, uns_b, key_b = fwd(
            params, mut_a["batch_stats"], sup_vb2, unsup_vb2
        )
        dummy_a = assemble_dummy_logits(out_a)
        dummy_b = assemble_dummy_logits(out_b)

        l_sup = cross_entropy(dummy_a, jnp.where(sup_a, map_a, -1), val_a)
        l_sup = l_sup + cross_entropy(dummy_b, jnp.where(sup_b, map_b, -1), val_b)
        l_cal = cfg.calib_coeff * (
            calibration_loss(dummy_a, jnp.where(sup_a, map_a, -1),
                             cfg.unknown_label, val_a)
            + calibration_loss(dummy_b, jnp.where(sup_b, map_b, -1),
                               cfg.unknown_label, val_b)
        )

        sg = jax.lax.stop_gradient
        nb_a = _novel_branch(cfg, sg(dummy_a), out_a["feats"], uns_a,
                             state.queue, sg(params), k1)
        nb_b = _novel_branch(cfg, sg(dummy_b), out_b["feats"], uns_b,
                             state.queue, sg(params), k2)

        # swapped prediction: view X's logits on ITS candidate rows vs the
        # aligned cluster label of the SAME underlying point's candidate in
        # view Y (identity join; unmatched candidates are ignored, like the
        # reference's isin intersection)
        def swap_term(nb_x, feats_x, key_x, nb_y, key_y, params):
            logits = (
                sg(feats_x)[nb_x["cand_rows"]]
                @ params["final3"]["kernel"] + params["final3"]["bias"]
            )
            kx = jnp.where(
                nb_x["rel_mask"], key_x[nb_x["cand_rows"]], -1)
            ky = jnp.where(
                nb_y["rel_mask"], key_y[nb_y["cand_rows"]],
                jnp.iinfo(jnp.int32).max,
            )
            order = jnp.argsort(ky)
            ky_s = ky[order]
            pos = jnp.clip(
                jnp.searchsorted(ky_s, kx), 0, ky_s.shape[0] - 1)
            m = jnp.where((ky_s[pos] == kx) & (kx >= 0), order[pos], -1)
            tgt = jnp.where(
                m >= 0, nb_y["mapped_novel"][jnp.maximum(m, 0)], -1)
            return cross_entropy(logits, tgt)

        g = (nb_a["has_novel"] & nb_b["has_novel"]).astype(jnp.float32)
        l_swav = cfg.novel_coeff * (
            swap_term(nb_a, out_a["feats"], key_a, nb_b, key_b, params)
            + swap_term(nb_b, out_b["feats"], key_b, nb_a, key_a, params)
        )
        loss = l_sup + l_cal + g * l_swav
        metrics = {
            "loss": loss,
            "sup_seg": l_sup,
            "calib": l_cal,
            "swav": g * l_swav,
            "n_cand": nb_a["n_cand"] + nb_b["n_cand"],
            "has_novel": (nb_a["has_novel"] & nb_b["has_novel"]).astype(jnp.int32),
        }
        return loss, (mut_b["batch_stats"], metrics, nb_a)

    (loss, (new_bs, metrics, nb)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

    nrel = jnp.maximum(jnp.sum(nb["rel_mask"].astype(jnp.float32)), 1.0)
    mean_rel = jnp.sum(
        nb["cand_feats"] * nb["rel_mask"][:, None], axis=0, keepdims=True
    ) / nrel
    new_queue = queue_push(state.queue, mean_rel, jnp.ones((1,), bool))
    queue = jax.tree_util.tree_map(
        lambda new, old: jnp.where(nb["has_novel"], new, old),
        new_queue, state.queue,
    )

    return NopsState(
        params=params,
        batch_stats=new_bs,
        opt_state=opt_state,
        queue=queue,
        step=state.step + 1,
        rng=rng,
    ), metrics
