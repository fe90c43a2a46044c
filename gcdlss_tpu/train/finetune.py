"""Stage-1.5 fine-tuning family: NCC-head calibration + mixing/scheduling
ablations.

Rebuilds of the reference finetune classes (`modules/exp.py`):
  * ExpFineTuning (`:505-687`) — dummy logits CE + calibration loss;
  * ExpMixFineTuning (`:1306-1520`) — + feature-mixing in the sup CE and
    optional entropy-minimization terms;
  * ExpBetaSchedulingFineTuning (`:1624-1757`) — centroid-triple mixing
    (labels -> unknown slot) with a linearly scheduled pair-mixing ratio;
  * ExpMixExtraFineTuning (`:2125-2430`) — combined sup+unsup forward with a
    0.1x pseudo-label unsup CE (NCC prob > threshold -> unknown slot);
  * Step / Poly / Linear threshold-scheduling variants (`:2431-2798`).

All are config switches on two jitted steps (`finetune_train_step`,
`finetune_extra_train_step`); see `train/registry.py` for the name map.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..models.minkunet import MinkUNetRC, assemble_dummy_logits
from ..losses import cross_entropy, calibration_loss, soft_cross_entropy
from .common import TrainState, make_sgd, plan_and_gather
from .feature_mixing import mix_features
from .schedule import make_lr_schedule


@dataclass(frozen=True)
class FineTuneConfig:
    num_labeled_classes: int
    num_classes: int
    unknown_label: int
    voxel_caps: tuple
    arch: str = "MinkUNet34"
    planes: tuple = (32, 64, 128, 256, 256, 128, 96, 96)
    in_channels: int = 1
    dtype: str = "float32"
    remat: bool = False
    head: str = "linear"  # "cosine" = ExpMixCosineFineTuning (`exp.py:1758`)
    ncc_heads: int = 3
    calib_coeff: float = 0.05  # 0.15 for nuScenes (`exp.py:542-546`)
    # --- feature-mixing family (`exp.py:1306-1757`) ---
    mix_mode: str = "none"  # none | pairs | centroid
    mixing_ratio: float = 0.1  # pairs-mode ratio (`mixing_ratio_feat`)
    mix_schedule: str = "const"  # const | linear: 1 -> mix_end over training
    mix_start: float = 1.0
    mix_end: float = 0.1
    beta_coeff: float = 0.5
    entropy_minimize: bool = False
    id_entropy_coeff: float = 1.0
    ood_entropy_coeff: float = 1e-6
    # --- "Extra" family: sup+unsup pseudo-label loss (`exp.py:2125-2798`) ---
    sup_voxel_cap: int = 0  # >0 enables the extra step's sup/unsup split
    num_sup_scans: int = 2
    unsup_coeff: float = 0.1
    thr_schedule: str = "const"  # const | step | poly | linear
    thr_init: float = 0.1
    thr_end: float = 0.5
    # unsup pseudo-label source (`finetune_extra_train_step`):
    #   threshold  — NCC prob > thr over ALL unsup rows (`exp.py:2524-2534`)
    #   rc_oracle  — ExpRCExtra (`exp.py:975-1112`): rows restricted to those
    #                whose STORED unlabeled GT is the unknown label, target
    #                unknown where NCC prob > thr else ignore
    #   cluster    — ExpClusterFineTuning (`exp.py:1123-1306`): host DBSCAN ->
    #                kmeans(K+1) -> Hungarian picks the unknown cluster
    extra_mode: str = "threshold"
    lr: float = 1e-4  # finetune_lr
    momentum: float = 0.9
    weight_decay: float = 1e-4
    use_scheduler: bool = True
    warmup_epochs: int = 4
    min_lr: float = 1e-5
    epochs: int = 50
    steps_per_epoch: int = 1000


def make_model(cfg: FineTuneConfig) -> MinkUNetRC:
    return MinkUNetRC(
        num_labeled=cfg.num_labeled_classes,
        num_novel=1,  # final3 unused at this stage but present for shape parity
        ncc_heads=cfg.ncc_heads,
        arch=cfg.arch,
        planes=cfg.planes,
        dtype=jnp.dtype(cfg.dtype),
        remat=cfg.remat,
        head=cfg.head,
    )


def create_finetune_state(rng, cfg: FineTuneConfig,
                          pretrained_params=None) -> TrainState:
    import numpy as np
    from ..ops.plan import build_unet_plan

    model = make_model(cfg)
    cap0 = min(cfg.voxel_caps[0], 4096)
    caps = tuple(min(c, 4096) for c in cfg.voxel_caps)
    coords = np.zeros((cap0, 4), np.int32)
    coords[:, 1] = np.arange(cap0) % 89
    coords[:, 2] = np.arange(cap0) // 89
    tx = make_sgd(cfg, make_lr_schedule(cfg))

    @jax.jit
    def _init(rng, coords):
        plan = build_unet_plan(coords, jnp.ones((cap0,), bool), caps)
        feats = jnp.zeros((cap0, cfg.in_channels), jnp.float32)
        variables = model.init(rng, plan, feats, train=False)
        params = variables["params"]
        if pretrained_params is not None:
            params = dict(params)
            for key in ("encoder", "final"):
                if key in pretrained_params:
                    params[key] = pretrained_params[key]
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    return _init(rng, jnp.asarray(coords))


def _mix_ratio(cfg: FineTuneConfig, step):
    """Pair-mixing ratio schedule (`exp.py:1731-1737`: 1 -> mix_end)."""
    if cfg.mix_schedule == "linear":
        total = max(cfg.epochs * cfg.steps_per_epoch, 1)
        prog = jnp.clip(step.astype(jnp.float32) / total, 0.0, 1.0)
        return 1.0 - prog * (cfg.mix_start - cfg.mix_end)
    return jnp.asarray(cfg.mixing_ratio, jnp.float32)


def _centroid_mix(rng, feats, labels, valid, unknown_label: int):
    """Triples of distinct-label features averaged; target = unknown slot
    (`exp.py:1494-1517`)."""
    n = feats.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    p1 = jax.random.permutation(k1, n)
    p2 = jax.random.permutation(k2, n)
    p3 = jax.random.permutation(k3, n)
    l1, l2, l3 = labels[p1], labels[p2], labels[p3]
    ok = (
        (l1 != l2) & (l2 != l3) & (l1 != l3)
        & valid[p1] & valid[p2] & valid[p3]
        & (l1 >= 0) & (l2 >= 0) & (l3 >= 0)
    )
    mix = (feats[p1] + feats[p2] + feats[p3]) / 3.0
    mix = jax.lax.stop_gradient(mix) * ok[:, None]
    return mix, jnp.where(ok, unknown_label, -1).astype(jnp.int32), ok


def _mixed_logits(cfg, params, mixf):
    """Mixed features through the raw final/final2 kernels
    (`exp.py:1692-1707`: the reference reads `.kernel` directly; the cosine
    variant reads the prototype weights, `exp.py:1856-1871`)."""
    if cfg.head == "cosine":
        def cos(x, w, scale=10.0):  # NormedLinear: w is [ci, features]
            xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
            wn = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
            return scale * (xn @ wn)

        kin = cos(mixf, params["final"]["weight"])
        kout = cos(mixf, params["final2"]["weight"])
    else:
        kin = mixf @ params["final"]["kernel"] + params["final"]["bias"]
        kout = mixf @ params["final2"]["kernel"] + params["final2"]["bias"]
    return jnp.concatenate([kin, jnp.max(kout, axis=-1, keepdims=True)], axis=-1)


def _entropy_terms(cfg, logits, valid):
    """id/ood entropy regularizers (`exp.py:1731-1746`). The ood term is a
    masked SUM (the reference's `mean(sum(...))` over a 1-D vector)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    m = valid.astype(jnp.float32)
    known = probs[:, :-1]
    ent = -jnp.sum(known * jnp.log(known + 1e-8), axis=-1)
    l_id = cfg.id_entropy_coeff * jnp.sum(ent * m) / jnp.maximum(jnp.sum(m), 1.0)
    rc = probs[:, -1]
    l_ood = cfg.ood_entropy_coeff * jnp.sum(rc * jnp.log(rc + 1e-8) * m)
    return l_id + l_ood


def _sup_losses(cfg, params, out, targets, valid0, rng, step):
    """Sup CE (optionally with mixed-feature rows appended), calibration,
    entropy terms. Shared by the plain and Extra steps."""
    logits = assemble_dummy_logits(out)  # [N, K+1]
    K1 = cfg.num_labeled_classes + 1
    # the reference concatenates mixed-feature rows into the batch BEFORE
    # the calibration/entropy terms (`exp.py:1709-1735`), so mixed rows also
    # receive the unknown-slot calibration; track the extended set here
    ext_logits, ext_targets, ext_valid = logits, targets, valid0
    if cfg.mix_mode == "pairs":
        ratio = _mix_ratio(cfg, step)
        mixf, mixp, mixok = mix_features(
            rng, out["feats"], targets, valid0 & (targets >= 0),
            K1, cfg.beta_coeff, mixing_ratio=ratio,
        )
        mix_logits = _mixed_logits(cfg, params, mixf)
        seg = (
            cross_entropy(logits, targets, valid0) * jnp.sum(valid0)
            + soft_cross_entropy(mix_logits, mixp, mixok) * jnp.sum(mixok)
        ) / jnp.maximum(jnp.sum(valid0) + jnp.sum(mixok), 1.0)
        # hard target for the mixed rows = dominant mix component
        mix_tgt = jnp.where(mixok, jnp.argmax(mixp, axis=-1), -1)
        ext_logits = jnp.concatenate([logits, mix_logits], axis=0)
        ext_targets = jnp.concatenate([targets, mix_tgt], axis=0)
        ext_valid = jnp.concatenate([valid0, mixok], axis=0)
    elif cfg.mix_mode == "centroid":
        mixf, mixl, mixok = _centroid_mix(
            rng, out["feats"], targets, valid0 & (targets >= 0),
            cfg.unknown_label,
        )
        mix_logits = _mixed_logits(cfg, params, mixf)
        seg = (
            cross_entropy(logits, targets, valid0) * jnp.sum(valid0)
            + cross_entropy(mix_logits, mixl, mixok) * jnp.sum(mixok)
        ) / jnp.maximum(jnp.sum(valid0) + jnp.sum(mixok), 1.0)
        ext_logits = jnp.concatenate([logits, mix_logits], axis=0)
        ext_targets = jnp.concatenate([targets, mixl], axis=0)
        ext_valid = jnp.concatenate([valid0, mixok], axis=0)
    else:
        seg = cross_entropy(logits, targets, valid0)
    calib = cfg.calib_coeff * calibration_loss(
        ext_logits, ext_targets, cfg.unknown_label, ext_valid
    )
    loss = seg + calib
    if cfg.entropy_minimize:
        loss = loss + _entropy_terms(cfg, ext_logits, ext_valid)
    return loss, logits, {"seg": seg, "calib": calib}


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def finetune_train_step(state: TrainState, batch: dict, cfg: FineTuneConfig):
    model = make_model(cfg)
    tx = make_sgd(cfg, make_lr_schedule(cfg))
    plan, feats0, _, mapped0 = plan_and_gather(batch, cfg.voxel_caps)
    valid0 = plan.levels[0].valid
    targets = jnp.where(valid0, mapped0, -1)
    rng = jax.random.fold_in(jax.random.PRNGKey(1234), state.step)

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            plan, feats0, train=True, mutable=["batch_stats"],
        )
        loss, _, parts = _sup_losses(cfg, params, out, targets, valid0, rng,
                                     state.step)
        return loss, (mut, parts)

    (loss, (mut, parts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    new_state = TrainState(
        params=params, batch_stats=mut["batch_stats"],
        opt_state=opt_state, step=state.step + 1,
    )
    return new_state, {"loss": loss, **parts}


def _threshold(cfg: FineTuneConfig, step):
    """Unsup pseudo-label NCC threshold schedules (`exp.py:2431-2798`)."""
    a, b = cfg.thr_init, cfg.thr_end
    total = max(cfg.epochs * cfg.steps_per_epoch, 1)
    prog = jnp.clip(step.astype(jnp.float32) / total, 0.0, 1.0)
    if cfg.thr_schedule == "linear":
        return a + (b - a) * prog
    if cfg.thr_schedule == "poly":
        return a + (b - a) * prog ** 2
    if cfg.thr_schedule == "step":
        # recurrence: every 2nd epoch end, thr += (end - thr) * e / epochs
        # (`exp.py:2548-2551`)
        epoch = step // max(cfg.steps_per_epoch, 1)

        def body(e, thr):
            upd = thr + (b - thr) * e.astype(jnp.float32) / max(cfg.epochs, 1)
            return jnp.where(e % 2 == 0, upd, thr)

        return jax.lax.fori_loop(0, epoch, body, jnp.asarray(a, jnp.float32))
    return jnp.asarray(a, jnp.float32)


def _cluster_unknown_mask_host(coords, unsup, feats, probs_known):
    """ExpClusterFineTuning's pseudo-unknown mining (`exp.py:1206-1296`):
    per unlabeled scan, DBSCAN(eps=3, min_samples=2) on voxel coords ->
    kmeans(K+1) over cluster-mean input features (noise points assigned by
    the same fitted kmeans — the reference re-fits a second kmeans on noise
    and merges by cluster id, which presumes index alignment and raises
    otherwise; predicting with the fitted model realizes the same intent
    without that crash path) -> Hungarian between cluster-mean class
    probabilities and classes; points of the cluster matched to the unknown
    column become pseudo-unknown."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    from ..algo.dbscan import dbscan

    coords = np.asarray(coords)
    unsup = np.asarray(unsup)
    feats = np.asarray(feats, np.float64)
    probs_known = np.asarray(probs_known, np.float64)
    K = probs_known.shape[1]
    mask = np.zeros(coords.shape[0], bool)
    for b in np.unique(coords[unsup, 0]) if unsup.any() else []:
        rows = np.flatnonzero(unsup & (coords[:, 0] == b))
        if rows.size < (K + 1) * 2:
            continue
        db = dbscan(coords[rows, 1:].astype(np.float64), eps=3, min_samples=2)
        ncl = int(db.max()) + 1
        if ncl < K + 1:
            continue
        cm = np.zeros((ncl, feats.shape[1]))
        cnt = np.zeros(ncl)
        core = db >= 0
        np.add.at(cm, db[core], feats[rows[core]])
        np.add.at(cnt, db[core], 1.0)
        cm /= np.maximum(cnt, 1.0)[:, None]
        try:
            from sklearn.cluster import KMeans

            km = KMeans(n_clusters=K + 1, n_init="auto", random_state=0).fit(cm)
            assign, cents = km.labels_, km.cluster_centers_
        except ImportError:  # pragma: no cover - numpy Lloyd fallback
            rng = np.random.default_rng(0)
            cents = cm[rng.choice(ncl, K + 1, replace=False)]
            for _ in range(25):
                d = ((cm[:, None] - cents[None]) ** 2).sum(-1)
                assign = d.argmin(1)
                for c in range(K + 1):
                    if (assign == c).any():
                        cents[c] = cm[assign == c].mean(0)
        point_k = np.full(rows.size, -1, np.int64)
        point_k[core] = assign[db[core]]
        if (~core).any():
            dn = ((feats[rows[~core]][:, None] - cents[None]) ** 2).sum(-1)
            point_k[~core] = dn.argmin(1)
        P = np.zeros((K + 1, K + 1))
        for c in range(K + 1):
            sel = point_k == c
            if sel.any():
                P[c, :K] = probs_known[rows[sel]].mean(0)
        np.nan_to_num(P, copy=False)
        r_ind, c_ind = linear_sum_assignment(P, maximize=True)
        for ri, ci in zip(r_ind, c_ind):
            if ci == K:
                mask[rows[point_k == ri]] = True
    return mask


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def finetune_extra_train_step(
    state: TrainState, sup_vb: dict, unsup_vb: dict, cfg: FineTuneConfig
):
    """ExpMixExtra*FineTuning step: combined sup+unsup forward, mixed sup CE
    + calibration + 0.1x pseudo-label unsup CE with a scheduled NCC-prob
    threshold (`exp.py:2236-2798`)."""
    from .discover import _combine_batches
    from ..ops.plan import build_unet_plan

    model = make_model(cfg)
    tx = make_sgd(cfg, make_lr_schedule(cfg))
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
    rng = jax.random.fold_in(jax.random.PRNGKey(4321), state.step)
    thr = _threshold(cfg, state.step)

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            plan, feats0, train=True, mutable=["batch_stats"],
        )
        sup_targets = jnp.where(sup_mask, mapped0, -1)
        loss, logits, parts = _sup_losses(
            cfg, params, out, sup_targets, sup_mask, rng, state.step
        )
        probs = jax.nn.softmax(jax.lax.stop_gradient(logits), axis=-1)
        if cfg.extra_mode == "rc_oracle":
            # ExpRCExtra (`exp.py:1087-1100`): only rows whose STORED
            # unlabeled GT is the unknown label participate; target unknown
            # where NCC prob > thr, ignored otherwise
            novel_rows = unsup_mask & (mapped0 == cfg.unknown_label)
            pseudo = jnp.where(probs[:, -1] > thr, cfg.unknown_label, -1)
            pseudo = jnp.where(novel_rows, pseudo, -1)
            l_unsup = cfg.unsup_coeff * cross_entropy(logits, pseudo, novel_rows)
        elif cfg.extra_mode == "cluster":
            # ExpClusterFineTuning (`exp.py:1206-1300`): host DBSCAN +
            # kmeans + Hungarian pick the pseudo-unknown cluster. Targets of
            # unmasked unsup rows are ZERO (class 0) exactly as the
            # reference's `torch.zeros` targets — intentionally faithful.
            cmask = jax.pure_callback(
                _cluster_unknown_mask_host,
                jax.ShapeDtypeStruct((coords.shape[0],), jnp.bool_),
                coords, unsup_mask, feats0,
                probs[:, : cfg.num_labeled_classes],
                vmap_method="sequential",
            )
            pseudo = jnp.where(cmask, cfg.unknown_label, 0).astype(jnp.int32)
            pseudo = jnp.where(unsup_mask, pseudo, -1)
            l_unsup = cfg.unsup_coeff * cross_entropy(logits, pseudo, unsup_mask)
        else:
            # unsup pseudo-label CE: argmax, forced to the unknown slot where
            # NCC prob exceeds the scheduled threshold (`exp.py:2524-2534`)
            pseudo = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            pseudo = jnp.where(probs[:, -1] > thr, cfg.unknown_label, pseudo)
            pseudo = jnp.where(unsup_mask, pseudo, -1)
            l_unsup = cfg.unsup_coeff * cross_entropy(logits, pseudo, unsup_mask)
        loss = loss + l_unsup
        parts = {**parts, "unsup_seg": l_unsup, "thr": thr}
        return loss, (mut, parts)

    (loss, (mut, parts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    new_state = TrainState(
        params=params, batch_stats=mut["batch_stats"],
        opt_state=opt_state, step=state.step + 1,
    )
    return new_state, {"loss": loss, **parts}
