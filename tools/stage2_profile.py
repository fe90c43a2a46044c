"""Decompose the Stage-2 discovery step (bench.py north-star config) into
its device phases: combined plan build, teacher fwd, LaserMix re-voxelize +
mixed plan, NCC mining (hash-order sort + k-means + Hungarian), the student
grad section (combined + mixed fwd/bwd), and optimizer/EMA tree updates.

Tunnel-safe timing (see tools/tpu_timing.py). Shapes/config mirror
bench.py:stage2_main exactly so phase times sum to the headline step.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from gcdlss_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from gcdlss_tpu.ops.voxelize import sparse_quantize
from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.train.common import default_caps
from gcdlss_tpu.train.discover import (
    DiscoverConfig, create_discover_state, discover_train_step,
    _combine_batches, make_model,
)
from gcdlss_tpu.train.lasermix import lasermix_batch
from gcdlss_tpu.algo.kmeans import cosine_kmeans
from gcdlss_tpu.algo.hungarian_jax import hungarian_small
from gcdlss_tpu.eval.metrics import confusion_update
from gcdlss_tpu.models.minkunet import assemble_dummy_logits
from gcdlss_tpu.losses import cross_entropy
from tpu_timing import device_time

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

P = 80000
half = 138240
cap0 = half * 2
cfg = DiscoverConfig(
    num_labeled_classes=17, num_unlabeled_classes=2, num_classes=19,
    unknown_label=17, voxel_caps=default_caps(cap0), sup_voxel_cap=half,
    mix_voxel_caps=default_caps(276480), num_sup_scans=2, point_cap=P,
    voxel_size=0.05, arch="MinkUNet34", dtype="bfloat16",
    cand_cap=4096, queue_slots=20, queue_per_slot=1024, kmeans_iters=15,
    steps_per_epoch=1000,
)

rng = np.random.default_rng(0)


def mk_side(nsc, vcap):
    pts = np.concatenate([_bench.synth_scan_points(rng, P) for _ in range(nsc)])
    bidx = np.repeat(np.arange(nsc), P)
    q = np.floor(pts / 0.05).astype(np.int32)
    vox_coords = []
    inv_all = np.full((nsc, P), vcap, np.int32)
    off = 0
    for b in range(nsc):
        qq = q[bidx == b]
        key = ((qq[:, 0].astype(np.int64) + 8192) << 28) | \
              ((qq[:, 1].astype(np.int64) + 8192) << 14) | \
              (qq[:, 2].astype(np.int64) + 8192)
        u, ui, inv = np.unique(key, return_index=True, return_inverse=True)
        take = min(len(u), vcap - off)
        vox_coords.append(
            np.concatenate([np.full((take, 1), b, np.int32), qq[ui[:take]]], 1))
        inv_all[b] = np.where(inv < take, off + inv, vcap)
        off += take
    vc = np.concatenate(vox_coords)
    m = len(vc)
    coords_pad = np.zeros((vcap, 4), np.int32)
    coords_pad[:m] = vc
    valid = np.zeros(vcap, bool)
    valid[:m] = True
    vb = {
        "coords": jnp.asarray(coords_pad),
        "feats": jnp.asarray(rng.uniform(0, 1, (vcap, 1)).astype(np.float32)),
        "labels": jnp.asarray(np.where(valid, rng.integers(0, 18, vcap), -1).astype(np.int32)),
        "mapped_labels": jnp.asarray(np.where(valid, rng.integers(0, 18, vcap), -1).astype(np.int32)),
        "valid": jnp.asarray(valid),
    }
    pb = {
        "xyz": jnp.asarray(pts.reshape(nsc, P, 3)),
        "feats": jnp.asarray(rng.uniform(0, 1, (nsc, P, 1)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 18, (nsc, P)).astype(np.int32)),
        "mapped_labels": jnp.asarray(rng.integers(0, 18, (nsc, P)).astype(np.int32)),
        "valid": jnp.ones((nsc, P), bool),
        "voxel_row": jnp.asarray(inv_all),
    }
    return vb, pb


sup_vb, sup_pb = mk_side(2, half)
unsup_vb, unsup_pb = mk_side(2, cap0 - half)
state = create_discover_state(jax.random.PRNGKey(0), cfg)
model = make_model(cfg)


def t(label, f, *args, n=8):
    t0 = time.time()
    o = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    c = time.time() - t0
    dt = device_time(f, *args, n=n)
    print(f"{label}: {dt*1e3:.1f} ms (compile {c:.0f}s)", flush=True)
    return o


# ---- phase 1: combined plan -------------------------------------------------
@jax.jit
def plan_combined(sup_vb, unsup_vb):
    coords, feats, mapped, valid = _combine_batches(sup_vb, unsup_vb, cfg)
    return build_unet_plan(coords, valid, cfg.voxel_caps), feats, mapped

plan, feats, mapped = t("plan (combined 276k)", plan_combined, sup_vb, unsup_vb)
ok = plan.rep < cap0
feats0 = feats[jnp.where(ok, plan.rep, 0)] * ok[:, None].astype(feats.dtype)


# ---- phase 2: teacher fwd ---------------------------------------------------
@jax.jit
def teacher_fwd(params_t, bstats_t, plan, feats0):
    out_t, mut_t = model.apply(
        {"params": params_t, "batch_stats": bstats_t},
        plan, feats0, train=True, mutable=["batch_stats"])
    return assemble_dummy_logits(out_t), out_t["feats"]

dummy_t, feats_t = t("teacher fwd (276k)", teacher_fwd,
                     state.params_t, state.batch_stats_t, plan, feats0)


# ---- phase 3: LaserMix + quantize + mixed plan -------------------------------
@jax.jit
def mix_phase(sup_pb, unsup_pb, pseudo):
    mxyz, mfeats, mlabels, mvalid = lasermix_batch(
        sup_pb, unsup_pb, pseudo, jnp.asarray(4, jnp.int32))
    nscan, npt = mxyz.shape[0], mxyz.shape[1]
    vox = sparse_quantize(
        mxyz.reshape(nscan * npt, 3),
        jnp.repeat(jnp.arange(nscan, dtype=jnp.int32), npt),
        mvalid.reshape(-1), cfg.voxel_size, cfg.mix_voxel_caps[0])
    mplan = build_unet_plan(vox["coords"], vox["valid"], cfg.mix_voxel_caps)
    return mplan, vox["rep"]

pseudo = jnp.zeros(unsup_pb["voxel_row"].shape, jnp.int32)
mix_plan, _ = t("lasermix+quantize+mixed plan (276k)", mix_phase,
                sup_pb, unsup_pb, pseudo)


# ---- phase 3b: the same, split into its three stages --------------------------
@jax.jit
def mix_only(sup_pb, unsup_pb, pseudo):
    return lasermix_batch(sup_pb, unsup_pb, pseudo, jnp.asarray(4, jnp.int32))

mxyz, mfeats, mlabels, mvalid = t("  lasermix bands only", mix_only,
                                  sup_pb, unsup_pb, pseudo)


@jax.jit
def quantize_only(mxyz, mvalid):
    nscan, npt = mxyz.shape[0], mxyz.shape[1]
    return sparse_quantize(
        mxyz.reshape(nscan * npt, 3),
        jnp.repeat(jnp.arange(nscan, dtype=jnp.int32), npt),
        mvalid.reshape(-1), cfg.voxel_size, cfg.mix_voxel_caps[0])

vox = t("  device quantize only", quantize_only, mxyz, mvalid)


@jax.jit
def mixplan_only(coords, valid):
    return build_unet_plan(coords, valid, cfg.mix_voxel_caps)

_ = t("  mixed plan only", mixplan_only, vox["coords"], vox["valid"])
mix_feats0 = jnp.zeros((cfg.mix_voxel_caps[0], 1), jnp.float32)
mix_labels0 = jnp.zeros((cfg.mix_voxel_caps[0],), jnp.int32)


# ---- phase 3c: voxel-level mixed plan (default mix_plan_mode="voxel"):
# replaces ALL of phase 3 (bands + quantize + mixed plan) with one
# re-batched plan build over the combined level-0 rows ---------------------
from gcdlss_tpu.train.discover import _mixed_plan_voxel

mapped0 = jnp.where(ok, mapped[jnp.where(ok, plan.rep, 0)], -1)
is_sup = ok & (plan.rep < half)
pseudo_vox = jnp.zeros((cap0,), jnp.int32)


@jax.jit
def mixplan_voxel(plan, feats0, mapped0, is_sup, pseudo_vox):
    return _mixed_plan_voxel(
        cfg, plan, feats0, mapped0, is_sup, pseudo_vox,
        jnp.asarray(4, jnp.int32))

_ = t("  voxel-level mixed plan (replaces all three)", mixplan_voxel,
      plan, feats0, mapped0, is_sup, pseudo_vox)


# ---- phase 4: mining (hash sort + kmeans + hungarian) -------------------------
@jax.jit
def mining(dummy_t, feats_t, params_s, queue, key):
    from gcdlss_tpu.algo.queue import queue_flatten
    cand_mask = dummy_t[:, -1] > 0.0
    rows0 = jnp.arange(cap0, dtype=jnp.int32)
    h = (rows0 * jnp.int32(-1640531527)) & jnp.int32(0x07FFFFFF)
    order = jnp.argsort(jnp.where(cand_mask, h, h + jnp.int32(1 << 27)))
    cand_rows = order[: cfg.cand_cap]
    n_cand = jnp.sum(cand_mask.astype(jnp.int32))
    cand_valid = jnp.arange(cfg.cand_cap) < jnp.minimum(n_cand, cfg.cand_cap)
    cand_feats = feats_t[cand_rows] * cand_valid[:, None]
    qfeats, qvalid = queue_flatten(queue)
    all_feats = jnp.concatenate([cand_feats, qfeats], axis=0)
    all_valid = jnp.concatenate([cand_valid, qvalid], axis=0)
    assign_all, cents = cosine_kmeans(
        all_feats, all_valid, cfg.num_unlabeled_classes + cfg.alpha, key,
        iters=cfg.kmeans_iters)
    w3 = params_s["final3"]["kernel"]
    b3 = params_s["final3"]["bias"]
    novel_preds = jnp.argmax(cand_feats @ w3 + b3, axis=-1)
    rel = cand_valid
    cost = confusion_update(novel_preds,
                            jnp.clip(assign_all[: cfg.cand_cap], 0,
                                     cfg.num_unlabeled_classes - 1),
                            cfg.num_unlabeled_classes, rel)
    return hungarian_small(cost.astype(jnp.float32), maximize=True)

t("mining: sort+kmeans+hungarian", mining, dummy_t, feats_t,
  state.params_s, state.queue, jax.random.PRNGKey(1))


# ---- phase 5: student grad section (combined + mixed fwd/bwd) -----------------
@jax.jit
def student_grads(params_s, bstats_s, plan, feats0, mapped0,
                  mix_plan, mix_feats0, mix_labels0):
    def loss_fn(p):
        out_s, mut_s = model.apply(
            {"params": p, "batch_stats": bstats_s},
            plan, feats0, train=True, mutable=["batch_stats"])
        dummy_s = assemble_dummy_logits(out_s)
        l = cross_entropy(dummy_s, mapped0, plan.levels[0].valid)
        out_mix, _ = model.apply(
            {"params": p, "batch_stats": mut_s["batch_stats"]},
            mix_plan, mix_feats0, train=True, mutable=["batch_stats"])
        l = l + cross_entropy(assemble_dummy_logits(out_mix), mix_labels0,
                              mix_plan.levels[0].valid)
        return l

    return jax.value_and_grad(loss_fn)(params_s)

mapped0 = jnp.where(ok, mapped[jnp.where(ok, plan.rep, 0)], -1)
t("student fwd+bwd (combined+mixed)", student_grads,
  state.params_s, state.batch_stats_s, plan, feats0, mapped0,
  mix_plan, mix_feats0, mix_labels0, n=5)


# ---- phase 5b: combined-only grads (mixed share = 5 minus 5b) ------------------
@jax.jit
def student_grads_combined(params_s, bstats_s, plan, feats0, mapped0):
    def loss_fn(p):
        out_s, _ = model.apply(
            {"params": p, "batch_stats": bstats_s},
            plan, feats0, train=True, mutable=["batch_stats"])
        return cross_entropy(assemble_dummy_logits(out_s), mapped0,
                             plan.levels[0].valid)

    return jax.value_and_grad(loss_fn)(params_s)

t("  student fwd+bwd combined only", student_grads_combined,
  state.params_s, state.batch_stats_s, plan, feats0, mapped0, n=5)


# ---- phase 6: optimizer + EMA tree updates ------------------------------------
@jax.jit
def tree_updates(params_s, params_t):
    m = cfg.ema_momentum
    params_t2 = jax.tree_util.tree_map(
        lambda t_, s: (1.0 - m) * t_ + m * s, params_t, params_s)
    return params_t2

t("EMA tree update", tree_updates, state.params_s, state.params_t)


# ---- reference: the full step -------------------------------------------------
# Free the phase intermediates first: at post-audit caps the live phase
# outputs (plans, teacher logits/feats, grads) plus the full step's own
# working set RESOURCE_EXHAUSTED the chip (observed 2026-08-21). The full
# step must run against a clean pool.
del plan, feats, mapped, feats0, ok, dummy_t, feats_t, mix_plan
del mxyz, mfeats, mlabels, mvalid, vox, mapped0, is_sup, pseudo_vox, pseudo
import gc
gc.collect()

# discover_train_step donates its state arg, so it must be timed bench-style
# (threading the returned state) — re-calling with the same donated buffers
# raises a TPU backend error on this rig.
state, m = discover_train_step(state, sup_vb, sup_pb, unsup_vb, unsup_pb, cfg)
_ = float(m["loss"])
n = 5
t0 = time.perf_counter()
for _ in range(n):
    state, m = discover_train_step(state, sup_vb, sup_pb, unsup_vb, unsup_pb, cfg)
_ = float(m["loss"])
dt = (time.perf_counter() - t0) / n
print(f"FULL discover step: {dt*1e3:.1f} ms", flush=True)
