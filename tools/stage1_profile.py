"""Decompose the Stage-1 step: quantize, plan, model fwd, full step.

Tunnel-safe timing; GCDLSS_BENCH_BATCH and GCDLSS_FUSED_CONV apply.
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
from gcdlss_tpu.train.common import default_caps, make_sgd
from gcdlss_tpu.train.pretrain import (
    PretrainConfig, create_pretrain_state, make_model,
)
from gcdlss_tpu.losses import cross_entropy
from gcdlss_tpu.train.schedule import make_lr_schedule
from tpu_timing import device_time

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

BATCH = int(os.environ.get("GCDLSS_BENCH_BATCH", "1"))
P = 80000
cap0 = 69120 * BATCH
caps = default_caps(cap0)
cfg = PretrainConfig(
    num_labeled_classes=17, num_classes=19, unknown_label=17,
    voxel_caps=caps, arch="MinkUNet34", dtype="bfloat16", remat=False,
    steps_per_epoch=1000,
)
rng = np.random.default_rng(0)
pts = jnp.asarray(np.concatenate(
    [_bench.synth_scan_points(rng, P) for _ in range(BATCH)]))
bidx = jnp.asarray(np.repeat(np.arange(BATCH, dtype=np.int32), P))
labels = jnp.asarray(rng.integers(0, 17, BATCH * P).astype(np.int32))

state = create_pretrain_state(jax.random.PRNGKey(0), cfg)
model = make_model(cfg)
tx = make_sgd(cfg, make_lr_schedule(cfg))


def t(label, f, *args, n=10):
    t0 = time.time()
    o = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    c = time.time() - t0
    dt = device_time(f, *args, n=n)
    print(f"{label}: {dt*1e3:.1f} ms (compile {c:.0f}s)", flush=True)
    return o


@jax.jit
def quantize_only(pts, bidx):
    return sparse_quantize(pts, bidx, jnp.ones(pts.shape[0], bool), 0.05, cap0)


vox = t("quantize", quantize_only, pts, bidx)


@jax.jit
def plan_only(coords, valid):
    return build_unet_plan(coords, valid, caps)


plan = t("plan", plan_only, vox["coords"], vox["valid"])

feats0 = jnp.full((cap0, 1), 0.5, jnp.float32) * plan.levels[0].valid[:, None]


@jax.jit
def fwd_only(params, batch_stats, plan, feats0):
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      plan, feats0, train=False)
    return out["logits"]


t("model fwd (incl. heads)", fwd_only, state.params, state.batch_stats, plan,
  feats0)


@jax.jit
def fwd_bwd(params, batch_stats, plan, feats0, labels0):
    def loss_fn(p):
        out, mut = model.apply({"params": p, "batch_stats": batch_stats},
                               plan, feats0, train=True,
                               mutable=["batch_stats"])
        return cross_entropy(out["logits"], labels0, plan.levels[0].valid), mut

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, grads


labels0 = jnp.where(plan.levels[0].valid,
                    jnp.zeros((cap0,), jnp.int32), -1)
t("fwd+bwd", fwd_bwd, state.params, state.batch_stats, plan, feats0, labels0)
print(f"[batch={BATCH} fused={os.environ.get('GCDLSS_FUSED_CONV', '1')}]",
      flush=True)
