"""Decompose the MinkUNet forward at Stage-1 batch-1 scale (69k voxels).

Times isolated jits of: the k5 stem conv (XLA path), one k3 SparseConv at
each level size/width, the k2s2 down/up convs, a BatchNorm, and pad_T.
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
from gcdlss_tpu.ops.conv import gather_conv, down_conv, up_conv
from gcdlss_tpu.ops import fused_conv as fc
from gcdlss_tpu.train.common import default_caps
from tpu_timing import device_time

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

BATCH = int(os.environ.get("GCDLSS_BENCH_BATCH", "1"))
cap0 = 69120 * BATCH
caps = default_caps(cap0)
rng = np.random.default_rng(0)
pts = jnp.asarray(np.concatenate(
    [_bench.synth_scan_points(rng, 80000) for _ in range(BATCH)]))
bidx = jnp.asarray(np.repeat(np.arange(BATCH, dtype=np.int32), 80000))

plan = jax.jit(
    lambda p, b: build_unet_plan(
        sparse_quantize(p, b, jnp.ones(p.shape[0], bool), 0.05, cap0)["coords"],
        sparse_quantize(p, b, jnp.ones(p.shape[0], bool), 0.05, cap0)["valid"],
        caps)
)(pts, bidx)
plan = jax.tree_util.tree_map(jax.device_put, plan)


def t(label, f, *args, n=10):
    o = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    dt = device_time(f, *args, n=n)
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)


# stem: k5, ci=1 -> 32 (XLA gather path)
w_stem = jnp.asarray(rng.standard_normal((125, 1, 32)).astype(np.float32) * .1)
x1 = (jnp.asarray(rng.standard_normal((cap0, 1)).astype(np.float32))
      * plan.levels[0].valid[:, None]).astype(jnp.bfloat16)
t("stem k5 1->32 (XLA)", jax.jit(
    lambda x, w: gather_conv(x, plan.stem_nbr, w)), x1, w_stem)

# k3 convs per level (fused and XLA) at reference widths
widths = (32, 32, 64, 128, 256)
dec_widths = (96, 96, 128, 256)
for lvl, ch in enumerate(widths):
    n = caps[lvl]
    x = (jnp.asarray(rng.standard_normal((n, ch)).astype(np.float32))
         * plan.levels[lvl].valid[:, None]).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((27, ch, ch)).astype(np.float32) * .1)
    nbr = plan.levels[lvl].nbr3
    t(f"k3 L{lvl} n={n} c={ch} fused", jax.jit(
        lambda x, w, nbr=nbr: fc.fused_subm_conv(x, nbr, w)), x, w)
    t(f"k3 L{lvl} n={n} c={ch} XLA  ", jax.jit(
        lambda x, w, nbr=nbr: gather_conv(x, nbr, w)), x, w)

# down/up convs at edge 0->1 (32->64) and BN-scale ops
pool = plan.pools[0]
x0 = (jnp.asarray(rng.standard_normal((caps[0], 32)).astype(np.float32))
      ).astype(jnp.bfloat16)
wd = jnp.asarray(rng.standard_normal((8, 32, 32)).astype(np.float32) * .1)
t("down k2s2 L0->L1 c32", jax.jit(
    lambda x, w: down_conv(x, pool.parent, pool.dcode, w, caps[1])), x0, wd)
xc = (jnp.asarray(rng.standard_normal((caps[1], 64)).astype(np.float32))
      ).astype(jnp.bfloat16)
wu = jnp.asarray(rng.standard_normal((8, 64, 64)).astype(np.float32) * .1)
t("up   k2s2 L1->L0 c64", jax.jit(
    lambda x, w: up_conv(x, pool.parent, pool.dcode, w)), xc, wu)

t("pad_T c96 at cap0", jax.jit(lambda x: fc._pad_T(x, 96)),
  (jnp.asarray(rng.standard_normal((cap0, 96)).astype(np.float32))
   ).astype(jnp.bfloat16))
print(f"[batch={BATCH}]", flush=True)
