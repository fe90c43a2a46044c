"""Isolate fused_subm_conv cost: kernel-only vs full XLA wrapper, cpad 96 vs 128."""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from gcdlss_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.ops import fused_conv as fc
from tpu_timing import device_time

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

N, CI, CO = 262144, 96, 96
rng = np.random.default_rng(0)
rows = []
for b in range(4):
    pts = _bench.synth_scan_points(rng, 80000)
    c = np.unique(np.floor(pts / 0.05).astype(np.int32), axis=0)
    rows.append(np.concatenate([np.full((len(c), 1), b, np.int32), c], 1))
c = np.concatenate(rows)[:N]
coords = np.zeros((N, 4), np.int32); coords[: len(c)] = c
valid = np.zeros((N,), bool); valid[: len(c)] = True
caps = (N, max(N // 2, 256), 256, 256, 256)
plan = jax.jit(build_unet_plan, static_argnames=("caps",))(
    jnp.asarray(coords), jnp.asarray(valid), caps)
nbr = plan.levels[0].nbr3
feats = (jnp.asarray(rng.standard_normal((N, CI)).astype(np.float32))
         * jnp.asarray(valid)[:, None]).astype(jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((27, CI, CO)).astype(np.float32) * 0.1)


def t(label, f, *args, n=10):
    t0 = time.time()
    o = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    c = time.time() - t0
    dt = device_time(f, *args, n=n)
    print(f"{label}: {dt*1e3:.2f} ms (compile {c:.0f}s)", flush=True)


# planning pieces alone
t("plan_windows", jax.jit(fc.plan_windows), nbr)
t("pad_T", jax.jit(lambda x: fc._pad_T(x, 96)), feats)

for cpad in (96, 128):
    ws, ss, relT, far, _ = jax.jit(fc.plan_windows)(nbr)
    xT = jax.jit(lambda x: fc._pad_T(x, cpad))(feats)
    wflat = jnp.zeros((27, cpad, CO), jnp.bfloat16).at[:, :CI, :].set(
        w.astype(jnp.bfloat16)).reshape(27 * cpad, CO)
    f = jax.jit(lambda xT, ws, ss, relT, wflat: fc._fused_fwd_core(
        xT, ws, ss, relT, wflat, B=fc.BLOCK, W=fc.WINDOW, WK=fc.SUBWIN))
    t(f"kernel-only cpad={cpad}", f, xT, ws, ss, relT, wflat)

t("full fused_subm_conv", jax.jit(lambda x, w: fc.fused_subm_conv(x, nbr, w)),
  feats, w)
