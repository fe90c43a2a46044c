"""Hardware validation + timing of the transposed-activation conv kernels.

Checks fused_subm_conv_T (values + grads) against gather_conv and
fused_subm_conv on the real TPU at a realistic scan distribution, and
times fwd and fwd+bwd for both layouts tunnel-safely. Also validates the
pool-conv kernels at one down edge.

    N=69120 CI=96 CO=96 python tools/tconv_hw.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from gcdlss_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.ops.conv import gather_conv
from gcdlss_tpu.ops import fused_conv as F
from tpu_timing import device_time

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

N = int(os.environ.get("N", 69120))
CI = int(os.environ.get("CI", 96))
CO = int(os.environ.get("CO", 96))

rng = np.random.default_rng(0)
pts = _bench.synth_scan_points(rng, 80000)
c = np.unique(np.floor(pts / 0.05).astype(np.int32), axis=0)
c = np.concatenate([np.zeros((len(c), 1), np.int32), c], 1)[:N]
coords = np.zeros((N, 4), np.int32)
coords[: len(c)] = c
valid = np.zeros((N,), bool)
valid[: len(c)] = True
caps = (N, N, N // 2, N // 4, N // 8)
caps = tuple(-(-cp // 256) * 256 for cp in caps)
plan = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), caps)
nbr = plan.levels[0].nbr3
print(f"N={N} valid={int(valid.sum())} CI={CI} CO={CO}", flush=True)

x = (rng.standard_normal((N, CI)) * valid[:, None]).astype(np.float32)
w = (rng.standard_normal((27, CI, CO)) * 0.1).astype(np.float32)
xj = jnp.asarray(x, jnp.bfloat16)
xTj = jnp.asarray(x.T, jnp.bfloat16)
wj = jnp.asarray(w)

# ---- forward numerics ----
ref = jax.jit(lambda a, b: gather_conv(a, nbr, b, None, symmetric_adjoint=True))
rowsF = jax.jit(lambda a, b: F.fused_subm_conv(a, nbr, b))
colsF = jax.jit(lambda a, b: F.fused_subm_conv_T(a, nbr, b))
t0 = time.time()
o_cols = colsF(xTj, wj)
_ = np.asarray(o_cols[:1, :1])
print(f"T fwd compile+run {time.time()-t0:.1f}s", flush=True)
o_ref = np.asarray(ref(xj, wj), np.float32)
o_rows = np.asarray(rowsF(xj, wj), np.float32)
o_cols = np.asarray(o_cols, np.float32).T
print("T fwd vs gather err:", np.abs(o_cols - o_ref).max(),
      " rows-kernel vs gather err:", np.abs(o_rows - o_ref).max(), flush=True)

# ---- grads ----
mod = jnp.asarray(rng.standard_normal((N, CO)), jnp.float32)


def loss_rows(a, b):
    return jnp.sum(F.fused_subm_conv(a, nbr, b).astype(jnp.float32) * mod)


def loss_cols(a, b):
    return jnp.sum(
        F.fused_subm_conv_T(a, nbr, b).astype(jnp.float32) * mod.T)


# value_and_grad, NOT grad: grad of sum(out*mod) never needs the forward
# OUTPUT value, so XLA dead-code-eliminates the forward kernel and the
# "fwd+bwd" timing silently measures bwd only (caught 2026-08-17)
g_rows = jax.jit(jax.value_and_grad(loss_rows, argnums=(0, 1)))
g_cols = jax.jit(jax.value_and_grad(loss_cols, argnums=(0, 1)))
t0 = time.time()
_, gc = g_cols(xTj, wj)
_ = np.asarray(gc[1][:1, :1, :1])
print(f"T bwd compile+run {time.time()-t0:.1f}s", flush=True)
_, gr = g_rows(xj, wj)
dxr = np.asarray(gr[0], np.float32)
dxc = np.asarray(gc[0], np.float32).T
dwr = np.asarray(gr[1], np.float32)
dwc = np.asarray(gc[1], np.float32)
print("dx T-vs-rows err:", np.abs(dxc - dxr).max(),
      " dw rel:", np.abs(dwc - dwr).max() / (np.abs(dwr).max() + 1e-9),
      flush=True)

# ---- timing ----
dt_ref = device_time(rowsF, xj, wj, n=10)
dt_T = device_time(colsF, xTj, wj, n=10)
print(f"fwd rows-kernel {dt_ref*1e3:.2f} ms  T-kernel {dt_T*1e3:.2f} ms",
      flush=True)
dt_refg = device_time(g_rows, xj, wj, n=10)
dt_Tg = device_time(g_cols, xTj, wj, n=10)
print(f"fwd+bwd rows {dt_refg*1e3:.2f} ms  T {dt_Tg*1e3:.2f} ms", flush=True)

# ---- pool edge (down 0->1) ----
pool = plan.pools[0]
from gcdlss_tpu.ops.conv import down_conv

wd = jnp.asarray((rng.standard_normal((8, CI, CO)) * 0.1).astype(np.float32))
dref = jax.jit(lambda a, b: down_conv(a, pool.parent, pool.dcode, b, caps[1]))
dT = jax.jit(
    lambda a, b: F.fused_pool_conv_T(a, pool.children, pool.upmap, b))
t0 = time.time()
od = dT(xTj, wd)
_ = np.asarray(od[:1, :1])
print(f"pool fwd compile+run {time.time()-t0:.1f}s", flush=True)
odr = np.asarray(dref(xj, wd), np.float32)
odc = np.asarray(od, np.float32).T
print("pool fwd err:", np.abs(odc - odr).max(), flush=True)
dt_dref = device_time(dref, xj, wd, n=10)
dt_dT = device_time(dT, xTj, wd, n=10)
print(f"down rows-XLA {dt_dref*1e3:.2f} ms  T-kernel {dt_dT*1e3:.2f} ms",
      flush=True)
