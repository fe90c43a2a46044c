"""Production fused-conv benchmark vs the XLA gather oracle (tunnel-safe).

Geometry comes from GCDLSS_FUSED_BLOCK/WINDOW/SUBWIN env vars (read by
ops/fused_conv at import). N and C via env.

  N=262144 C=96 GCDLSS_FUSED_BLOCK=512 python tools/fused_bench.py
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from gcdlss_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from gcdlss_tpu.ops.conv import gather_conv
from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.ops import fused_conv as fc
from tpu_timing import device_time

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

N = int(os.environ.get("N", 262144))
CI = int(os.environ.get("C", 96))
CO = int(os.environ.get("CO", CI))
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
print(f"N={N} C={CI}->{CO} geom B={fc.BLOCK} W={fc.WINDOW} WK={fc.SUBWIN} "
      f"fill={float((np.asarray(nbr) >= 0).mean()):.3f}", flush=True)
_, _, _, _, far_count = jax.jit(fc.plan_windows)(nbr)
_, _, _, _, far_count_rev = jax.jit(fc.plan_windows)(nbr[:, ::-1])
print("far fwd:", int(far_count), " far rev:", int(far_count_rev), flush=True)

feats = (jnp.asarray(rng.standard_normal((N, CI)).astype(np.float32))
         * jnp.asarray(valid)[:, None]).astype(jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((27, CI, CO)).astype(np.float32) * 0.1)
cot = jnp.asarray(rng.standard_normal((N, CO)).astype(np.float32) * 0.1)


def t(label, f, *args, n=10):
    t0 = time.time()
    o = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    c = time.time() - t0
    dt = device_time(f, *args, n=n)
    print(f"{label}: {dt*1e3:.2f} ms  (compile+1st {c:.0f}s)", flush=True)
    return o, dt


f_ref = jax.jit(lambda x, w: gather_conv(x, nbr, w, symmetric_adjoint=True))
f_fus = jax.jit(lambda x, w: fc.fused_subm_conv(x, nbr, w))
o_ref, t_ref = t("xla fwd ", f_ref, feats, w)
o_fus, t_fus = t("fused fwd", f_fus, feats, w)
err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32) - o_fus.astype(jnp.float32))))
print(f"fwd err {err:.4f} | fwd speedup {t_ref/t_fus:.2f}x", flush=True)

g_ref = jax.jit(jax.grad(lambda x, w: jnp.sum(
    gather_conv(x, nbr, w, symmetric_adjoint=True).astype(jnp.float32)
    * cot), argnums=(0, 1)))
g_fus = jax.jit(jax.grad(lambda x, w: jnp.sum(
    fc.fused_subm_conv(x, nbr, w).astype(jnp.float32) * cot), argnums=(0, 1)))
(gx_r, gw_r), tg_ref = t("xla fwd+bwd ", g_ref, feats, w)
(gx_f, gw_f), tg_fus = t("fused fwd+bwd", g_fus, feats, w)
e1 = float(jnp.max(jnp.abs(gx_r.astype(jnp.float32) - gx_f.astype(jnp.float32))))
e2 = float(jnp.max(jnp.abs(gw_r - gw_f))) / max(float(jnp.max(jnp.abs(gw_r))), 1e-9)
print(f"grad err dx {e1:.4f} dw(rel) {e2:.4f} | fwd+bwd speedup "
      f"{tg_ref/tg_fus:.2f}x", flush=True)
flops = 2 * 27 * int(valid.sum()) * CI * CO
print(f"fused fwd MXU util: {flops/t_fus/197e12*100:.1f}%", flush=True)
# parity gate: the tpu_mega pipelines key flag decisions (ragged fallback,
# varwin enable) on this exit code — a silent numeric mismatch must fail.
# Real indexing bugs give O(1) relative errors; bf16-vs-f32 stays well
# under these bounds (tests/test_fused_conv.py uses 0.05 abs at unit scale).
s_o = max(float(jnp.max(jnp.abs(o_ref))), 1e-9)
s_x = max(float(jnp.max(jnp.abs(gx_r))), 1e-9)
parity_ok = err / s_o < 0.05 and e1 / s_x < 0.05 and e2 < 0.05
if not parity_ok:
    print("PARITY MISMATCH above tolerance — failing", flush=True)
sys.exit(0 if parity_ok else 1)
