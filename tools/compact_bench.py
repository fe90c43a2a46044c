"""Compacted (fill-only FLOPs) vs windowed fused conv on hardware.

Builds a realistic deep-level rulebook (the ci>=128 levels hold ~85% of
the network's dense-dot FLOPs, BENCH.md roofline), then times the fused
windowed path against the compacted path (kernels A/B forward, reversed-A/B
+ kernel C backward) at the same shape, with bit-level parity checks
between the two (both are bf16-compute/f32-accumulate).

  N=105472 C=256 python tools/compact_bench.py          # L3-like shape
  N=105472 C=256 GCDLSS_COMPACT_ALPHA=10 python tools/compact_bench.py
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

from gcdlss_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.ops import fused_conv as fc
from gcdlss_tpu.ops import compact_conv as cc
from tpu_timing import device_time

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

N = int(os.environ.get("N", 105472))  # ~L3 population, multiple of BLOCK
CI = int(os.environ.get("C", 256))
CO = int(os.environ.get("CO", CI))
LEVEL = int(os.environ.get("LEVEL", 3))

# build a full scan at L0 scale, then pool down to the requested level so
# the rulebook fill matches the bench population (L3 k3 fill ~7.1/32)
N0 = int(os.environ.get("N0", 262144))
rng = np.random.default_rng(0)
rows = []
for b in range(4):
    pts = _bench.synth_scan_points(rng, 80000)
    c = np.unique(np.floor(pts / 0.05).astype(np.int32), axis=0)
    rows.append(np.concatenate([np.full((len(c), 1), b, np.int32), c], 1))
c = np.concatenate(rows)[:N0]
coords = np.zeros((N0, 4), np.int32); coords[: len(c)] = c
valid = np.zeros((N0,), bool); valid[: len(c)] = True


def _r512(x):
    return ((x + 511) // 512) * 512


caps = (N0, _r512(int(N0 * 0.82)), _r512(int(N0 * 0.59)),
        _r512(int(N0 * 0.40)), _r512(int(N0 * 0.25)))
plan = jax.jit(build_unet_plan, static_argnames=("caps",))(
    jnp.asarray(coords), jnp.asarray(valid), caps)
lv = plan.levels[LEVEL]
nbr = np.asarray(lv.nbr3)
n = nbr.shape[0]
if n != N:
    print(f"note: level {LEVEL} cap {n} != N={N}; using {n}", flush=True)
fill = float((nbr >= 0).mean())
print(f"L{LEVEL} n={n} C={CI}->{CO} fill={fill:.3f} "
      f"({fill*32:.1f}/32 padded) alpha="
      f"{os.environ.get('GCDLSS_COMPACT_ALPHA', '12')}", flush=True)
nbr = jnp.asarray(nbr)
f_cap = cc.default_f_cap(n, 27)
from gcdlss_tpu.ops.compact_plan import compact_rulebook
in_list, out_list, pos, tile_k, cnt = jax.jit(
    compact_rulebook, static_argnums=(1,))(nbr, f_cap)
print(f"f_cap={f_cap} count={int(cnt)} "
      f"({'OVERFLOW' if int(cnt) > f_cap else 'ok'})", flush=True)
for name, book in (("A-in", in_list), ("A-out", out_list)):
    _, _, _, _, farn = jax.jit(
        lambda b: fc.plan_windows(b[:, None], block=cc.ABLOCK, n_src=n)
    )(book)
    print(f"far[{name}]={int(farn)}", flush=True)

if os.environ.get("STOP_AFTER_PLAN", "0") == "1":
    print("STOP_AFTER_PLAN=1: plan section ok, exiting", flush=True)
    sys.exit(0)

feats = jnp.asarray(
    rng.standard_normal((CI, n)).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((27, CI, CO)).astype(np.float32) * 0.1)
cot = jnp.asarray(rng.standard_normal((CO, n)).astype(np.float32) * 0.1)


def t(label, f, *args, n_it=10):
    t0 = time.time()
    o = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    csecs = time.time() - t0
    dt = device_time(f, *args, n=n_it)
    print(f"{label}: {dt*1e3:.2f} ms  (compile+1st {csecs:.0f}s)", flush=True)
    return o, dt


# trace-time env decides the path: distinct lambdas -> distinct jit caches
os.environ["GCDLSS_FUSED_COMPACT"] = "0"
f_win = jax.jit(lambda x, w: fc.fused_subm_conv_T(x, nbr, w))
g_win = jax.jit(jax.grad(lambda x, w: jnp.sum(
    fc.fused_subm_conv_T(x, nbr, w).astype(jnp.float32) * cot),
    argnums=(0, 1)))
o_win, t_win = t("windowed fwd   ", f_win, feats, w)
(gx_w, gw_w), tg_win = t("windowed fwd+bwd", g_win,
                         feats.astype(jnp.float32), w)

os.environ["GCDLSS_FUSED_COMPACT"] = "1"
f_cmp = jax.jit(lambda x, w: fc.fused_subm_conv_T(x, nbr, w))
g_cmp = jax.jit(jax.grad(lambda x, w: jnp.sum(
    fc.fused_subm_conv_T(x, nbr, w).astype(jnp.float32) * cot),
    argnums=(0, 1)))
o_cmp, t_cmp = t("compact fwd    ", f_cmp, feats, w)
(gx_c, gw_c), tg_cmp = t("compact fwd+bwd", g_cmp,
                         feats.astype(jnp.float32), w)
os.environ["GCDLSS_FUSED_COMPACT"] = "0"

err = float(jnp.max(jnp.abs(o_win.astype(jnp.float32)
                            - o_cmp.astype(jnp.float32))))
e1 = float(jnp.max(jnp.abs(gx_w - gx_c)))
e2 = (float(jnp.max(jnp.abs(gw_w - gw_c)))
      / max(float(jnp.max(jnp.abs(gw_w))), 1e-9))
print(f"fwd err {err:.4f} | dx err {e1:.4f} | dw rel err {e2:.4f}",
      flush=True)
# parity gate: callers (tpu_mega pipelines) key the compact default-flip on
# this exit code, so a silent mismatch must fail loudly. Bounds match
# tests/test_compact_conv.py (bf16-rounded r intermediate: dx 2e-2 scaled
# by the unit-normal activations; dw relative 2e-3; fwd like dx).
scale = max(float(jnp.max(jnp.abs(o_win))), 1e-9)
parity_ok = (err / scale < 0.02 and e2 < 5e-3
             and e1 / max(float(jnp.max(jnp.abs(gx_w))), 1e-9) < 0.02)
if not parity_ok:
    print("PARITY MISMATCH above tolerance — failing", flush=True)
print(f"fwd speedup {t_win/t_cmp:.2f}x | fwd+bwd speedup "
      f"{tg_win/tg_cmp:.2f}x", flush=True)
dense = 2 * 27 * n * CI * CO
filled = 2 * fill * 32 * n * CI * CO
print(f"dense-bound {dense/197e12*1e3:.2f} ms, fill-bound "
      f"{filled/197e12*1e3:.2f} ms; compact fwd achieves "
      f"{filled/t_cmp/197e12*100:.0f}% of fill-bound MXU", flush=True)
sys.exit(0 if parity_ok else 1)
