"""Hardware validation + timing of the Pallas plan-candidates kernel.

Compiles `_build_cube_kernel_map` (rank join + kernel + exact repair +
fallback cond) on the real TPU at a realistic scan-coordinate distribution,
checks bit-exactness against the per-offset sort-merge joins, and times both
paths tunnel-safely.

    N=69120 K1=3 python tools/plan_kernel_hw.py
    N=262144 K1=5 python tools/plan_kernel_hw.py
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

from gcdlss_tpu.ops.coords import encode_coords, sorted_unique, decode_keys, SENTINEL_HI
from gcdlss_tpu.ops import plan as P
from tpu_timing import device_time

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

N = int(os.environ.get("N", 69120))
K1 = int(os.environ.get("K1", 3))
VER = int(os.environ.get("VER", 2))
offsets = P._offsets(K1)

rng = np.random.default_rng(0)
rows = []
for b in range(4):
    pts = _bench.synth_scan_points(rng, 80000)
    c = np.unique(np.floor(pts / 0.05).astype(np.int32), axis=0)
    rows.append(np.concatenate([np.full((len(c), 1), b, np.int32), c], 1))
c = np.concatenate(rows)[:N]
coords = np.zeros((N, 4), np.int32); coords[: len(c)] = c
valid = np.zeros((N,), bool); valid[: len(c)] = True

hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
(uh, ul), rep, inv, cnt = sorted_unique(hi, lo, N)
lvalid = uh != SENTINEL_HI
lcoords = jnp.where(lvalid[:, None], decode_keys(uh, ul), 0)
print(f"N={N} K1={K1} valid={int(jnp.sum(lvalid))}", flush=True)

kern = jax.jit(
    lambda c, v, h, l: P._build_cube_kernel_map(c, v, h, l, K1, version=VER))
print(f"kernel version: v{VER}", flush=True)
t0 = time.time()
out = kern(lcoords, lvalid, uh, ul)
_ = np.asarray(out[:1, :1])
print(f"kernel path compile+run: {time.time()-t0:.1f} s", flush=True)

join = jax.jit(
    lambda c, v, h, l: P._join_offsets(c, v, h, l, offsets, 32))
t0 = time.time()
ref = join(lcoords, lvalid, uh, ul)
_ = np.asarray(ref[:1, :1])
print(f"join path compile+run: {time.time()-t0:.1f} s", flush=True)

o = np.asarray(out); r = np.asarray(ref)
n_mism = int((o != r).sum())
print(f"bit-exact: {n_mism == 0} (mismatches: {n_mism}/{o.size})", flush=True)

dt_k = device_time(kern, lcoords, lvalid, uh, ul, n=10)
dt_j = device_time(join, lcoords, lvalid, uh, ul, n=10)
print(f"kernel path: {dt_k*1e3:.2f} ms   join path: {dt_j*1e3:.2f} ms "
      f"({dt_j/dt_k:.2f}x)", flush=True)
