"""Stage-wise timing of the UNet plan build on TPU (tunnel-safe timing).

Components: level-0 unique, stem join (symmetric vs full), per-level k3
joins, pool uniques, whole plan.
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

from gcdlss_tpu.ops.coords import encode_coords, sorted_unique, decode_keys, SENTINEL_HI
from gcdlss_tpu.ops.plan import (
    build_unet_plan, build_neighbor_map, KERNEL_OFFSETS_3, KERNEL_OFFSETS_5,
)
from tpu_timing import device_time

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

N = int(os.environ.get("N", 262144))
rng = np.random.default_rng(0)
rows = []
for b in range(4):
    pts = _bench.synth_scan_points(rng, 80000)
    c = np.unique(np.floor(pts / 0.05).astype(np.int32), axis=0)
    rows.append(np.concatenate([np.full((len(c), 1), b, np.int32), c], 1))
c = np.concatenate(rows)[:N]
coords = np.zeros((N, 4), np.int32); coords[: len(c)] = c
valid = np.zeros((N,), bool); valid[: len(c)] = True
coords = jnp.asarray(coords); valid = jnp.asarray(valid)
caps = (N, max(N // 2, 256), N // 4, N // 8, N // 8)


def t(label, f, *args, n=10):
    o = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))
    dt = device_time(f, *args, n=n)
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
    return o


whole = jax.jit(lambda c, v: build_unet_plan(c, v, caps))
t("whole plan", whole, coords, valid, n=5)

whole_ps = jax.jit(lambda c, v: build_unet_plan(c, v, caps, presorted=True))
t("whole plan (presorted)", whole_ps, coords, valid, n=5)

uniq = jax.jit(lambda c, v: sorted_unique(*encode_coords(c, v), caps[0]))
(uh, ul), rep, inv, cnt = t("level0 unique", uniq, coords, valid)

from gcdlss_tpu.ops.coords import sorted_unique_presorted
uniq_ps = jax.jit(
    lambda c, v: sorted_unique_presorted(*encode_coords(c, v), caps[0]))
t("level0 unique (presorted)", uniq_ps, coords, valid)

lvalid = uh != SENTINEL_HI
lcoords = jnp.where(lvalid[:, None], decode_keys(uh, ul), 0)

stem_sym = jax.jit(lambda lc, lv, h, l: build_neighbor_map(
    lc, lv, h, l, KERNEL_OFFSETS_5, symmetric=True))
t("stem k5 join (symmetric)", stem_sym, lcoords, lvalid, uh, ul, n=5)

stem_full = jax.jit(lambda lc, lv, h, l: build_neighbor_map(
    lc, lv, h, l, KERNEL_OFFSETS_5, symmetric=False))
t("stem k5 join (full)", stem_full, lcoords, lvalid, uh, ul, n=5)

k3_sym = jax.jit(lambda lc, lv, h, l: build_neighbor_map(
    lc, lv, h, l, KERNEL_OFFSETS_3, symmetric=True))
t("k3 join at cap0 (symmetric)", k3_sym, lcoords, lvalid, uh, ul, n=5)

pool = jax.jit(lambda lc, lv: sorted_unique(*encode_coords(
    jnp.concatenate([lc[:, 0:1], lc[:, 1:4] >> 1], axis=1), lv), caps[1]))
t("pool unique 0->1", pool, lcoords, lvalid)
