"""Which dynamic access makes the fori_loop gather kernel slow?

All variants: fori_loop over K=27 offsets, same DMA + dot as the real
kernel; each replaces one class of dynamic (traced-k) access with a static
one (wrong results, right cost):

  fori_all     - real kernel (dynamic rel row, ss scalar, gst row)
  static_rel   - rel2 read from row 0 always
  static_ss    - base = 0 always
  static_gst   - gst written at row 0 always
  static_all   - all three static (loop still fori)
  unrolled     - python-unrolled reference (expected ~9 ms)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.ops import fused_conv as fc
from tpu_timing import device_time

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)

N = 262144
CI = CO = 96
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
# this diagnostic's inline kernels predate the ragged per-chunk ss format
from legacy_plan import plan_windows_legacy
ws, ss, relT, _ = jax.jit(plan_windows_legacy)(nbr)

B, W, WK, K = 256, 2048, 512, 27
cpad = 128
C2 = cpad // 2
NB = N // B
K8 = 32


def mk(mode):
    def gather_k(i, win, ss_ref, rel_ref, gst, k, static_rel, static_ss,
                 static_gst):
        rel2 = (rel_ref[0:1, :] if static_rel else rel_ref[pl.ds(k, 1), :]
                ) if not isinstance(k, int) else rel_ref[k:k + 1, :]
        ssv = ss_ref[i, 0] if static_ss else ss_ref[i, k]
        base = pl.multiple_of(ssv, 128)
        relb = pltpu.repeat(rel2, C2, axis=0)
        div = relb >> 7
        mod = relb & 127
        for cch in range(B // 128):
            dv = div[:, cch * 128:(cch + 1) * 128]
            idx = mod[:, cch * 128:(cch + 1) * 128]
            acc = jnp.zeros((C2, 128), jnp.int32)
            for t in range(WK // 128):
                tile = win[:, pl.ds(pl.multiple_of(base + t * 128, 128), 128)]
                part = jnp.take_along_axis(tile, idx, axis=1)
                acc = jnp.where(dv == t, part, acc)
            if static_gst:
                gst[0:C2, cch * 128:(cch + 1) * 128] = acc
            elif isinstance(k, int):
                gst[k * C2:(k + 1) * C2, cch * 128:(cch + 1) * 128] = acc
            else:
                gst[pl.ds(k * C2, C2), cch * 128:(cch + 1) * 128] = acc

    def kern(ws_ref, ss_ref, xT_hbm, rel_ref, w_ref, o_ref, xwin, gst, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            xT_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[i], 128), W)], xwin, sem)
        cp.start(); cp.wait()
        if mode == "unrolled":
            for k in range(K):
                gather_k(i, xwin, ss_ref, rel_ref, gst, k, False, False, False)
        else:
            sr = mode in ("static_rel", "static_all")
            ssb = mode in ("static_ss", "static_all")
            sg = mode in ("static_gst", "static_all")

            def body(k, carry):
                gather_k(i, xwin, ss_ref, rel_ref, gst, k, sr, ssb, sg)
                return carry

            jax.lax.fori_loop(0, K, body, 0)
        g = pltpu.bitcast(gst[:], jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            g, w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return kern


def run(mode, n=10):
    xT = fc._pad_T(feats, cpad)
    wflat = jnp.zeros((K, cpad, CO), jnp.bfloat16).at[:, :CI, :].set(
        w.astype(jnp.bfloat16)).reshape(K * cpad, CO)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((K8, B), lambda i, ws, ss: (i, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, CO), lambda i, ws, ss: (i, 0)),
        scratch_shapes=[pltpu.VMEM((C2, W), jnp.int32),
                        pltpu.VMEM((K * C2, B), jnp.int32),
                        pltpu.SemaphoreType.DMA(())])
    f = pl.pallas_call(mk(mode), grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((N, CO), jnp.float32))
    jf = jax.jit(f)
    t0 = time.time()
    o = jf(ws, ss, xT, relT, wflat)
    np.asarray(jax.device_get(o.ravel()[:1]))
    c = time.time() - t0
    dt = device_time(jf, ws, ss, xT, relT, wflat, n=n)
    print(f"{mode}: {dt*1e3:.2f} ms (compile+1st {c:.0f}s)", flush=True)


for m in (sys.argv[1:] or ["fori_all", "static_rel", "static_ss",
                           "static_gst", "static_all", "unrolled"]):
    try:
        run(m)
    except Exception as e:
        print(m, "FAILED:", repr(e)[:300], flush=True)
