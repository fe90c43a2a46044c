"""Bisect the fused-conv kernel's per-block costs on real TPU hardware.

Usage: python tools/kernel_bisect_bench.py [dma dma2 nogather static16 full full2]

Uses the realistic 64-beam scan generator from bench.py (~35% neighbor fill)
instead of the uniform-disc model (~4%).
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.ops import fused_conv as fc

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)
synth_scan_points = _bench.synth_scan_points

N = int(os.environ.get("N", 262144))
CI = CO = int(os.environ.get("C", 96))
NSCANS = 4
rng = np.random.default_rng(0)
rows = []
for b in range(NSCANS):
    pts = synth_scan_points(rng, 80000)
    c = np.unique(np.floor(pts / 0.05).astype(np.int32), axis=0)
    rows.append(np.concatenate([np.full((len(c), 1), b, np.int32), c], 1))
c = np.concatenate(rows)[:N]
coords = np.zeros((N, 4), np.int32); coords[: len(c)] = c
valid = np.zeros((N,), bool); valid[: len(c)] = True
print("valid:", int(valid.sum()))
caps = (N, max(N // 2, 256), 256, 256, 256)
plan = jax.jit(build_unet_plan, static_argnames=("caps",))(
    jnp.asarray(coords), jnp.asarray(valid), caps)
nbr = plan.levels[0].nbr3
print("fill:", float((np.asarray(nbr) >= 0).mean()), flush=True)

feats = (jnp.asarray(rng.standard_normal((N, CI)).astype(np.float32))
         * jnp.asarray(valid)[:, None]).astype(jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((27, CI, CO)).astype(np.float32) * 0.1)

# this diagnostic's inline kernels predate the ragged per-chunk ss format
from legacy_plan import plan_windows_legacy
ws, ss, relT, far_count = jax.jit(plan_windows_legacy)(nbr)
print("far:", int(far_count), flush=True)

B = int(os.environ.get("BLK", fc.BLOCK))
W = int(os.environ.get("WIN", fc.WINDOW))
WK = int(os.environ.get("SUB", fc.SUBWIN))
K = 27
cpad = 128
C2 = cpad // 2
NB = N // B
ws, ss, relT, far_count = jax.jit(lambda nbr: plan_windows_legacy(
    nbr, block=B, window=W, subwin=WK))(nbr)
print(f"geom B={B} W={W} WK={WK} far={int(far_count)}", flush=True)


def src(xT_hbm, ws_ref, i):
    return xT_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[i], 128), W)]


def mk(mode):
    dbuf = mode in ("dma2", "full2")

    def body(mode, i, ss_ref, rel_ref, w_ref, o_ref, win_ref, gst):
        """win_ref: VMEM ref [C2, W] (slice with pl.ds directly on the ref)."""
        if mode in ("dma", "dma2"):
            o_ref[:] = jnp.zeros_like(o_ref) + win_ref[0, 0].astype(jnp.float32)
            return
        for k in range(K):
            rel2 = rel_ref[k:k + 1, :]
            relb = pltpu.repeat(rel2, C2, axis=0)
            div = relb >> 7
            mod = relb & 127
            for cch in range(B // 128):
                dv = div[:, cch * 128:(cch + 1) * 128]
                idx = mod[:, cch * 128:(cch + 1) * 128]
                acc = jnp.zeros((C2, 128), jnp.int32)
                if mode == "static16":
                    for t in range(W // 128):
                        tile = win_ref[:, t * 128:(t + 1) * 128]
                        part = jnp.take_along_axis(tile, idx, axis=1)
                        acc = jnp.where(dv == t, part, acc)
                else:
                    base = pl.multiple_of(ss_ref[i, k], 128)
                    for t in range(WK // 128):
                        tile = win_ref[:, pl.ds(
                            pl.multiple_of(base + t * 128, 128), 128)]
                        part = tile if mode == "nogather" else (
                            jnp.take_along_axis(tile, idx, axis=1))
                        acc = jnp.where(dv == t, part, acc)
                gst[k * C2:(k + 1) * C2, cch * 128:(cch + 1) * 128] = acc
        g = pltpu.bitcast(gst[:], jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            g, w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if dbuf:
        def kern(ws_ref, ss_ref, xT_hbm, rel_ref, w_ref, o_ref,
                 win_a, win_b, gst, sem):
            i = pl.program_id(0)
            nb = pl.num_programs(0)
            even = jax.lax.rem(i, 2) == 0

            @pl.when(i == 0)
            def _():
                pltpu.make_async_copy(src(xT_hbm, ws_ref, 0), win_a,
                                      sem.at[0]).start()

            @pl.when((i + 1 < nb) & even)
            def _():
                pltpu.make_async_copy(src(xT_hbm, ws_ref, i + 1), win_b,
                                      sem.at[1]).start()

            @pl.when((i + 1 < nb) & ~even)
            def _():
                pltpu.make_async_copy(src(xT_hbm, ws_ref, i + 1), win_a,
                                      sem.at[0]).start()

            @pl.when(even)
            def _():
                pltpu.make_async_copy(src(xT_hbm, ws_ref, i), win_a,
                                      sem.at[0]).wait()
                body(mode, i, ss_ref, rel_ref, w_ref, o_ref, win_a, gst)

            @pl.when(~even)
            def _():
                pltpu.make_async_copy(src(xT_hbm, ws_ref, i), win_b,
                                      sem.at[1]).wait()
                body(mode, i, ss_ref, rel_ref, w_ref, o_ref, win_b, gst)
    else:
        def kern(ws_ref, ss_ref, xT_hbm, rel_ref, w_ref, o_ref, xwin, gst, sem):
            i = pl.program_id(0)
            cp = pltpu.make_async_copy(src(xT_hbm, ws_ref, i), xwin, sem)
            cp.start(); cp.wait()
            body(mode, i, ss_ref, rel_ref, w_ref, o_ref, xwin, gst)

    return kern, dbuf


def run(mode, n=10):
    k8 = 32
    kern, dbuf = mk(mode)
    if mode == "static16":
        # rel relative to the WINDOW start, not the sub-window
        blk = jnp.arange(N, dtype=jnp.int32) // B
        rel_w = np.asarray(nbr) - np.asarray(ws)[np.asarray(blk)][:, None]
        near = (np.asarray(nbr) >= 0) & (rel_w >= 0) & (rel_w < W)
        rel_w = np.where(near, rel_w, -1).astype(np.int32)
        relT_w = jnp.asarray(
            np.concatenate([rel_w.reshape(NB, B, K).transpose(0, 2, 1),
                            np.full((NB, k8 - K, B), -1, np.int32)], 1
                           ).reshape(NB * k8, B))
        rel_arg = relT_w
    else:
        rel_arg = relT
    xT = fc._pad_T(feats, cpad)
    wflat = jnp.zeros((K, cpad, CO), jnp.bfloat16).at[:, :CI, :].set(
        w.astype(jnp.bfloat16)).reshape(K * cpad, CO)
    if dbuf:
        scratch = [pltpu.VMEM((C2, W), jnp.int32),
                   pltpu.VMEM((C2, W), jnp.int32),
                   pltpu.VMEM((K * C2, B), jnp.int32),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        scratch = [pltpu.VMEM((C2, W), jnp.int32),
                   pltpu.VMEM((K * C2, B), jnp.int32),
                   pltpu.SemaphoreType.DMA(())]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((k8, B), lambda i, ws, ss: (i, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, CO), lambda i, ws, ss: (i, 0)),
        scratch_shapes=scratch)
    f = pl.pallas_call(kern, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((N, CO), jnp.float32))
    jf = jax.jit(f)
    from tpu_timing import device_time
    t0 = time.time(); o = jf(ws, ss, xT, rel_arg, wflat)
    import numpy as _np
    _np.asarray(jax.device_get(o.ravel()[:1]))
    print(f"{mode}: compile+1st {time.time()-t0:.1f}s", flush=True)
    dt = device_time(jf, ws, ss, xT, rel_arg, wflat, n=n)
    print(f"{mode}: {dt*1e3:.2f} ms", flush=True)
    return o


modes = sys.argv[1:] or ["dma", "dma2", "nogather", "full", "full2", "static16"]
outs = {}
for m in modes:
    try:
        outs[m] = run(m)
    except Exception as e:
        print(m, "FAILED:", repr(e)[:600], flush=True)

ref = jax.jit(lambda x, w: jnp.asarray(
    __import__("gcdlss_tpu.ops.conv", fromlist=["gather_conv"]).gather_conv(x, nbr, w)
))(feats, w).astype(jnp.float32)
for m in ("full", "full2", "static16"):
    if m in outs:
        print(m, "max err vs oracle:",
              float(jnp.max(jnp.abs(outs[m] - ref))), flush=True)
