"""Isolate the fused-conv kernel's cost components on real TPU hardware.

Usage: python tools/kernel_variants_bench.py [full nogather nomatmul onehot]

Variants:
  full     - the real kernel (lane dynamic-gathers + one big matmul)
  nogather - gathers replaced by direct tile reads (same DMA/layout/matmul)
  nomatmul - gathers kept, trivial reduce instead of the big dot
  onehot   - gather expressed as one-hot matmuls on the MXU
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.ops import fused_conv as fc


def ring_coords(rng, n, nscans=4, vs=0.05):
    per = n // nscans
    rows = []
    for b in range(nscans):
        n_raw = int(per * 1.6)
        ang = rng.uniform(0, 2 * np.pi, n_raw)
        r = rng.uniform(2, 50, n_raw)
        z = rng.normal(0, 2, n_raw)
        pts = np.stack([r * np.cos(ang), r * np.sin(ang), z], 1)
        c = np.unique(np.floor(pts / vs).astype(np.int32), axis=0)[:per]
        rows.append(np.concatenate([np.full((len(c), 1), b, np.int32), c], 1))
    c = np.concatenate(rows)
    coords = np.zeros((n, 4), np.int32); coords[: len(c)] = c
    valid = np.zeros((n,), bool); valid[: len(c)] = True
    return coords, valid


N = int(os.environ.get("N", 262144))
CI = CO = int(os.environ.get("C", 96))
rng = np.random.default_rng(0)
coords, valid = ring_coords(rng, N)
caps = (N, max(N // 2, 256), 256, 256, 256)
plan = jax.jit(build_unet_plan, static_argnames=("caps",))(
    jnp.asarray(coords), jnp.asarray(valid), caps)
nbr = plan.levels[0].nbr3
print("fill:", float((np.asarray(nbr) >= 0).mean()))

feats = (jnp.asarray(rng.standard_normal((N, CI)).astype(np.float32))
         * jnp.asarray(valid)[:, None]).astype(jnp.bfloat16)
w = jnp.asarray(rng.standard_normal((27, CI, CO)).astype(np.float32) * 0.1)

# the inline diagnostic kernels below predate the production kernel's
# packed per-chunk ss format — plan with the matching legacy scheme
from legacy_plan import plan_windows_legacy

ws, ss, relT, far_count = jax.jit(plan_windows_legacy)(nbr)
print("far:", int(far_count))

B, W, WK = fc.BLOCK, fc.WINDOW, fc.SUBWIN
K = 27
# cpad follows C (e.g. C=256 to price the post-audit L3/L4 geometry where
# the fused conv now spends most of the step — BENCH.md round-5 card)
cpad = fc._cpad_for(CI)
C2 = cpad // 2


def mk_kernel(mode):
    def kern(ws_ref, ss_ref, xT_hbm, rel_ref, w_ref, o_ref, xwin, gst, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            xT_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[i], 128), W)], xwin, sem)
        cp.start(); cp.wait()
        for k in range(K):
            rel2 = rel_ref[k:k + 1, :]
            base = pl.multiple_of(ss_ref[i, k], 128)
            relb = pltpu.repeat(rel2, C2, axis=0)
            div = relb >> 7
            mod = relb & 127
            for cch in range(B // 128):
                dv = div[:, cch * 128:(cch + 1) * 128]
                idx = mod[:, cch * 128:(cch + 1) * 128]
                acc = jnp.zeros((C2, 128), jnp.int32)
                for t in range(WK // 128):
                    tile = xwin[:, pl.ds(pl.multiple_of(base + t * 128, 128), 128)]
                    part = tile if mode == "nogather" else jnp.take_along_axis(
                        tile, idx, axis=1)
                    acc = jnp.where(dv == t, part, acc)
                gst[k * C2:(k + 1) * C2, cch * 128:(cch + 1) * 128] = acc
        g = pltpu.bitcast(gst[:], jnp.bfloat16)
        if mode == "nomatmul":
            o_ref[:] = jnp.sum(
                g.reshape(K, cpad, B), axis=0).T[:, :CO].astype(jnp.float32)
        else:
            o_ref[:] = jax.lax.dot_general(
                g, w_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return kern


def mk_onehot():
    def kern(ws_ref, ss_ref, x_hbm, rel_ref, w_ref, o_ref, xwin, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(ws_ref[i], 128), W), :], xwin, sem)
        cp.start(); cp.wait()
        acc = jnp.zeros((B, CO), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, WK), 1)
        for k in range(K):
            rel2 = rel_ref[k:k + 1, :]  # [1, B]
            base = pl.multiple_of(ss_ref[i, k], 128)
            sub = xwin[pl.ds(base, WK), :]  # [WK, cpad] bf16
            oh = (lane == rel2.T).astype(jnp.bfloat16)  # [B, WK]; -1 -> none
            gk = jax.lax.dot_general(
                oh, sub, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [B, cpad]
            acc = acc + jax.lax.dot_general(
                gk.astype(jnp.bfloat16), w_ref[k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc
    return kern


def run_variant(mode, n=10):
    nb = N // B
    k8 = 32
    if mode == "onehot":
        xpad = jnp.zeros((N, cpad), jnp.bfloat16).at[:, :CI].set(feats)
        wpad = jnp.zeros((K, cpad, CO), jnp.bfloat16).at[:, :CI, :].set(
            w.astype(jnp.bfloat16))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((k8, B), lambda i, ws, ss: (i, 0)),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, CO), lambda i, ws, ss: (i, 0)),
            scratch_shapes=[pltpu.VMEM((W, cpad), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA(())])
        f = pl.pallas_call(mk_onehot(), grid_spec=grid_spec,
                           out_shape=jax.ShapeDtypeStruct((N, CO), jnp.float32))
        args = (ws, ss, xpad, relT, wpad)
    else:
        xT = fc._pad_T(feats, cpad)
        wflat = jnp.zeros((K, cpad, CO), jnp.bfloat16).at[:, :CI, :].set(
            w.astype(jnp.bfloat16)).reshape(K * cpad, CO)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((k8, B), lambda i, ws, ss: (i, 0)),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, CO), lambda i, ws, ss: (i, 0)),
            scratch_shapes=[pltpu.VMEM((C2, W), jnp.int32),
                            pltpu.VMEM((K * C2, B), jnp.int32),
                            pltpu.SemaphoreType.DMA(())])
        f = pl.pallas_call(mk_kernel(mode), grid_spec=grid_spec,
                           out_shape=jax.ShapeDtypeStruct((N, CO), jnp.float32))
        args = (ws, ss, xT, relT, wflat)
    jf = jax.jit(f)
    t0 = time.time(); o = jf(*args)
    import numpy as _np
    _np.asarray(jax.device_get(o.ravel()[:1]))  # block_until_ready does not
    # synchronize through the axon tunnel (tools/tpu_timing.py) — fetch
    print(f"{mode}: compile+1st {time.time()-t0:.1f}s", flush=True)
    from tpu_timing import device_time
    dt = device_time(jf, *args, n=n)
    print(f"{mode}: {dt*1e3:.2f} ms", flush=True)
    return o, dt


modes = sys.argv[1:] or ["full", "nogather", "nomatmul", "onehot"]
outs = {}
for m in modes:
    try:
        outs[m] = run_variant(m)
    except Exception as e:
        print(m, "FAILED:", repr(e)[:500], flush=True)

if "full" in outs and "onehot" in outs:
    d = float(jnp.max(jnp.abs(outs["full"][0] - outs["onehot"][0])))
    print("full-vs-onehot max abs diff:", d)
