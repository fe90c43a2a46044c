"""Find which part of the fused-conv pallas_call scaffolding costs 26ms.

Starts from the cheap DMA-only kernel (0.03ms) and adds back one element of
the real kernel at a time.
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

N = 262144
CPAD = 128
C2 = CPAD // 2
K = 27
K8 = 32
B = 256
W = 2048
CO = 96
NB = N // B
rng = np.random.default_rng(0)
x_t = jnp.asarray(rng.integers(-2**30, 2**30, (C2, N)).astype(np.int32))
ws_seq = (jnp.minimum(jnp.arange(NB, dtype=jnp.int32) * B, N - W)
          & ~jnp.int32(127))
ws_rand = (jnp.asarray(
    np.random.default_rng(1).integers(0, N - W, NB).astype(np.int32))
    & ~jnp.int32(127))
relT = jnp.asarray(rng.integers(-1, 512, (NB * K8, B)).astype(np.int32))
wflat = jnp.asarray(rng.standard_normal((K * CPAD, CO)).astype(np.float32)
                    ).astype(jnp.bfloat16)


def run(name, *, with_w=False, with_rel=False, with_gst=False, co_out=128,
        randws=False, with_dot=False, n=20):
    ws = ws_rand if randws else ws_seq

    def kern(*refs):
        # refs: ws, [rel], src, [relblk], [w], o, win, [gst], sem
        idx = 0
        ws_ref = refs[idx]; idx += 1
        src_hbm = refs[idx]; idx += 1
        relblk = None
        if with_rel:
            relblk = refs[idx]; idx += 1
        w_ref = None
        if with_w:
            w_ref = refs[idx]; idx += 1
        o_ref = refs[idx]; idx += 1
        win = refs[idx]; idx += 1
        gst = None
        if with_gst or with_dot:
            gst = refs[idx]; idx += 1
        sem = refs[idx]
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[i], 128), W)], win, sem)
        cp.start(); cp.wait()
        consumed = win[0, 0].astype(jnp.float32)
        if with_rel:
            consumed = consumed + relblk[0, 0].astype(jnp.float32)
        if with_gst:
            gst[:] = jnp.zeros_like(gst) + win[0, 0]
        if with_dot:
            gst[:] = jnp.zeros_like(gst) + win[0, 0]
            g = pltpu.bitcast(gst[:], jnp.bfloat16)
            o_ref[:] = jax.lax.dot_general(
                g, w_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[:, :co_out]
            return
        if with_w:
            consumed = consumed + jnp.sum(w_ref[0:1, :].astype(jnp.float32))
        o_ref[:] = jnp.zeros_like(o_ref) + consumed

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [ws, x_t]
    if with_rel:
        in_specs.append(pl.BlockSpec((K8, B), lambda i, ws: (i, 0)))
        args.append(relT)
    if with_w:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(wflat)
    scratch = [pltpu.VMEM((C2, W), jnp.int32)]
    if with_gst or with_dot:
        scratch.append(pltpu.VMEM((K * C2, B), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA(()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, co_out), lambda i, ws: (i, 0)),
        scratch_shapes=scratch)
    f = pl.pallas_call(kern, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((N, co_out), jnp.float32))
    jf = jax.jit(f)
    t0 = time.time(); o = jax.block_until_ready(jf(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o = jax.block_until_ready(jf(*args))
    print(f"{name}: {(time.time()-t0)/n*1e3:.2f} ms   (compile+1st {c:.1f}s)",
          flush=True)


import traceback

def safe(*a, **k):
    try:
        run(*a, **k)
    except Exception as e:
        print(a[0], "FAILED:", repr(e)[:200], flush=True)

safe("base")
safe("randws", randws=True)
safe("out96", co_out=96)
safe("rel", with_rel=True)
safe("w", with_w=True)
safe("gst", with_gst=True)
safe("gst+dot+w", with_dot=True, with_w=True, co_out=96)
safe("all", with_rel=True, with_dot=True, with_w=True, co_out=96, randws=True)
