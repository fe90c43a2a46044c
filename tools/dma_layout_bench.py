"""Measure window-DMA cost by source layout + window size on TPU.

Variants (all DMA-only kernels, total output rows N=262144):
  t_256     [C2,W=2048] window from transposed [C2,N] int32; 1024 blocks
  t_2048    [C2,W=6144] window from transposed; 128 super-blocks
  nat_256   [W=2048,128] window from natural [N,128] bf16 (contiguous); 1024
  nat_2048  [W=6144,128] window from natural; 128 super-blocks
  nat_2048_tr  natural super-block DMA + in-kernel transpose to [64,W] i32
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
rng = np.random.default_rng(0)
x_nat = jnp.asarray(rng.standard_normal((N, CPAD)).astype(np.float32)).astype(jnp.bfloat16)
x_t = jnp.asarray(rng.integers(-2**30, 2**30, (C2, N)).astype(np.int32))


def run(name, transposed, B, W, extra_transpose=False, n=20):
    NB = N // B
    ws = jnp.minimum(jnp.arange(NB, dtype=jnp.int32) * B, N - W) & ~jnp.int32(127)

    def kern(ws_ref, src_hbm, o_ref, win, sem):
        i = pl.program_id(0)
        if transposed:
            cp = pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[i], 128), W)], win, sem)
        else:
            cp = pltpu.make_async_copy(
                src_hbm.at[pl.ds(pl.multiple_of(ws_ref[i], 128), W), :], win, sem)
        cp.start(); cp.wait()
        if extra_transpose:
            wt = jnp.swapaxes(win[:], 0, 1)  # [CPAD, W] bf16
            wi = pltpu.bitcast(wt.reshape(C2, 2, W), jnp.int32)[:, 0, :]
            o_ref[:] = jnp.zeros_like(o_ref) + wi[0, 0].astype(jnp.float32)
        elif transposed:
            o_ref[:] = jnp.zeros_like(o_ref) + win[0, 0].astype(jnp.float32)
        else:
            o_ref[:] = jnp.zeros_like(o_ref) + win[0, 0].astype(jnp.float32)

    win_shape = (C2, W) if transposed else (W, CPAD)
    win_dtype = jnp.int32 if transposed else jnp.bfloat16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((B, 128), lambda i, ws: (i, 0)),
        scratch_shapes=[pltpu.VMEM(win_shape, win_dtype),
                        pltpu.SemaphoreType.DMA(())])
    f = pl.pallas_call(kern, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32))
    src = x_t if transposed else x_nat
    jf = jax.jit(f)
    t0 = time.time(); o = jax.block_until_ready(jf(ws, src))
    print(f"{name}: compile+1st {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(n):
        o = jax.block_until_ready(jf(ws, src))
    dt = (time.time() - t0) / n
    gb = NB * (C2 * W * 4 if transposed else W * CPAD * 2) / 1e9
    print(f"{name}: {dt*1e3:.2f} ms  ({gb/dt:.0f} GB/s effective)", flush=True)


run("t_256", True, 256, 2048)
run("t_2048", True, 2048, 6144)
run("nat_256", False, 256, 2048)
run("nat_2048", False, 2048, 6144)
try:
    run("nat_2048_tr", False, 2048, 6144, extra_transpose=True)
except Exception as e:
    print("nat_2048_tr FAILED:", repr(e)[:400], flush=True)
