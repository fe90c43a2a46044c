"""Measure window-DMA cost by source layout + window size on TPU.

Variants (all DMA-only kernels, total output rows N=262144):
  t_256     [C2,W=2048] window from transposed [C2,N] int32 (the fused
            kernels' current strided layout); 1024 blocks
  t_2048    [C2,W=6144] window from transposed; 128 super-blocks
  tile_256  [16,C2,128] window from tile-major [N/128,C2,128] int32 — one
            CONTIGUOUS chunk per window; 1024 blocks
  tile_256_dbuf  same, double-buffered (DMA for block i+1 overlaps block i)
  tilecp_256  16 per-tile contiguous copies from tile-major source straight
            into the kernels' existing [C2,W] window layout (no relayout)
  tilerl_256  one contiguous copy into [16*C2,128] + in-kernel static
            relayout to [C2,W] (16 VPU block moves)
  nat_256   [W=2048,128] window from natural [N,128] bf16 (contiguous); 1024
  nat_2048  [W=6144,128] window from natural; 128 super-blocks

Timing via tools/tpu_timing.device_time (block_until_ready does NOT
synchronize on the axon tunnel backend).
"""
import os, sys

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_timing import device_time

N = 262144
CPAD = 128
C2 = CPAD // 2
rng = np.random.default_rng(0)
x_nat = jnp.asarray(
    rng.standard_normal((N, CPAD)).astype(np.float32)).astype(jnp.bfloat16)
x_t = jnp.asarray(rng.integers(-2**30, 2**30, (C2, N)).astype(np.int32))
x_tile = jnp.asarray(np.ascontiguousarray(
    np.asarray(x_t).reshape(C2, N // 128, 128).transpose(1, 0, 2)))
x_tile2d = jnp.asarray(np.asarray(x_tile).reshape(-1, 128))


def run_tilecp(name, B, W, relayout=False, n=20):
    """Tile-major source; either WT per-tile copies into [C2, W], or one
    copy into [WT*C2, 128] + static relayout to [C2, W]."""
    NB = N // B
    WT = W // 128
    ws = (jnp.minimum(jnp.arange(NB, dtype=jnp.int32) * B, N - W)
          & ~jnp.int32(127))

    if not relayout:
        def kern(ws_ref, src_hbm, o_ref, win, sem):
            i = pl.program_id(0)
            t0 = (ws_ref[i] >> 7) * C2
            cps = [pltpu.make_async_copy(
                src_hbm.at[pl.ds(t0 + t * C2, C2), :],
                win.at[:, pl.ds(t * 128, 128)], sem)
                for t in range(WT)]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            o_ref[:] = jnp.zeros_like(o_ref) + win[0, 0].astype(jnp.float32)
        scratch = [pltpu.VMEM((C2, W), jnp.int32)]
    else:
        def kern(ws_ref, src_hbm, o_ref, wtile, win, sem):
            i = pl.program_id(0)
            t0 = (ws_ref[i] >> 7) * C2
            cp = pltpu.make_async_copy(
                src_hbm.at[pl.ds(t0, WT * C2), :], wtile, sem)
            cp.start()
            cp.wait()
            for t in range(WT):
                win[:, t * 128:(t + 1) * 128] = (
                    wtile[t * C2:(t + 1) * C2, :])
            o_ref[:] = jnp.zeros_like(o_ref) + win[0, 0].astype(jnp.float32)
        scratch = [pltpu.VMEM((WT * C2, 128), jnp.int32),
                   pltpu.VMEM((C2, W), jnp.int32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((B, 128), lambda i, ws: (i, 0)),
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA(())])
    f = pl.pallas_call(kern, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32))
    jf = jax.jit(f)
    dt = device_time(jf, ws, x_tile2d, n=n)
    gb = NB * C2 * W * 4 / 1e9
    print(f"{name}: {dt*1e3:.2f} ms  ({gb/dt:.0f} GB/s effective)",
          flush=True)


def run(name, layout, B, W, dbuf=False, n=20):
    NB = N // B
    ws = (jnp.minimum(jnp.arange(NB, dtype=jnp.int32) * B, N - W)
          & ~jnp.int32(127))
    WT = W // 128

    def copy(src_hbm, wsv, win, sem):
        if layout == "t":
            return pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(pl.multiple_of(wsv, 128), W)], win, sem)
        if layout == "tile":
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(
                    pl.multiple_of(wsv, 128) // 128, WT)], win, sem)
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(pl.multiple_of(wsv, 128), W), :], win, sem)

    if not dbuf:
        def kern(ws_ref, src_hbm, o_ref, win, sem):
            i = pl.program_id(0)
            cp = copy(src_hbm, ws_ref[i], win, sem)
            cp.start()
            cp.wait()
            if layout == "tile":
                o_ref[:] = (jnp.zeros_like(o_ref)
                            + win[0, 0, 0].astype(jnp.float32))
            else:
                o_ref[:] = (jnp.zeros_like(o_ref)
                            + win[0, 0].astype(jnp.float32))
        nwin = 1
    else:
        def kern(ws_ref, src_hbm, o_ref, win_a, win_b, sem):
            i = pl.program_id(0)
            nb = pl.num_programs(0)
            even = jax.lax.rem(i, 2) == 0

            @pl.when(i == 0)
            def _():
                copy(src_hbm, ws_ref[0], win_a, sem.at[0]).start()

            @pl.when((i + 1 < nb) & even)
            def _():
                copy(src_hbm, ws_ref[i + 1], win_b, sem.at[1]).start()

            @pl.when((i + 1 < nb) & ~even)
            def _():
                copy(src_hbm, ws_ref[i + 1], win_a, sem.at[0]).start()

            @pl.when(even)
            def _():
                copy(src_hbm, ws_ref[i], win_a, sem.at[0]).wait()

            @pl.when(~even)
            def _():
                copy(src_hbm, ws_ref[i], win_b, sem.at[1]).wait()
            if layout == "tile":
                o_ref[:] = (jnp.zeros_like(o_ref)
                            + win_a[0, 0, 0].astype(jnp.float32))
            else:
                o_ref[:] = (jnp.zeros_like(o_ref)
                            + win_a[0, 0].astype(jnp.float32))
        nwin = 2

    win_shape = {"t": (C2, W), "tile": (WT, C2, 128),
                 "nat": (W, CPAD)}[layout]
    win_dtype = jnp.bfloat16 if layout == "nat" else jnp.int32
    sem = (pltpu.SemaphoreType.DMA((2,)) if dbuf
           else pltpu.SemaphoreType.DMA(()))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((B, 128), lambda i, ws: (i, 0)),
        scratch_shapes=[pltpu.VMEM(win_shape, win_dtype)] * nwin + [sem])
    f = pl.pallas_call(kern, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32))
    src = {"t": x_t, "tile": x_tile, "nat": x_nat}[layout]
    jf = jax.jit(f)
    dt = device_time(jf, ws, src, n=n)
    gb = NB * (W * CPAD * 2 if layout == "nat" else C2 * W * 4) / 1e9
    print(f"{name}: {dt*1e3:.2f} ms  ({gb/dt:.0f} GB/s effective)",
          flush=True)


run("t_256", "t", 256, 2048)
run("t_2048", "t", 2048, 6144)
run("tile_256", "tile", 256, 2048)
run("tile_256_dbuf", "tile", 256, 2048, dbuf=True)
run_tilecp("tilecp_256", 256, 2048)
run_tilecp("tilerl_256", 256, 2048, relayout=True)
run("nat_256", "nat", 256, 2048)
run("nat_2048", "nat", 2048, 6144)
