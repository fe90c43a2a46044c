"""Pallas TPU kernel: windowed fused gather-GEMM for submanifold sparse conv.

The XLA gather-conv streams ~K x N x C bytes from HBM per conv because each
offset's row-gather re-reads features at random. But the plan keeps voxels
sorted by (batch, x, y, z), so a voxel's k^3 neighbors live within a bounded
row *window* (a dx=+-1 hop is one x-slice away — typically a few hundred rows
on KITTI). This kernel exploits the ~K-fold reuse:

  grid over output row-blocks; for block i
    - the input window x[start_i : start_i + B + 2H] is DMA-staged into VMEM
      once (start_i precomputed, scalar-prefetched),
    - neighbor indices are rebased to the window (precomputed in XLA),
    - out[block] = sum_k window[rel[:, k]] @ W[k] — VMEM gathers feeding MXU
      matmuls.

Entries whose neighbor falls outside the window ("far" pairs — rare on sorted
LiDAR data) are finished by a standard XLA gather-conv pass over the far-only
rulebook, so results are exact. `window_stats` reports the far fraction.

Status: experimental (off by default). Correctness is validated in interpret
mode and against `gather_conv`; flip on after hardware profiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pltpu imports cleanly only where TPU support exists
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def rebase_neighbors(nbr: jax.Array, block: int, halo: int):
    """Split the rulebook into near (window-relative) and far entries.

    Returns (starts [n_blocks] window starts, rel [N, K] window-relative
    indices, near [N, K] bool, far_nbr [N, K] = nbr where far else -1).
    """
    n, k = nbr.shape
    wsize = block + 2 * halo
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    win_start = jnp.clip((rows // block) * block - halo, 0, max(n - wsize, 0))
    rel = nbr - win_start
    near = (nbr >= 0) & (rel >= 0) & (rel < wsize)
    rel = jnp.where(near, rel, 0)
    far_nbr = jnp.where((nbr >= 0) & ~near, nbr, -1)
    starts = jnp.clip(
        jnp.arange(n // block, dtype=jnp.int32) * block - halo,
        0,
        max(n - wsize, 0),
    )
    return starts, rel.astype(jnp.int32), near, far_nbr


def _kernel(starts_ref, x_hbm, rel_ref, mask_ref, w_ref, o_ref, xwin, sem,
            *, wsize, k):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(starts_ref[i], wsize), :], xwin, sem
    )
    cp.start()
    cp.wait()
    block = o_ref.shape[0]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for j in range(k):
        # Mosaic's dynamic gather wants len(indices) == len(input): pad the
        # block's indices to the window length, gather, then slice back
        idx_full = jnp.pad(rel_ref[:, j], (0, wsize - block))
        g = jnp.take(xwin[:], idx_full, axis=0)[:block]
        g = g * mask_ref[:, j][:, None]
        acc = acc + jnp.dot(g, w_ref[j], preferred_element_type=jnp.float32)
    o_ref[:] = acc


def windowed_gather_conv(
    feats: jax.Array,
    nbr: jax.Array,
    weight: jax.Array,
    *,
    block: int = 512,
    halo: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """Fused windowed conv (near part in Pallas, far remainder in XLA)."""
    from .conv import gather_conv

    n, c = feats.shape
    k = nbr.shape[1]
    co = weight.shape[2]
    assert n % block == 0, "capacity must be a multiple of block"
    wsize = block + 2 * halo
    starts, rel, near, far_nbr = rebase_neighbors(nbr, block, halo)
    mask = near.astype(feats.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # feats stay in HBM
            pl.BlockSpec((block, k), lambda i, s: (i, 0)),
            pl.BlockSpec((block, k), lambda i, s: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full weight
        ],
        out_specs=pl.BlockSpec((block, co), lambda i, s: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((wsize, c), feats.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    near_out = pl.pallas_call(
        functools.partial(_kernel, wsize=wsize, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, co), jnp.float32),
        interpret=interpret,
    )(starts, feats, rel, mask, weight)

    far_out = gather_conv(feats, far_nbr, weight)
    return (near_out + far_out).astype(feats.dtype)


def windowed_gather_conv_ref(feats, nbr, weight, *, block=512, halo=4096):
    """Pure-XLA twin of the windowed decomposition (validates the rebase)."""
    from .conv import gather_conv

    n = feats.shape[0]
    starts, rel, near, far_nbr = rebase_neighbors(nbr, block, halo)
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    wsize = block + 2 * halo
    win_start = jnp.clip((rows // block) * block - halo, 0, max(n - wsize, 0))
    near_nbr = jnp.where(near, rel + win_start, -1)
    out_near = gather_conv(feats, near_nbr, weight)
    out_far = gather_conv(feats, far_nbr, weight)
    return out_near + out_far


def window_stats(nbr: jax.Array, block: int = 512, halo: int = 4096):
    """Fraction of rulebook entries outside the window (tuning aid)."""
    _, _, near, far_nbr = rebase_neighbors(nbr, block, halo)
    total = jnp.sum((nbr >= 0).astype(jnp.int32))
    far = jnp.sum((far_nbr >= 0).astype(jnp.int32))
    return far / jnp.maximum(total, 1)
