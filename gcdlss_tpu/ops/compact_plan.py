"""Compacted per-offset rulebook: fill-only FLOPs for the forward conv.

The fused windowed kernel's block dot multiplies k8*cpad gst rows per
block, but the measured per-row fill is 3.5-9.2 of 32 (BENCH.md roofline)
— the dense dot wastes ~4.3x MXU FLOPs on zero rows. The waste is
row-level, so it cannot be skipped inside a weight-shared block dot.

This module builds the compacted layout (BENCH.md "round-4 design
sketch"): all present (offset k, out_row i, in_row nbr[i,k]) entries,
grouped by offset, each offset's segment padded to a 128 multiple:

  in_list  [F_cap]   input row per entry (-1 pad)         — monotone per
                                                            segment
  out_list [F_cap]   output row per entry (-1 pad)        — strictly
                                                            increasing per
                                                            segment
  pos      [N, K]    entry slot of (i, k), -1 absent       — a rulebook
                                                            over the
                                                            r-buffer
  tile_k   [F_cap/128] offset id per 128-entry tile (-1 pad tiles)
  count    int32     total padded entries; > F_cap means overflow (the
                     caller must poison, like the far path)

The forward then becomes
  r   = X[in_list] @ W[tile_k]     (kernel A: dense MXU on real rows)
  out = sum_k r[pos[:, k]]         (kernel B: windowed gather-accumulate)
and both gathers are windowed-monotone, scatter-free.

Everything is one pass of masked cumsums + three scatters — no sort: the
rulebook's columns are already (offset, out_row)-ordered.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ceil128(x):
    return (x + 127) & ~jnp.int32(127)


def compact_rulebook(nbr: jax.Array, f_cap: int):
    """Compacted per-offset entry lists for a [N, K] rulebook.

    f_cap must be a multiple of 128. Entries beyond f_cap are dropped and
    reported via `count` > f_cap (callers poison, as with FAR_CAP).
    """
    n, k = nbr.shape
    assert f_cap % 128 == 0
    present = nbr >= 0  # [N, K]
    m_k = jnp.sum(present.astype(jnp.int32), axis=0)  # [K]
    seg = _ceil128(m_k)  # padded segment sizes
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seg)[:-1]])  # [K]
    count = jnp.sum(seg)

    # slot of (i, k): segment start + rank of i among present rows of k
    rank = jnp.cumsum(present.astype(jnp.int32), axis=0) - 1  # [N, K]
    pos = jnp.where(present, start[None, :] + rank, -1).astype(jnp.int32)

    slot = jnp.where(present & (pos < f_cap), pos, f_cap)
    in_list = (
        jnp.full((f_cap + 1,), -1, jnp.int32)
        .at[slot.reshape(-1)]
        .set(jnp.where(present, nbr, -1).reshape(-1), mode="drop",
             unique_indices=True)[:f_cap]
    )
    row_i = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    out_list = (
        jnp.full((f_cap + 1,), -1, jnp.int32)
        .at[slot.reshape(-1)]
        .set(jnp.where(present, row_i, -1).reshape(-1), mode="drop",
             unique_indices=True)[:f_cap]
    )
    # mark fully-absent pad tiles: tile t belongs to offset k iff
    # start[k]/128 <= t < (start[k]+seg[k])/128 and holds >= 1 real entry
    # only in its first ceil(m_k/128) tiles; trailing pad tiles of a
    # segment still carry the segment's k (their in_list rows are -1 and
    # kernel A zero-masks them), so tile_k is just a segment decode:
    tiles = jnp.arange(f_cap // 128, dtype=jnp.int32) * 128
    tile_k = (
        jnp.searchsorted(jnp.cumsum(seg), tiles, side="right")
        .astype(jnp.int32)
    )
    tile_k = jnp.where(tiles < jnp.minimum(count, f_cap), tile_k, -1)
    # overflow also truncates pos entries beyond f_cap (absent in r):
    pos = jnp.where(pos < f_cap, pos, -1)
    return in_list, out_list, pos, tile_k, count


def pos_block_windows(pos: jax.Array, block: int, f_cap: int,
                      window: int = 512):
    """Per-(block, offset) windows over the r-buffer for kernel B.

    Within one `block` of output rows, an offset's positions are
    `segment_start + rank`, and ranks are monotone with span < block, so a
    `window`-row window per (block, offset) always contains every present
    position (block + 128 <= window) — kernel B is structurally far-free,
    unlike a shared per-block window (segments sit ~F/K apart, far beyond
    any single window; measured 11k far entries at a 2k-cap fixture).

    Returns (base [nb, k8] int32 128-aligned absolute starts, -1 where the
    offset is absent in the block; relT [nb*k8, block] window-relative
    positions, -1 absent).
    """
    n, k = pos.shape
    assert block + 128 <= window
    nb = n // block
    k8 = (k + 7) & ~7
    posT = jnp.full((n, k8), -1, jnp.int32)
    posT = jax.lax.dynamic_update_slice(posT, pos, (0, 0))
    posT = posT.reshape(nb, block, k8).transpose(0, 2, 1)  # [nb, k8, block]
    big = jnp.where(posT >= 0, posT, jnp.int32(1 << 30))
    mins = jnp.min(big, axis=2)  # [nb, k8]
    absent = mins >= (1 << 30)
    base = jnp.clip(jnp.where(absent, 0, mins), 0,
                    max(f_cap - window, 0)).astype(jnp.int32) & ~jnp.int32(127)
    rel = jnp.where(posT >= 0, posT - base[:, :, None], -1).astype(jnp.int32)
    base = jnp.where(absent, -1, base)
    return base, rel.reshape(nb * k8, block)
