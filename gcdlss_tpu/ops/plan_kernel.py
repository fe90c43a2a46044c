"""Pallas candidates kernel for the column-decomposition rulebook build.

The column decomposition (see `plan._build_cube_neighbor_map`) reduces the
rulebook build to: one insertion-rank sort join for the (k^2-1) non-center
(dx, dy) column shifts, then — for every query — reading the <= k consecutive
table rows at its insertion point and key-diffing them into dz slots. The
sort is cheap (28 ms at 262k voxels for k=5); the candidate reads are
*monotone* gathers that XLA executes at ~7 ns/element (229 ms measured), and
the negation-symmetry transpose is an XLA scatter (113 ms). This module does
the candidate resolution for ALL columns (no transpose needed) in a Pallas
kernel with the same windowed-VMEM monotone-gather machinery as
`ops/fused_conv`:

  * one DMA stages a W-row window of the (hi, lo) key table per 256-query
    block (keys packed as an [8, cap] int32 array: row 0 = hi, row 1 = lo),
  * per column, lane dynamic-gathers read the k candidate rows from a
    128-aligned sub-window; key compares assign each to its dz slot,
  * the center column needs no join: its candidates are the block's own
    neighborhood rows,
  * output is the full neighbor map in transposed [K8, cap] layout (the
    host transposes once into the public [cap, K] order).

Entries whose candidate run falls outside the sub-window are counted on the
host; when any exist (never observed on real scans) the caller falls back to
the XLA build via `lax.cond`.

Replaces the per-offset sort-merge joins for full k^3 kernels: the k=5 stem
join was 307 ms at 262k voxels; sort+kernel target is ~35 ms.
"""

from __future__ import annotations

import functools
import itertools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from .coords import FIELD, SENTINEL_HI, SENTINEL_LO

# python-int copies for in-kernel use (the jnp module constants are device
# values and would be captured as tracer constants by pallas_call)
_SENT_HI = (1 << 31) - 1
_SENT_LO = (1 << 31) - 1

BLOCK = 256
WINDOW = 2048
# sub-window: insertion-rank spreads within a block exceed true-neighbor
# spreads on a few blocks per scan (measured 2 far entries at SUBWIN=512,
# 13% fill — absorbed exactly by repair_far_pairs); 512 keeps the unrolled
# tile loop at 4 tiles, which bounds the Mosaic compile time
SUBWIN = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cube_offsets(k1: int) -> np.ndarray:
    r = range(-(k1 // 2), k1 // 2 + 1)
    return np.array(list(itertools.product(r, r, r)), dtype=np.int32)


def _kernel(ws_ref, ss_ref, tbl_hbm, own_ref, rel_ref, o_ref, win, sem,
            *, B, W, WK, K1, NC1, CC):
    """One grid step resolves all columns' candidates for B queries.

    ws_ref: [NB] window starts. ss_ref: [NB, NCpad] per-column sub-starts
    (slot NC1 = center). own_ref: [8, B] block's own keys (rows 0, 1).
    rel_ref: [NCpad, B] sub-window-relative candidate bases (-1 invalid;
    slot NC1 = center base). Output: [NCOLS*8, B] neighbor rows (-1
    absent): column col's dz slots live at rows col*8 + dz (rows
    col*8 + K1 .. col*8 + 7 unused) — 8-aligned sublane blocks keep every
    store a full-vreg write.

    Body-size discipline (the Mosaic compile through this rig's remote
    tunnel is superlinear in unrolled op count — the previous per-m gather
    loop put the k=5 body at ~8.5k vector ops and >35 min of compile):
    the K1 m-values live on SUBLANES (m = sublane index), so one
    lane-gather per (tile, hi/lo) serves all m at once, and the per-tile
    hi/lo rows are broadcast to 8 sublanes with one `pltpu.repeat` each,
    hoisted out of the chunk loop.
    """
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        tbl_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[i], 128), W)], win, sem)
    cp.start()
    cp.wait()

    r = K1 // 2
    col_off = _cube_offsets(K1).reshape(K1 * K1, K1, 3)[:, 0, :2]
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)  # m = sublane

    def resolve_column(c_slot, dhi, dlo, col_idx):
        base = pl.multiple_of(ss_ref[i, c_slot], 128)
        # hoisted per-column tiles: hi/lo rows broadcast across sublanes
        tiles = []
        for t in range(WK // 128):
            tw = win[0:2, pl.ds(pl.multiple_of(base + t * 128, 128), 128)]
            tiles.append((pltpu.repeat(tw[0:1], 8, axis=0),
                          pltpu.repeat(tw[1:2], 8, axis=0)))
        for cch in range(B // 128):
            sl = slice(cch * 128, (cch + 1) * 128)
            hi_own = own_ref[0:1, sl]
            lo_own = own_ref[1:2, sl]
            vld = hi_own != _SENT_HI
            qh8 = pltpu.repeat(
                jnp.where(vld, hi_own + dhi, _SENT_HI), 8, axis=0)
            ql8 = pltpu.repeat(
                jnp.where(vld, lo_own + dlo, _SENT_LO), 8, axis=0)
            rel2 = rel_ref[c_slot:c_slot + 1, sl]  # [1, 128]
            rel8 = pltpu.repeat(rel2, 8, axis=0)
            relm8 = rel8 + m_iota  # [8, 128]
            # qh8 != SENT recovers vld (guards sentinel-to-sentinel key
            # "matches" on invalid rows); repeat() on i1 vregs is rejected
            # by Mosaic, so the mask is derived from the int vectors
            ok_base = (rel8 >= 0) & (qh8 != _SENT_HI)
            div8 = relm8 >> 7
            mod8 = relm8 & 127
            accH = jnp.zeros((8, 128), jnp.int32)
            accL = jnp.zeros((8, 128), jnp.int32)
            for t in range(WK // 128):
                tH, tL = tiles[t]
                sel = div8 == t
                accH = jnp.where(
                    sel, jnp.take_along_axis(tH, mod8, axis=1), accH)
                accL = jnp.where(
                    sel, jnp.take_along_axis(tL, mod8, axis=1), accL)
            delta8 = accL - ql8
            ok8 = (ok_base & (accH == qh8)
                   & (delta8 >= 0) & (delta8 <= 2 * r))
            # fold validity into delta: -1 never equals a dz slot (and i1
            # vregs cannot be repeat()ed on hardware)
            dok8 = jnp.where(ok8, delta8, -1)
            crow8 = ws_ref[i] + base + relm8
            # dz resolution: res[dz, :] = crow of the m whose delta == dz
            res = jnp.full((8, 128), -1, jnp.int32)
            dz_iota = m_iota
            for m in range(K1):
                dm = pltpu.repeat(dok8[m:m + 1], 8, axis=0)
                cm = pltpu.repeat(crow8[m:m + 1], 8, axis=0)
                res = jnp.where(dm == dz_iota, cm, res)
            o_ref[col_idx * 8:(col_idx + 1) * 8, sl] = res

    slot = 0
    for col_idx in range(K1 * K1):
        if col_idx == CC:
            resolve_column(NC1, 0, -r, CC)
            continue
        dx, dy = int(col_off[col_idx, 0]), int(col_off[col_idx, 1])
        # hi = b*FIELD + (x+OFF): +dx shifts x; lo = (y+OFF)*FIELD + (z+OFF)
        resolve_column(slot, dx, dy * FIELD - r, col_idx)
        slot += 1


def plan_cube_prepare(key_hi, key_lo, p, has, k1: int, block: int,
                      window: int, subwin: int):
    """Host-side (XLA) prep: window starts, sub-starts, relative bases.

    p/has: [nc1, cap] insertion ranks + has-match bits from
    `sorted_rank_match` for the non-center columns (product order, center
    skipped). No-match queries are excluded from the window mins AND from
    the far count — their p are boundary artifacts that would otherwise
    drag the sub-windows and fire the fallback on every real scan.
    """
    nc1, cap = p.shape
    nb = cap // block
    r = k1 // 2
    rows = jnp.arange(cap, dtype=jnp.int32)
    valid_q = key_hi != SENTINEL_HI
    # the center behaves like a column whose base candidate row is i - r
    pc = jnp.clip(rows - r, 0, cap - 1)[None, :]
    pall = jnp.concatenate([p, pc], axis=0)  # [nc, cap]
    hall = jnp.concatenate([has, valid_q[None, :]], axis=0)
    nc = nc1 + 1
    ncpad = _round_up(nc, 8)

    pb = jnp.where(hall, jnp.minimum(pall, cap - 1), cap - 1
                   ).reshape(nc, nb, block)
    hb = hall.reshape(nc, nb, block)
    mins = jnp.min(jnp.where(hb, pb, cap - 1), axis=2)  # [nc, NB]
    ws = jnp.clip(jnp.min(mins, axis=0), 0, max(cap - window, 0)
                  ).astype(jnp.int32) & ~jnp.int32(127)
    ss = jnp.clip(mins - ws[None, :], 0, window - subwin
                  ).astype(jnp.int32) & ~jnp.int32(127)  # [nc, NB]
    rel = (pb - (ws[None, :, None] + ss[:, :, None])).reshape(nc, cap)
    near = (rel >= 0) & (rel <= subwin - k1)
    relP = jnp.where(near & hall, rel, -1).astype(jnp.int32)
    far_count = jnp.sum((hall & ~near).astype(jnp.int32))
    relP = jnp.concatenate(
        [relP, jnp.full((ncpad - nc, cap), -1, jnp.int32)], axis=0)
    ss = jnp.concatenate(
        [ss, jnp.zeros((ncpad - nc, nb), jnp.int32)], axis=0).T  # [NB, ncpad]
    tbl = jnp.concatenate([
        key_hi[None, :], key_lo[None, :],
        jnp.zeros((6, cap), jnp.int32)], axis=0)  # [8, cap]
    return ws, ss, relP, tbl, far_count


@functools.partial(jax.jit, static_argnames=("k1", "block", "window",
                                             "subwin", "interpret"))
def cube_neighbor_map_kernel(key_hi, key_lo, p, has, *, k1: int,
                             block: int = BLOCK, window: int = WINDOW,
                             subwin: int = SUBWIN, interpret: bool = False):
    """([cap, k1^3] neighbor map, far_count) given insertion ranks p.

    Out-of-subwindow runs are repaired exactly by `repair_far_pairs`;
    overflow > 0 (more than REPAIR_CAP flagged pairs — never observed)
    means the map is incomplete and the caller must fall back.
    """
    cap = key_hi.shape[0]
    nb = cap // block
    nc1 = p.shape[0]
    ncpad = _round_up(nc1 + 1, 8)
    kk = k1 ** 3
    ncols = k1 * k1
    cc = (ncols - 1) // 2  # center column index

    ws, ss, relP, tbl, far_count = plan_cube_prepare(
        key_hi, key_lo, p, has, k1, block, window, subwin)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, block), lambda i, ws, ss: (0, i)),
            pl.BlockSpec((ncpad, block), lambda i, ws, ss: (0, i)),
        ],
        out_specs=pl.BlockSpec((ncols * 8, block), lambda i, ws, ss: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((8, window), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    nbrT8 = pl.pallas_call(
        functools.partial(_kernel, B=block, W=window, WK=subwin, K1=k1,
                          NC1=nc1, CC=cc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ncols * 8, cap), jnp.int32),
        interpret=interpret,
    )(ws, ss, tbl, tbl, relP)
    # rows col*8 + dz -> flat product order col*K1 + dz
    nbrT = nbrT8.reshape(ncols, 8, cap)[:, :k1].reshape(kk, cap)
    rows_all = jnp.arange(cap, dtype=jnp.int32)
    pc = jnp.clip(rows_all - (k1 // 2), 0, cap - 1)[None, :]
    valid_q = (key_hi != _SENT_HI)[None, :]
    p_ext = jnp.concatenate([p, pc], axis=0)
    has_ext = jnp.concatenate([has, valid_q], axis=0)
    nbr, overflow = repair_far_pairs(
        nbrT.T, key_hi, key_lo, p_ext, has_ext, k1, block, ws, ss,
        subwin)
    return nbr, overflow


# ws [nb] + ss [nb, ncpad] are scalar-prefetched into the 1 MB SMEM, and
# the staging pads ss's minor dim to 128 lanes: the batch-8 stem (cap
# 552960, nb 2160, k5) failed with an SMEM allocation of EXACTLY
# nb*128*4 = 1105920 bytes (2026-08-17 HW logs). v2 splits bigger maps into
# grid chunks of <= NB_MAX blocks (see cube_neighbor_map_kernel_v2); v1 is
# not chunked and stays gated.
NB_MAX = int(os.environ.get("GCDLSS_PLAN_NB_MAX", "1536"))


def supported(cap: int, k1: int, version: int = 2) -> bool:
    nb = cap // BLOCK
    ok = (_HAS_PLTPU and cap % BLOCK == 0 and cap >= WINDOW
          and k1 in (3, 5))
    if version != 2:
        ok = ok and nb * (128 + 1) * 4 <= 896 * 1024
    return ok


# --------------------------------------------------------------------------
# v2: boundary-rank planning + in-kernel two-level count
#
# v1 computes an exact insertion rank for EVERY (query, column) pair with one
# (k^2)·cap-row sort join (`sorted_rank_match`) — 45 of the 49 ms of the k=3
# map at 262k voxels. v2 exploits that each column's query sequence is the
# sorted table shifted by a constant (hence itself sorted): insertion ranks
# are monotone within a block, so ranks of the nb+1 BLOCK-BOUNDARY queries
# bracket every rank inside. The sort volume drops from (k^2-1)·cap to
# cap + (k^2-1)·nb rows (~256x fewer queries), window planning runs on
# [nc, nb] instead of [nc, cap] arrays, and the kernel recovers each query's
# exact rank inside its 512-entry sub-window with a two-level strided count
# (stride 32 -> stride 4) over the already-hoisted VMEM tiles. The stride-4
# bracket costs no extra gather: candidates live at base + m for
# m in 0..k1+2 <= 7, which the existing 8-sublane gather already fetches.
# --------------------------------------------------------------------------


def _column_shifts(k1: int):
    """dhi/dlo per non-center column (product order), center excluded."""
    r = k1 // 2
    ncols = k1 * k1
    cc = (ncols - 1) // 2
    col_off = _cube_offsets(k1).reshape(ncols, k1, 3)[:, 0, :2]
    sel = [c for c in range(ncols) if c != cc]
    dxy = np.asarray(col_off[sel], np.int32)
    return (np.ascontiguousarray(dxy[:, 0]),
            np.ascontiguousarray(dxy[:, 1] * FIELD - r))


def boundary_ranks(valid, key_hi, key_lo, k1: int, block: int):
    """[nc1, nb+1] insertion ranks of each column's block-boundary queries
    (bnd[c, nb] = number of valid rows: every rank is < that)."""
    from .join import sorted_rank

    cap = valid.shape[0]
    nb = cap // block
    dhi_np, dlo_np = _column_shifts(k1)
    dhi = jnp.asarray(dhi_np, jnp.int32)[:, None]
    dlo = jnp.asarray(dlo_np, jnp.int32)[:, None]
    rows = jnp.arange(nb, dtype=jnp.int32) * block
    v = valid[rows][None, :]
    qh = jnp.where(v, key_hi[rows][None, :] + dhi, SENTINEL_HI)
    ql = jnp.where(v, key_lo[rows][None, :] + dlo, SENTINEL_LO)
    p = sorted_rank(key_hi, key_lo, qh.reshape(-1), ql.reshape(-1))
    nc1 = dhi_np.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return jnp.concatenate(
        [p.reshape(nc1, nb),
         jnp.broadcast_to(n_valid, (nc1, 1)).astype(jnp.int32)], axis=1)


def plan_cube_prepare_v2(key_hi, key_lo, bnd, k1: int, block: int,
                         window: int, subwin: int):
    """Window starts / per-column sub-starts / far flags from boundary
    ranks only (all [nc, nb]-sized — no per-query arrays).

    A (column, block) pair is flagged far when its bracketed rank span
    [bnd(c,b), bnd(c,b+1)+k1-1] does not fit the 128-aligned sub-window;
    flagged pairs are completed exactly by `repair_far_pairs_v2`.
    """
    cap = key_hi.shape[0]
    nb = cap // block
    r = k1 // 2
    nc1 = bnd.shape[0]
    nc = nc1 + 1
    ncpad = _round_up(nc, 8)

    blocks = jnp.arange(nb, dtype=jnp.int32)
    n_valid = bnd[0, nb]
    # center pseudo-column: base candidate row of query i is i - r; only
    # valid rows (the first n_valid — sentinels sort last) need coverage
    bnd_c = jnp.clip(blocks * block - r, 0, n_valid)[None, :]
    lo_all = jnp.concatenate([bnd[:, :nb], bnd_c], axis=0)  # [nc, nb]
    hi_all = jnp.concatenate(
        [bnd[:, 1:],
         jnp.clip((blocks + 1) * block - r, 0, n_valid)[None, :]],
        axis=0)

    ws = jnp.clip(jnp.min(lo_all, axis=0), 0, max(cap - window, 0)
                  ).astype(jnp.int32) & ~jnp.int32(127)
    ss = jnp.clip(lo_all - ws[None, :], 0, window - subwin
                  ).astype(jnp.int32) & ~jnp.int32(127)  # [nc, nb]
    far = (hi_all + k1 - 1) >= (ws[None, :] + ss + subwin)
    far_count = jnp.sum(far.astype(jnp.int32))
    ssP = jnp.concatenate(
        [ss, jnp.zeros((ncpad - nc, nb), jnp.int32)], axis=0).T  # [NB, ncpad]
    tbl = jnp.concatenate([
        key_hi[None, :], key_lo[None, :],
        jnp.zeros((6, cap), jnp.int32)], axis=0)  # [8, cap]
    return ws, ssP, tbl, far, far_count


def _kernel_v2(ws_ref, ss_ref, tbl_hbm, own_ref, o_ref, win, sem,
               *, B, W, WK, K1, NC1, CC, OFF=0):
    """v2 grid step: like `_kernel` but the per-query candidate base is
    recovered IN-KERNEL by a two-level strided count over the sub-window
    (stride 32 bracket -> stride 4 refine), so no per-query rank array is
    staged or sorted. The table is sorted and the sub-window covers every
    query's insertion rank (guaranteed by `plan_cube_prepare_v2`, repaired
    otherwise), hence rank = #(entries < query) restricted to the
    sub-window, and candidates live at base + m, m in 0..K1+2."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        tbl_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[i], 128), W)], win, sem)
    cp.start()
    cp.wait()

    r = K1 // 2
    col_off = _cube_offsets(K1).reshape(K1 * K1, K1, 3)[:, 0, :2]
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)  # m = sublane
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    idx_l1 = (m_iota & 3) * 32  # L1 lane index per sublane (const)
    sel_lo4 = m_iota < 4

    def count_lt(th, tl, qh8, ql8, acc):
        lt = (th < qh8) | ((th == qh8) & (tl < ql8))
        return acc + lt.astype(jnp.int32)

    def resolve_column(c_slot, dhi, dlo, col_idx, center):
        base_ss = pl.multiple_of(ss_ref[i, c_slot], 128)
        tiles = []
        for t in range(WK // 128):
            tw = win[0:2, pl.ds(pl.multiple_of(base_ss + t * 128, 128), 128)]
            tiles.append((pltpu.repeat(tw[0:1], 8, axis=0),
                          pltpu.repeat(tw[1:2], 8, axis=0)))
        n_m = K1 if center else K1 + 3
        for cch in range(B // 128):
            sl = slice(cch * 128, (cch + 1) * 128)
            hi_own = own_ref[0:1, sl]
            lo_own = own_ref[1:2, sl]
            vld = hi_own != _SENT_HI
            qh8 = pltpu.repeat(
                jnp.where(vld, hi_own + dhi, _SENT_HI), 8, axis=0)
            ql8 = pltpu.repeat(
                jnp.where(vld, lo_own + dlo, _SENT_LO), 8, axis=0)
            if center:
                # exact base: query row is OFF + i*B + cch*128 + lane (OFF =
                # grid-chunk row offset, 0 unchunked — the python-level
                # branch keeps the unchunked trace byte-identical for the
                # compile cache); its first candidate is that row - r
                # (clamped at the array start), sub-window-relative
                row0 = (i * B + OFF) if OFF else (i * B)
                rel2 = (row0 + cch * 128 - r
                        - ws_ref[i] - base_ss) + lane_iota
                rel2 = jnp.maximum(rel2, -(ws_ref[i] + base_ss))
            else:
                # L1: entries at stride 32 (16 of them); entry (g*8+i) sits
                # in tile 2g + (i>>2) at lane (i&3)*32 — constant indices,
                # so the "gather" lowers to cheap sublane-uniform selects
                acc = jnp.zeros((8, 128), jnp.int32)
                for g in range(WK // 256):
                    thA = jnp.take_along_axis(tiles[2 * g][0], idx_l1, axis=1)
                    thB = jnp.take_along_axis(
                        tiles[2 * g + 1][0], idx_l1, axis=1)
                    tlA = jnp.take_along_axis(tiles[2 * g][1], idx_l1, axis=1)
                    tlB = jnp.take_along_axis(
                        tiles[2 * g + 1][1], idx_l1, axis=1)
                    th = jnp.where(sel_lo4, thA, thB)
                    tl = jnp.where(sel_lo4, tlA, tlB)
                    acc = count_lt(th, tl, qh8, ql8, acc)
                c32 = jnp.sum(acc, axis=0, keepdims=True)  # [1, 128]
                b32 = jnp.maximum(c32 - 1, 0) * 32
                # L2: 8 entries at b32 + m*4 (dynamic lane-varying index)
                idx2 = pltpu.repeat(b32, 8, axis=0) + m_iota * 4
                dv2 = idx2 >> 7
                md2 = idx2 & 127
                th2 = jnp.zeros((8, 128), jnp.int32)
                tl2 = jnp.zeros((8, 128), jnp.int32)
                for t in range(WK // 128):
                    s = dv2 == t
                    th2 = jnp.where(
                        s, jnp.take_along_axis(tiles[t][0], md2, axis=1), th2)
                    tl2 = jnp.where(
                        s, jnp.take_along_axis(tiles[t][1], md2, axis=1), tl2)
                c4 = jnp.sum(
                    count_lt(th2, tl2, qh8, ql8, jnp.zeros((8, 128), jnp.int32)),
                    axis=0, keepdims=True)
                rel2 = (b32 + jnp.maximum(c4 - 1, 0) * 4
                        + (c4 > 0).astype(jnp.int32))
            rel8 = pltpu.repeat(rel2, 8, axis=0)
            relm8 = rel8 + m_iota
            ok_base = (rel8 >= 0) & (relm8 < WK) & (qh8 != _SENT_HI)
            div8 = relm8 >> 7
            mod8 = relm8 & 127
            accH = jnp.zeros((8, 128), jnp.int32)
            accL = jnp.zeros((8, 128), jnp.int32)
            for t in range(WK // 128):
                tH, tL = tiles[t]
                s = div8 == t
                accH = jnp.where(
                    s, jnp.take_along_axis(tH, mod8, axis=1), accH)
                accL = jnp.where(
                    s, jnp.take_along_axis(tL, mod8, axis=1), accL)
            delta8 = accL - ql8
            ok8 = (ok_base & (accH == qh8)
                   & (delta8 >= 0) & (delta8 <= 2 * r))
            dok8 = jnp.where(ok8, delta8, -1)
            crow8 = ws_ref[i] + base_ss + relm8
            res = jnp.full((8, 128), -1, jnp.int32)
            dz_iota = m_iota
            for m in range(n_m):
                dm = pltpu.repeat(dok8[m:m + 1], 8, axis=0)
                cm = pltpu.repeat(crow8[m:m + 1], 8, axis=0)
                res = jnp.where(dm == dz_iota, cm, res)
            o_ref[col_idx * 8:(col_idx + 1) * 8, sl] = res

    slot = 0
    for col_idx in range(K1 * K1):
        if col_idx == CC:
            resolve_column(NC1, 0, -r, CC, True)
            continue
        dx, dy = int(col_off[col_idx, 0]), int(col_off[col_idx, 1])
        resolve_column(slot, dx, dy * FIELD - r, col_idx, False)
        slot += 1


@functools.partial(jax.jit, static_argnames=("k1", "block", "window",
                                             "subwin", "interpret"))
def cube_neighbor_map_kernel_v2(key_hi, key_lo, valid, *, k1: int,
                                block: int = BLOCK, window: int = WINDOW,
                                subwin: int = SUBWIN,
                                interpret: bool = False):
    """([cap, k1^3] neighbor map, far_count) with boundary-rank planning.

    Unlike v1 this computes its own (tiny) rank join; callers pass only the
    sorted unique keys. Flagged (column, block) pairs are completed exactly
    by `repair_far_pairs_v2`; overflow > 0 means fallback needed.
    """
    cap = key_hi.shape[0]
    nb = cap // block
    ncols = k1 * k1
    nc1 = ncols - 1
    ncpad = _round_up(nc1 + 1, 8)
    kk = k1 ** 3
    cc = (ncols - 1) // 2

    bnd = boundary_ranks(valid, key_hi, key_lo, k1, block)
    ws, ss, tbl, far, far_count = plan_cube_prepare_v2(
        key_hi, key_lo, bnd, k1, block, window, subwin)

    def call(ws_c, ss_c, own_c, nb_c, off):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb_c,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, block), lambda i, ws, ss: (0, i)),
            ],
            out_specs=pl.BlockSpec((ncols * 8, block),
                                   lambda i, ws, ss: (0, i)),
            scratch_shapes=[
                pltpu.VMEM((8, window), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel_v2, B=block, W=window, WK=subwin,
                              K1=k1, NC1=nc1, CC=cc, OFF=off),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ncols * 8, nb_c * block),
                                           jnp.int32),
            interpret=interpret,
        )(ws_c, ss_c, tbl, own_c)

    if nb <= NB_MAX:
        nbrT8 = call(ws, ss, tbl, nb, 0)
    else:
        # grid-chunked: the scalar-prefetch ss stages at nb*128*4 bytes of
        # the 1 MB SMEM (minor dim padded to 128 lanes) — split into equal
        # chunks over the same kernel. Padded tail blocks query sentinel
        # keys and resolve to -1; the center column needs the chunk's
        # absolute row offset (OFF).
        nch = -(-nb // NB_MAX)
        nbc = -(-nb // nch)
        nbp = nch * nbc
        ws_p = jnp.concatenate([ws, jnp.zeros((nbp - nb,), jnp.int32)])
        ss_p = jnp.concatenate(
            [ss, jnp.zeros((nbp - nb, ss.shape[1]), jnp.int32)], axis=0)
        pad = jnp.full((2, (nbp - nb) * block), _SENT_HI, jnp.int32)
        own_p = jnp.concatenate(
            [tbl, jnp.concatenate(
                [pad, jnp.zeros((6, (nbp - nb) * block), jnp.int32)],
                axis=0)], axis=1)
        chunks = [
            call(ws_p[c * nbc:(c + 1) * nbc], ss_p[c * nbc:(c + 1) * nbc],
                 own_p[:, c * nbc * block:(c + 1) * nbc * block], nbc,
                 c * nbc * block)
            for c in range(nch)
        ]
        nbrT8 = jnp.concatenate(chunks, axis=1)[:, :cap]
    nbrT = nbrT8.reshape(ncols, 8, cap)[:, :k1].reshape(kk, cap)
    nbr, overflow = repair_far_pairs_v2(
        nbrT.T, key_hi, key_lo, valid, far, k1, block)
    return nbr, overflow


def repair_far_pairs_v2(nbr, key_hi, key_lo, valid, far, k1: int, block: int):
    """Exact completion for flagged (column, block) pairs: compute those
    pairs' per-query insertion ranks with a mini rank join (<= REPAIR_CAP *
    block queries vs v1's (k^2-1) * cap) and max-merge their key-diffed
    candidates, reusing the same m-loop as `repair_far_pairs`."""
    from .join import sorted_rank

    cap = key_hi.shape[0]
    nb = cap // block
    r = k1 // 2
    ncols = k1 * k1
    cc = (ncols - 1) // 2
    col_map = np.array([c for c in range(ncols) if c != cc] + [cc], np.int32)

    fb = far  # [nc, nb]
    n_far_pairs = jnp.sum(fb.astype(jnp.int32))
    (pair_idx,) = jnp.nonzero(fb.reshape(-1), size=REPAIR_CAP, fill_value=-1)
    overflow = jnp.maximum(n_far_pairs - REPAIR_CAP, 0)

    c_j = jnp.where(pair_idx >= 0, pair_idx // nb, 0)
    b_j = jnp.where(pair_idx >= 0, pair_idx % nb, 0)
    rows = b_j[:, None] * block + jnp.arange(block, dtype=jnp.int32)[None, :]
    hj = valid[rows] & (pair_idx >= 0)[:, None]

    col_dxy = _cube_offsets(k1).reshape(ncols, k1, 3)[:, 0, :2]
    dhi_np = col_dxy[col_map][:, 0].copy()
    dlo_np = (col_dxy[col_map][:, 1] * FIELD - r).copy()
    dhi_np[-1] = 0
    dlo_np[-1] = -r
    dhi_t = jnp.asarray(dhi_np, jnp.int32)
    dlo_t = jnp.asarray(dlo_np, jnp.int32)
    qh = jnp.where(hj, key_hi[rows] + dhi_t[c_j][:, None], SENTINEL_HI)
    ql = jnp.where(hj, key_lo[rows] + dlo_t[c_j][:, None], SENTINEL_LO)
    pj = sorted_rank(
        key_hi, key_lo, qh.reshape(-1), ql.reshape(-1)
    ).reshape(qh.shape)
    flat_col = jnp.asarray(col_map, jnp.int32)[c_j]

    out = nbr
    kk = k1 ** 3
    for m in range(k1):
        crow = jnp.clip(pj + m, 0, cap - 1)
        chi = key_hi[crow]
        clo = key_lo[crow]
        delta = clo - ql
        ok = hj & (chi == qh) & (delta >= 0) & (delta <= 2 * r)
        pos = jnp.where(
            ok, rows * kk + flat_col[:, None] * k1 + delta, cap * kk)
        out = out.reshape(-1).at[pos.reshape(-1)].max(
            jnp.where(ok, crow, -1).reshape(-1), mode="drop").reshape(cap, kk)
    return out, overflow


REPAIR_CAP = 64  # flagged (block, column) pairs repaired exactly in XLA


def repair_far_pairs(nbr, key_hi, key_lo, p, has, k1: int, block: int,
                     ws, ss, subwin: int):
    """See below — operates on the EXTENDED column list (non-center columns
    in product order + the center as the last pseudo-column, matching
    plan_cube_prepare's pall/hall layout); the window clip at the array end
    can push even center entries out of range (observed: the last row's
    self-entry)."""
    """Exact completion for (block, column) pairs with out-of-subwindow runs.

    Far entries are structural: blocks straddling batch/x-slice key-space
    discontinuities have bimodal insertion-rank clusters no single window
    covers. They are few (boundary blocks only), so: flag pairs on a tiny
    [nc, NB] grid, gather those pairs' candidates directly (XLA gathers,
    bounded by REPAIR_CAP*block*k1 elements), and max-merge into the map.
    Returns (nbr, overflow) — overflow > 0 means more than REPAIR_CAP pairs
    (fallback needed; never observed).
    """
    nc, cap = p.shape  # nc = nc1 + 1 (center last)
    nb = cap // block
    r = k1 // 2
    ncols = k1 * k1
    cc = (ncols - 1) // 2
    col_map = np.array([c for c in range(ncols) if c != cc] + [cc], np.int32)

    pb = p.reshape(nc, nb, block)
    hb = has.reshape(nc, nb, block)
    rel = pb - (ws[None, :, None] + ss.T[:nc, :, None])
    far = hb & ~((rel >= 0) & (rel <= subwin - k1))
    fb = jnp.any(far, axis=2)  # [nc, NB]
    n_far_pairs = jnp.sum(fb.astype(jnp.int32))
    (pair_idx,) = jnp.nonzero(fb.reshape(-1), size=REPAIR_CAP, fill_value=-1)
    overflow = jnp.maximum(n_far_pairs - REPAIR_CAP, 0)

    c_j = jnp.where(pair_idx >= 0, pair_idx // nb, 0)
    b_j = jnp.where(pair_idx >= 0, pair_idx % nb, 0)
    rows = b_j[:, None] * block + jnp.arange(block, dtype=jnp.int32)[None, :]
    pj = p[c_j[:, None], rows]  # [RC, block]
    hj = has[c_j[:, None], rows] & (pair_idx >= 0)[:, None]
    # query keys for these pairs
    col_dxy = _cube_offsets(k1).reshape(ncols, k1, 3)[:, 0, :2]
    dhi_np = col_dxy[col_map][:, 0].copy()
    dlo_np = (col_dxy[col_map][:, 1] * FIELD - r).copy()
    # center pseudo-column (last slot): its own-key window base is z - r
    dhi_np[-1] = 0
    dlo_np[-1] = -r
    dhi_t = jnp.asarray(dhi_np, jnp.int32)
    dlo_t = jnp.asarray(dlo_np, jnp.int32)
    qh = key_hi[rows] + dhi_t[c_j][:, None]
    ql = key_lo[rows] + dlo_t[c_j][:, None]
    flat_col = jnp.asarray(col_map, jnp.int32)[c_j]  # real column index

    out = nbr
    for m in range(k1):
        crow = jnp.clip(pj + m, 0, cap - 1)
        chi = key_hi[crow]
        clo = key_lo[crow]
        delta = clo - ql
        ok = hj & (chi == qh) & (delta >= 0) & (delta <= 2 * r)
        # scatter into nbr[row, flat_col*k1 + delta]
        kk = k1 ** 3
        pos = jnp.where(
            ok, rows * kk + flat_col[:, None] * k1 + delta, cap * kk)
        out = out.reshape(-1).at[pos.reshape(-1)].max(
            jnp.where(ok, crow, -1).reshape(-1), mode="drop").reshape(cap, kk)
    return out, overflow
