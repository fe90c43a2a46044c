"""UNet sparse-convolution plan: per-level coordinates + kernel maps.

MinkowskiEngine builds kernel maps lazily in its C++ coordinate manager, one
hash lookup per (offset, stride) pair, per conv call.  On TPU we instead build
the *entire* network's rulebooks once per batch in a single jitted pass — the
maps depend only on coordinates, so teacher forward, student forward and the
backward pass all reuse the same plan (3× reuse per step; more with LaserMix).

Topology covered (MinkUNet34, reference `models/minkunet.py:59-132`):
  * level 0 (stride 1): stem conv k=5 (125 offsets) + decoder block8 k=3.
  * levels 1..4 (strides 2,4,8,16): residual blocks k=3 (27 offsets).
  * 4 strided convs k=2 s=2 down, 4 transpose convs k=2 s=2 up.

k2s2 convolutions have special structure we exploit: every fine voxel has
exactly one coarse parent (`c >> 1`) and a 3-bit offset code (`c & 1` per
axis), so the down conv is one wide matmul + segment-sum and the up (transpose)
conv is a gather + per-row weight selection — no neighbor search at all.
Coordinates are stored in *stride units*, so pooling is always `>> 1`.
"""

from __future__ import annotations

import itertools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .coords import (
    FIELD,
    SENTINEL_HI,
    SENTINEL_LO,
    encode_coords,
    sorted_unique,
    sorted_unique_nodup,
    sorted_unique_presorted,
    decode_keys,
)
from .join import sorted_join


def _offsets(k: int) -> np.ndarray:
    r = range(-(k // 2), k // 2 + 1)
    return np.array(list(itertools.product(r, r, r)), dtype=np.int32)


KERNEL_OFFSETS_3 = _offsets(3)  # [27, 3]
KERNEL_OFFSETS_5 = _offsets(5)  # [125, 3]


class LevelPlan(NamedTuple):
    coords: jax.Array  # [cap, 4] int32 (b,x,y,z) in stride units
    valid: jax.Array  # [cap] bool
    count: jax.Array  # int32 scalar
    nbr3: jax.Array  # [cap, 27] int32 neighbor rows for k=3 subm conv (-1 absent)
    key_hi: jax.Array  # [cap] sorted packed keys (for further lookups)
    key_lo: jax.Array


class PoolPlan(NamedTuple):
    parent: jax.Array  # [cap_fine] int32 row in coarse level (cap_coarse if invalid)
    dcode: jax.Array  # [cap_fine] int32 in [0,8): which k2 kernel offset
    # explicit k2s2 rulebooks for the fused pool-conv kernels (-1 absent):
    children: jax.Array = None  # [cap_coarse, 8] fine row per (parent, d)
    upmap: jax.Array = None  # [cap_fine, 8] parent row at slot d == dcode


class UNetPlan(NamedTuple):
    levels: tuple  # tuple[LevelPlan, ...] — strides 1,2,4,8,16
    pools: tuple  # tuple[PoolPlan, ...] — level l -> l+1
    stem_nbr: jax.Array  # [cap0, 125] k=5 neighbor map at level 0
    rep: jax.Array  # [cap0] input row -> representative original row (n_in pad)
    inverse: jax.Array  # [n_in] original row -> level-0 row (cap0 if dropped)


def _join_offsets(coords, valid, key_hi, key_lo, offsets, max_offsets_per_join):
    chunks = []
    for s in range(0, len(offsets), max_offsets_per_join):
        offs = jnp.asarray(offsets[s : s + max_offsets_per_join])  # [k, 3]
        k = offs.shape[0]
        q = coords[:, None, 1:4] + offs[None, :, :]  # [cap, k, 3]
        b = jnp.broadcast_to(coords[:, None, 0:1], (coords.shape[0], k, 1))
        qc = jnp.concatenate([b, q], axis=2).reshape(-1, 4)
        qv = jnp.broadcast_to(valid[:, None], (valid.shape[0], k)).reshape(-1)
        qh, ql = encode_coords(qc, qv)
        idx = sorted_join(key_hi, key_lo, qh, ql)
        chunks.append(idx.reshape(coords.shape[0], k))
    return jnp.concatenate(chunks, axis=1)


def _transpose_half(half_nbr: jax.Array, cap: int) -> jax.Array:
    """Adjoint columns: trans[j, half-1-k] = i iff half_nbr[i, k] = j."""
    half = half_nbr.shape[1]
    rows = jnp.arange(cap, dtype=jnp.int32)
    tcol = (half - 1) - jnp.arange(half, dtype=jnp.int32)[None, :]
    # absent entries get distinct out-of-bounds slots so unique_indices holds
    oob = cap * half + jnp.arange(cap * half, dtype=jnp.int32).reshape(cap, half)
    pos = jnp.where(half_nbr >= 0, half_nbr * half + tcol, oob)
    vals = jnp.broadcast_to(rows[:, None], (cap, half))
    return (
        jnp.full((cap * half,), -1, jnp.int32)
        .at[pos.reshape(-1)]
        .set(vals.reshape(-1), mode="drop", unique_indices=True)
        .reshape(cap, half)
    )


def _is_cube(offsets: np.ndarray) -> int:
    """If offsets is the full k^3 product list in order, return k, else 0."""
    kk = len(offsets)
    k1 = round(kk ** (1.0 / 3.0))
    if k1 ** 3 == kk and (offsets == _offsets(k1)).all():
        return int(k1)
    return 0


def build_neighbor_map(
    coords: jax.Array,
    valid: jax.Array,
    key_hi: jax.Array,
    key_lo: jax.Array,
    offsets: np.ndarray,
    max_offsets_per_join: int = 32,
    symmetric: bool = True,
) -> jax.Array:
    """[cap, K] neighbor row indices for submanifold conv (center included).

    For full k^3 kernels the build uses a COLUMN decomposition: voxel keys
    sort as (b, x, y, z), so for a fixed (dx, dy) the table rows matching
    z+dz for dz in [-r, r] are *consecutive*. One insertion-rank join
    (`sorted_rank`) per column at the window's lowest z locates the run;
    reading the <= k consecutive rows and key-diffing resolves every dz at
    once. Negation symmetry halves the joined columns (the other half is the
    transposed map) and the center column needs no join at all — candidate
    rows are i-r..i+r. Sort volume for the k=5 stem drops from (62+2)*N
    rows to 13*N (measured 307 ms -> see BENCH.md, v5e at 262k voxels).

    Non-cube offset lists fall back to per-offset sort-merge joins
    (transpose-halved when negation-symmetric in product order).
    """
    kk = len(offsets)
    cap = coords.shape[0]
    k1 = _is_cube(offsets)
    if k1:
        # On TPU: rank join + Pallas candidates kernel (ops/plan_kernel) —
        # one sort at 1/5 the volume of the per-offset joins, candidates at
        # VPU rate instead of XLA's ~7 ns/element monotone gathers. Falls
        # back in-graph to the XLA column build if any candidate run falls
        # outside its sub-window (never observed on real scans).
        from . import plan_kernel as pk

        # GCDLSS_PLAN_KERNEL: "2" = boundary-rank planning + in-kernel
        # two-level count (no per-query sort join, see plan_kernel.py v2
        # section); "1" = v1 (exact per-query rank join feeding the
        # kernel); "0" = off (XLA sort-merge joins). Default "2": v2 is
        # hardware-validated bit-exact vs the join path (k3 6.6 ms vs
        # 19.8, k5 9.0 vs 79.0 at 69120, 2026-08-17) and cache-primed.
        # The `use_kernel` guard keeps CPU/interpret runs on the joins.
        mode = os.environ.get("GCDLSS_PLAN_KERNEL", "2")
        use_kernel = (
            mode in ("1", "2")
            and pk.supported(cap, k1, version=int(mode))
            and jax.default_backend() == "tpu"
        )
        if use_kernel:
            return _build_cube_kernel_map(
                coords, valid, key_hi, key_lo, k1, version=int(mode))
        if os.environ.get("GCDLSS_PLAN_COLUMNS", "0") == "1":
            # XLA-only column build: cuts sort volume 5x but XLA executes
            # the candidate gathers + transpose scatter at ~7 ns/element —
            # measured slower end-to-end than the joins; kept for testing
            return _build_cube_neighbor_map(
                coords, valid, key_hi, key_lo, k1)
    if not (symmetric and kk % 2 == 1 and (offsets + offsets[::-1] == 0).all()):
        return _join_offsets(coords, valid, key_hi, key_lo, offsets,
                             max_offsets_per_join)
    half = kk // 2
    half_nbr = _join_offsets(
        coords, valid, key_hi, key_lo, offsets[:half], max_offsets_per_join
    )  # [cap, half]
    rows = jnp.arange(cap, dtype=jnp.int32)
    center = jnp.where(valid, rows, -1).astype(jnp.int32)
    trans = _transpose_half(half_nbr, cap)
    return jnp.concatenate([half_nbr, center[:, None], trans], axis=1)


def _column_ranks(valid, key_hi, key_lo, k1: int):
    """Insertion ranks + has-match bits for every non-center (dx, dy)
    column (product order).

    Query keys are built arithmetically (see _build_cube_neighbor_map's
    layout note): hi+dx, lo + dy*FIELD - r. `has` marks queries whose
    candidate window is non-empty; the rest are batch/field-boundary
    insertion artifacts whose p would otherwise drag the kernel's window
    planning and spuriously trigger the far fallback."""
    from .join import sorted_rank_match

    r = k1 // 2
    ncols = k1 * k1
    cc = (ncols - 1) // 2
    col_off = _offsets(k1).reshape(ncols, k1, 3)[:, 0, :2]
    sel = [c for c in range(ncols) if c != cc]
    dxy = np.asarray(col_off[sel], np.int32)
    dhi = jnp.asarray(dxy[:, 0], jnp.int32)[:, None]
    dlo = jnp.asarray(dxy[:, 1] * FIELD - r, jnp.int32)[:, None]
    qh = jnp.where(valid[None, :], key_hi[None, :] + dhi, SENTINEL_HI)
    ql = jnp.where(valid[None, :], key_lo[None, :] + dlo, SENTINEL_LO)
    p, has = sorted_rank_match(
        key_hi, key_lo, qh.reshape(-1), ql.reshape(-1), 2 * r)
    cap = valid.shape[0]
    return p.reshape(len(sel), cap), has.reshape(len(sel), cap)


def _build_cube_kernel_map(coords, valid, key_hi, key_lo, k1: int,
                           interpret: bool = False, version: int = 2):
    """Rank join + Pallas candidates kernel, with in-graph XLA fallback."""
    from . import plan_kernel as pk

    if version == 2:
        nbr, overflow = pk.cube_neighbor_map_kernel_v2(
            key_hi, key_lo, valid, k1=k1, interpret=interpret)
    else:
        p, has = _column_ranks(valid, key_hi, key_lo, k1)
        nbr, overflow = pk.cube_neighbor_map_kernel(
            key_hi, key_lo, p, has, k1=k1, interpret=interpret)
    return jax.lax.cond(
        overflow > 0,
        lambda _: _build_cube_neighbor_map(coords, valid, key_hi, key_lo, k1),
        lambda _: nbr,
        None,
    )


def _build_cube_neighbor_map(coords, valid, key_hi, key_lo, k1: int):
    """Column-decomposition build for a full k1^3 kernel (see above).

    All [hc, cap]-shaped intermediates keep `cap` as the minor (lane)
    dimension — a [cap, hc] layout would be 128-lane padded ~10x by XLA and
    measured slower than the plain per-offset joins it replaces.
    """
    r = k1 // 2
    cap = coords.shape[0]
    ncols = k1 * k1
    hc = (ncols - 1) // 2  # joined columns; the rest: center + transpose
    col_off = _offsets(k1).reshape(ncols, k1, 3)[:, 0, :2]  # (dx, dy)/column

    # --- joined half columns: one rank join at the window's lowest z ---
    # keys built arithmetically in the transposed [hc, cap] layout:
    #   hi = b*FIELD + (x+dx+OFF)   -> hi + dx
    #   lo = (y+dy+OFF)*FIELD + (z-r+OFF) -> lo + dy*FIELD - r
    # (valid because encode clips are inactive for in-range coords; the rank
    # join rejects any clipped/garbage key by exact compare later)
    from .coords import FIELD
    from .join import sorted_rank

    dxy = np.asarray(col_off[:hc], np.int32)  # [hc, 2]
    dhi = jnp.asarray(dxy[:, 0], jnp.int32)[:, None]  # [hc, 1]
    dlo = jnp.asarray(dxy[:, 1] * FIELD - r, jnp.int32)[:, None]
    qh = jnp.where(valid[None, :], key_hi[None, :] + dhi, SENTINEL_HI)
    ql = jnp.where(valid[None, :], key_lo[None, :] + dlo, SENTINEL_LO)
    p = sorted_rank(key_hi, key_lo, qh.reshape(-1), ql.reshape(-1))
    p = p.reshape(hc, cap)

    # read the <= k1 consecutive candidate rows; key-diff assigns each to
    # its dz slot (same (b,x,y) <=> hi equal and lo delta in [0, 2r])
    half_map = jnp.full((hc, k1, cap), -1, jnp.int32)
    for m in range(k1):
        crow = jnp.clip(p + m, 0, cap - 1)
        chi = key_hi[crow]
        clo = key_lo[crow]
        delta = clo - ql
        # (sentinel == sentinel would false-match invalid rows: exclude)
        ok = (chi == qh) & (qh != SENTINEL_HI) & (delta >= 0) & (delta <= 2 * r)
        dz = jnp.where(ok, delta, -1)
        hit = dz[:, None, :] == jnp.arange(k1, dtype=jnp.int32)[None, :, None]
        half_map = jnp.maximum(
            half_map, jnp.where(hit, crow[:, None, :], -1)
        )
    half_map_t = half_map.reshape(hc * k1, cap)

    # --- center column: candidates are the voxel's own neighborhood rows ---
    rows = jnp.arange(cap, dtype=jnp.int32)
    center = jnp.full((k1, cap), -1, jnp.int32)
    for m in range(-r, r + 1):
        crow = jnp.clip(rows + m, 0, cap - 1)
        chi = key_hi[crow]
        clo = key_lo[crow]
        d0 = clo - key_lo
        ok = valid & (chi == key_hi) & (d0 >= -r) & (d0 <= r)
        dz = jnp.where(ok, d0 + r, -1)
        hit = dz[None, :] == jnp.arange(k1, dtype=jnp.int32)[:, None]
        center = jnp.maximum(center, jnp.where(hit, crow[None, :], -1))

    half_map = half_map_t.T  # one relayout into the public [cap, K] order
    trans = _transpose_half(half_map, cap)
    return jnp.concatenate([half_map, center.T, trans], axis=1)


def plan_capacity_overflow(plan: "UNetPlan") -> jax.Array:
    """Total unique voxels dropped by per-level capacity limits (int32).

    `LevelPlan.count` is the TRUE unique count at each level (computed
    before capacity clamping in `sorted_unique`), while only the first
    `cap` sorted groups get rows — overflow silently removes the highest
    (batch, x) regions of the batch from that level. Surface this in train
    metrics: a persistently non-zero value means the configured
    `voxel_caps` under-provision the workload and results are not
    reference-faithful (MinkowskiEngine keeps every voxel). See BENCH.md
    round-5 capacity audit.
    """
    tot = jnp.zeros((), jnp.int32)
    for lvl in plan.levels:
        kept = jnp.sum(lvl.valid.astype(jnp.int32))
        tot = tot + jnp.maximum(lvl.count - kept, 0)
    return tot


def build_unet_plan(
    coords: jax.Array,
    valid: jax.Array,
    caps: tuple,
    num_levels: int = 5,
    stem_kernel: int = 5,
    presorted: bool = False,
    assume_unique: bool = False,
) -> UNetPlan:
    """Build the full per-batch plan from stride-1 voxel coords.

    Args:
      coords: [n_in, 4] int32 (b,x,y,z) stride-1 voxel coords (duplicates OK —
        they are re-uniqued; invalid rows masked by `valid`).
      valid: [n_in] bool.
      caps: static per-level capacities, len == num_levels.
      num_levels: number of stride levels (5 for MinkUNet: 1,2,4,8,16).
      stem_kernel: stem kernel size at level 0 (5 for MinkUNet34).
      presorted: valid rows of `coords` are already (b,x,y,z)-lex sorted
        (true for host/device quantize output and their batch concats) —
        skips the level-0 lexsort. Pool levels always re-sort: parent keys
        of sorted children are NOT sorted (x>>1 ties reorder across y/z).
      assume_unique: the caller PROMISES coords carries no duplicate
        (b,x,y,z) rows and caps[0] == coords rows — skips the level-0
        dedup bookkeeping (true for the voxel-level LaserMix re-batch,
        whose keys are unique by band-parity construction).
    """
    assert len(caps) == num_levels
    hi, lo = encode_coords(coords, valid)
    if presorted:
        uniq0 = sorted_unique_presorted
    elif assume_unique and caps[0] == coords.shape[0]:
        uniq0 = sorted_unique_nodup
    else:
        uniq0 = sorted_unique
    (uh, ul), rep, inverse, count = uniq0(hi, lo, caps[0])

    # the 27 k=3 offsets are a subset of the 125 k=5 stem offsets, so level 0
    # gets ONE join (the stem map) and slices its k3 columns out of it
    k3_in_k5 = np.array(
        [
            np.where((KERNEL_OFFSETS_5 == off).all(axis=1))[0][0]
            for off in KERNEL_OFFSETS_3
        ],
        np.int32,
    )

    levels = []
    pools = []
    stem_nbr = None
    cur_keys = (uh, ul)
    cur_count = count
    for l in range(num_levels):
        cap = caps[l]
        kh, kl = cur_keys
        lvalid = kh != SENTINEL_HI
        lcoords = jnp.where(lvalid[:, None], decode_keys(kh, kl), 0)
        if l == 0 and stem_kernel == 5:
            stem_nbr = build_neighbor_map(
                lcoords, lvalid, kh, kl, KERNEL_OFFSETS_5
            )
            nbr3 = stem_nbr[:, k3_in_k5]
        else:
            nbr3 = build_neighbor_map(lcoords, lvalid, kh, kl, KERNEL_OFFSETS_3)
        levels.append(
            LevelPlan(
                coords=lcoords,
                valid=lvalid,
                count=cur_count,
                nbr3=nbr3,
                key_hi=kh,
                key_lo=kl,
            )
        )
        if l + 1 < num_levels:
            # pool to next level: parent coord = c >> 1 (stride units), dcode = c & 1
            pcoord = jnp.concatenate(
                [lcoords[:, 0:1], lcoords[:, 1:4] >> 1], axis=1
            )
            dbits = lcoords[:, 1:4] & 1
            dcode = (dbits[:, 0] << 2) | (dbits[:, 1] << 1) | dbits[:, 2]
            ph, pl_ = encode_coords(pcoord, lvalid)
            (nh, nl), _, pinv, ncount = sorted_unique(ph, pl_, caps[l + 1])
            capf = lcoords.shape[0]
            capc = caps[l + 1]
            rows_f = jnp.arange(capf, dtype=jnp.int32)
            pok = lvalid & (pinv < capc)
            slot = jnp.where(pok, pinv * 8 + dcode, capc * 8)
            children = (
                jnp.full((capc * 8,), -1, jnp.int32)
                .at[slot].set(jnp.where(pok, rows_f, -1), mode="drop",
                              unique_indices=True)
                .reshape(capc, 8)
            )
            upmap = jnp.where(
                pok[:, None]
                & (dcode[:, None] == jnp.arange(8, dtype=jnp.int32)[None, :]),
                pinv[:, None], -1,
            ).astype(jnp.int32)
            pools.append(PoolPlan(parent=pinv, dcode=dcode.astype(jnp.int32),
                                  children=children, upmap=upmap))
            cur_keys = (nh, nl)
            cur_count = ncount

    if stem_nbr is None:
        lvl0 = levels[0]
        stem_nbr = build_neighbor_map(
            lvl0.coords, lvl0.valid, lvl0.key_hi, lvl0.key_lo,
            _offsets(stem_kernel),
        )
    return UNetPlan(
        levels=tuple(levels),
        pools=tuple(pools),
        stem_nbr=stem_nbr,
        rep=rep,
        inverse=inverse,
    )
