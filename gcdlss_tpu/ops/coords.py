"""Integer voxel-coordinate engine: key packing, sorted-unique, binary-search lookup.

This is the TPU-native replacement for MinkowskiEngine's C++/CUDA coordinate
manager (hash maps + kernel maps; see reference call sites
`models/minkunet.py:62-132`, `utils/dataset_remission_mean_teacher.py:965-1002`).
Instead of dynamic hash tables we keep every stride level as a *sorted,
fixed-capacity, padded* array of packed coordinate keys.  Membership queries
(the kernel-map build) are vectorized binary searches over the sorted keys —
pure XLA, static shapes, no host round-trips.

Coordinates are `(batch, x, y, z)` int32 in *stride units* (i.e. divided by the
tensor stride, so a stride-2 voxel `(b, 3, -1, 0)` sits at raw coordinates
`(6, -2, 0)`).  Spatial fields are offset by ``COORD_OFFSET`` into
``[0, FIELD)`` and packed into an ``(hi, lo)`` int32 pair:

    hi = b * FIELD + (x + COORD_OFFSET)          # batch then x
    lo = (y + COORD_OFFSET) * FIELD + (z + COORD_OFFSET)

With ``FIELD = 2**15`` each spatial axis spans ±16384 voxels (±819 m at a
0.05 m voxel) and up to 2**16-2 scans fit in a batch.  Padded/invalid rows get
a sentinel key that sorts after every valid key.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

FIELD = 1 << 15
COORD_OFFSET = 1 << 14
SENTINEL_HI = jnp.int32((1 << 31) - 1)
SENTINEL_LO = jnp.int32((1 << 31) - 1)


def encode_coords(coords: jax.Array, valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pack [N,4] int32 (b,x,y,z) coords into sortable (hi, lo) int32 keys.

    Invalid rows map to the sentinel key (sorts last). Out-of-range spatial
    coords are clipped into the representable field (±16383 stride units).
    """
    b = coords[:, 0].astype(jnp.int32)
    xyz = jnp.clip(
        coords[:, 1:4].astype(jnp.int32) + COORD_OFFSET, 0, FIELD - 1
    )
    hi = b * FIELD + xyz[:, 0]
    lo = xyz[:, 1] * FIELD + xyz[:, 2]
    hi = jnp.where(valid, hi, SENTINEL_HI)
    lo = jnp.where(valid, lo, SENTINEL_LO)
    return hi, lo


class UniqueResult(tuple):
    pass


def sorted_unique(
    hi: jax.Array,
    lo: jax.Array,
    capacity: int,
):
    """Sorted unique over packed keys with static output capacity.

    Args:
      hi, lo: [N] packed keys (invalid rows = sentinel).
      capacity: static output size. Groups beyond capacity are dropped.

    Returns:
      (uniq_hi, uniq_lo): [capacity] sorted unique keys, sentinel-padded.
      rep: [capacity] int32 — index into the input of the *first occurrence*
           (smallest original index) of each unique key; N for padding.
           (Mirrors `ME.utils.sparse_quantize(return_index=True)` semantics.)
      inverse: [N] int32 — for each input row, the index of its unique key in
           the output (like `return_inverse=True`). Rows whose group was
           dropped by the capacity limit, and invalid rows, get `capacity`
           (i.e. one-past-the-end; safe for `num_segments=capacity+1`
           segment ops followed by a slice).
      count: int32 scalar — number of valid unique keys.
    """
    n = hi.shape[0]
    # A VMEM-resident bitonic sort kernel was tried here (round 3/4): bit-
    # exact on HW but SLOWER than XLA's native sort on v5e (12.84 ms vs
    # 8.49 ms at 276k rows, tools BENCH.md round-4 entry) — removed.
    # One 3-operand lax.sort replaces lexsort + two post-gathers: lexsort
    # already sorts (lo, hi, iota) internally but returns only the order,
    # forcing hi[order]/lo[order] re-gathers (~7 ns/element of XLA gather
    # per array). Stable sort keeps first-occurrence semantics for `rep`.
    sh, sl, order = jax.lax.sort(
        (hi, lo, jnp.arange(n, dtype=jnp.int32)), num_keys=2, is_stable=True
    )
    first = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1]),
        ]
    )
    gid = jnp.cumsum(first.astype(jnp.int32)) - 1  # group id per sorted row
    valid_sorted = sh != SENTINEL_HI
    count = jnp.sum(first & valid_sorted).astype(jnp.int32)
    # inverse map back to original row order; dropped/invalid groups -> capacity
    gid_clamped = jnp.where((gid < capacity) & valid_sorted, gid, capacity)
    inverse = jnp.zeros((n,), jnp.int32).at[order].set(gid_clamped)
    # unique keys: scatter (same value per group; drop overflow)
    uniq_hi = jnp.full((capacity,), SENTINEL_HI, jnp.int32).at[gid_clamped].set(
        jnp.where(valid_sorted, sh, SENTINEL_HI), mode="drop"
    )
    uniq_lo = jnp.full((capacity,), SENTINEL_LO, jnp.int32).at[gid_clamped].set(
        jnp.where(valid_sorted, sl, SENTINEL_LO), mode="drop"
    )
    # representative (first occurrence == min original index, stable sort)
    rep = jnp.full((capacity,), n, jnp.int32).at[gid_clamped].min(
        jnp.where(valid_sorted, order, n).astype(jnp.int32), mode="drop"
    )
    return (uniq_hi, uniq_lo), rep, inverse, count


def sorted_unique_nodup(
    hi: jax.Array,
    lo: jax.Array,
    capacity: int,
):
    """`sorted_unique` for keys PROMISED duplicate-free (capacity == n).

    The voxel-level LaserMix re-batch is the use case: band parity is a
    function of coordinates, so the two copies of a coordinate duplicated
    across a sup/unsup scan pair land in opposite mixed scans and the
    re-batched key set is guaranteed unique (see BENCH.md round-5,
    `train/discover._mixed_plan_voxel`). Skips the dedup bookkeeping: the
    unique keys are the sorted keys themselves, `rep` is the sort order.
    If the promise is broken, duplicate keys simply occupy two rows
    (neighbor lookups resolve to one of them) — no memory unsafety.
    """
    n = hi.shape[0]
    assert capacity == n, "nodup fast path requires capacity == n"
    pos = jnp.arange(n, dtype=jnp.int32)
    sh, sl, order = jax.lax.sort((hi, lo, pos), num_keys=2, is_stable=True)
    valid_sorted = sh != SENTINEL_HI
    count = jnp.sum(valid_sorted.astype(jnp.int32))
    rep = jnp.where(valid_sorted, order, n).astype(jnp.int32)
    inverse = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.where(valid_sorted, pos, jnp.int32(capacity)),
             unique_indices=True)
    )
    return (sh, sl), rep, inverse, count


def sorted_unique_presorted(
    hi: jax.Array,
    lo: jax.Array,
    capacity: int,
):
    """`sorted_unique` for inputs whose VALID rows are already key-sorted.

    Host quantize (`data/quantize_np.py`, `csrc/voxelizer.cpp`) and the
    device `sparse_quantize` all emit voxels sorted by packed key, and
    batch concatenation (`train/discover._combine_batches`) preserves the
    lex (b,x,y,z) order, so the production plan build never needs the
    level-0 lexsort — only a validity compaction (sentinel pad rows sit
    mid-stream at side boundaries) and an adjacent-compare dedup.
    Duplicates are fine (they are adjacent by sortedness). Same returns
    as `sorted_unique`; bit-identical on sorted inputs (tested).
    """
    n = hi.shape[0]
    valid = hi != SENTINEL_HI
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    posc = jnp.where(valid, pos, n)  # invalid rows drop out of the scatter
    idx = jnp.arange(n, dtype=jnp.int32)
    sh = jnp.full((n,), SENTINEL_HI, jnp.int32).at[posc].set(
        hi, mode="drop", unique_indices=True)
    sl = jnp.full((n,), SENTINEL_LO, jnp.int32).at[posc].set(
        lo, mode="drop", unique_indices=True)
    order = jnp.full((n,), n, jnp.int32).at[posc].set(
        idx, mode="drop", unique_indices=True)
    valid_sorted = sh != SENTINEL_HI
    first = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            (sh[1:] != sh[:-1]) | (sl[1:] != sl[:-1]),
        ]
    )
    gid = jnp.cumsum(first.astype(jnp.int32)) - 1
    count = jnp.sum(first & valid_sorted).astype(jnp.int32)
    gid_clamped = jnp.where((gid < capacity) & valid_sorted, gid, capacity)
    # inverse for original rows: gid at the row's compacted position
    gid_ext = jnp.concatenate(
        [gid_clamped, jnp.full((1,), capacity, jnp.int32)])
    inverse = gid_ext[jnp.minimum(posc, n)]
    uniq_hi = jnp.full((capacity,), SENTINEL_HI, jnp.int32).at[gid_clamped].set(
        jnp.where(valid_sorted, sh, SENTINEL_HI), mode="drop"
    )
    uniq_lo = jnp.full((capacity,), SENTINEL_LO, jnp.int32).at[gid_clamped].set(
        jnp.where(valid_sorted, sl, SENTINEL_LO), mode="drop"
    )
    rep = jnp.full((capacity,), n, jnp.int32).at[gid_clamped].min(
        jnp.where(valid_sorted, order, n).astype(jnp.int32), mode="drop"
    )
    return (uniq_hi, uniq_lo), rep, inverse, count


def decode_keys(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Inverse of encode_coords → [N,4] int32 (b,x,y,z). Sentinel rows undefined."""
    b = hi // FIELD
    x = hi % FIELD - COORD_OFFSET
    y = lo // FIELD - COORD_OFFSET
    z = lo % FIELD - COORD_OFFSET
    return jnp.stack([b, x, y, z], axis=1).astype(jnp.int32)


def _ceil_log2(n: int) -> int:
    k = 0
    while (1 << k) < n:
        k += 1
    return max(k, 1)


@functools.partial(jax.jit, static_argnames=())
def lookup_sorted(
    uniq_hi: jax.Array,
    uniq_lo: jax.Array,
    q_hi: jax.Array,
    q_lo: jax.Array,
) -> jax.Array:
    """Binary search of query keys in a sorted (hi, lo) table.

    Returns int32 indices into the table, or -1 where absent. Works for any
    query shape; table must be the sorted sentinel-padded output of
    sorted_unique. ~log2(capacity) vectorized steps.
    """
    cap = uniq_hi.shape[0]
    steps = _ceil_log2(cap + 1)  # search interval is [0, cap] inclusive
    lo_b = jnp.zeros(q_hi.shape, jnp.int32)
    hi_b = jnp.full(q_hi.shape, cap, jnp.int32)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        mh = uniq_hi[mid]
        ml = uniq_lo[mid]
        less = (mh < q_hi) | ((mh == q_hi) & (ml < q_lo))
        return jnp.where(less, mid + 1, lo_b), jnp.where(less, hi_b, mid)

    lo_b, hi_b = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    pos = jnp.minimum(lo_b, cap - 1)
    found = (uniq_hi[pos] == q_hi) & (uniq_lo[pos] == q_lo) & (q_hi != SENTINEL_HI)
    return jnp.where(found, pos, -1).astype(jnp.int32)
