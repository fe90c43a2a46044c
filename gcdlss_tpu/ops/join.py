"""Sort-merge join for kernel-map construction.

Binary-searching each query key costs ~log2(N) *random gathers* per query —
pathological on TPU (the v5e bench showed the rulebook build dominating the
whole train step). This module replaces it with a sort-join:

    C = concat(table-entries, query-entries)        tagged 0/1
    sort C lexicographically by (hi, lo, tag)       one variadic lax.sort
    match(q) = last table row at or before q        associative-scan max fill
    validate by comparing the matched table key     2 gathers per query

Sorting has regular, vectorizable access patterns on TPU (bitonic networks),
so throughput is orders of magnitude better than random gathers. All int32 —
no x64 required.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .coords import SENTINEL_HI


def _sort3(hi, lo2, payload):
    """lax.sort((hi, lo2, payload), num_keys=2).

    (A bitonic Pallas sort was benched here and lost to XLA's native sort
    on v5e hardware — see BENCH.md round-4 sort-kernel burial note.)
    """
    return jax.lax.sort((hi, lo2, payload), num_keys=2)


def sorted_join(table_hi, table_lo, q_hi, q_lo):
    """For each query key, the index of the matching table row, or -1.

    The table must be deduplicated (e.g. output of sorted_unique); sentinel
    table rows never match because queries with sentinel keys are masked.
    Query order/content is arbitrary.
    """
    n = table_hi.shape[0]
    m = q_hi.shape[0]
    hi = jnp.concatenate([table_hi, q_hi])
    # pack the table/query tag into the low key's LSB (valid lo < 2^30, so
    # lo*2+tag stays positive in int32; sentinel lo saturates but its hi key
    # already sorts those rows last): one fewer sort operand, and table
    # entries sort before queries on equal keys
    lo2 = jnp.concatenate(
        [
            jnp.minimum(table_lo, (1 << 30) - 1) * 2,
            jnp.minimum(q_lo, (1 << 30) - 1) * 2 + 1,
        ]
    )
    payload = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32), jnp.arange(m, dtype=jnp.int32)]
    )
    hi_s, lo2_s, pay_s = _sort3(hi, lo2, payload)
    is_q = (lo2_s & 1) == 1
    # monotone fill: last table row index at or before each position
    trow = jnp.where(is_q, -1, pay_s)
    filled = jax.lax.cummax(trow, axis=0)
    # validation without gathers: group equal (hi, lo) keys by adjacent
    # compares; a query matches iff its group contains a table entry (which
    # sorts first in the group), i.e. the cummax-filled table *group id*
    # equals the query's own group id
    lo_key = lo2_s >> 1
    new_grp = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (hi_s[1:] != hi_s[:-1]) | (lo_key[1:] != lo_key[:-1]),
        ]
    )
    grp = jnp.cumsum(new_grp.astype(jnp.int32))
    tgrp = jax.lax.cummax(jnp.where(is_q, -1, grp), axis=0)
    ok = (filled >= 0) & (tgrp == grp) & (hi_s != SENTINEL_HI)
    match = jnp.where(ok, filled, -1)
    # scatter back to query order
    out = jnp.full((m,), -1, jnp.int32)
    out = out.at[jnp.where(is_q, pay_s, m)].set(
        jnp.where(is_q, match, -1), mode="drop"
    )
    return out


def sorted_rank(table_hi, table_lo, q_hi, q_lo):
    """Insertion index of each query key into the sorted table.

    Returns p in [0, n]: the index of the first table row with key >= the
    query key (n if none). Together with the z-contiguity of sorted voxel
    keys this lets one join serve a whole window of consecutive-z offsets
    (see plan.build_neighbor_map's column decomposition).
    """
    n = table_hi.shape[0]
    m = q_hi.shape[0]
    hi = jnp.concatenate([table_hi, q_hi])
    # queries sort BEFORE equal-key table rows (tag 0 vs 1): the inclusive
    # cumsum of table rows at a query position then counts exactly the
    # table keys strictly below the query key = its insertion index
    lo2 = jnp.concatenate(
        [
            jnp.minimum(table_lo, (1 << 30) - 1) * 2 + 1,
            jnp.minimum(q_lo, (1 << 30) - 1) * 2,
        ]
    )
    payload = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32), jnp.arange(m, dtype=jnp.int32)]
    )
    hi_s, lo2_s, pay_s = _sort3(hi, lo2, payload)
    is_t = (lo2_s & 1) == 1
    cnt = jnp.cumsum(is_t.astype(jnp.int32))
    out = jnp.zeros((m,), jnp.int32)
    is_q = ~is_t
    out = out.at[jnp.where(is_q, pay_s, m)].set(
        jnp.where(is_q, cnt, 0), mode="drop"
    )
    return out


def sorted_rank_match(table_hi, table_lo, q_hi, q_lo, max_delta):
    """Insertion index of each query + whether a match can exist.

    Returns (p [M] in [0, n], has [M] bool) where `has` is True iff the
    first table key >= the query key has the same hi word and a lo delta in
    [0, max_delta] — i.e. the query's candidate window is non-empty. Queries
    without a possible match get arbitrary insertion points (batch-boundary
    artifacts); flagging them lets callers exclude them from window
    planning instead of treating them as out-of-window ("far") entries.

    The next-table key at each merged position comes from a suffix
    associative scan ("first table entry at-or-after"), not a gather.
    """
    n = table_hi.shape[0]
    m = q_hi.shape[0]
    hi = jnp.concatenate([table_hi, q_hi])
    lo2 = jnp.concatenate(
        [
            jnp.minimum(table_lo, (1 << 30) - 1) * 2 + 1,
            jnp.minimum(q_lo, (1 << 30) - 1) * 2,
        ]
    )
    payload = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32), jnp.arange(m, dtype=jnp.int32)]
    )
    hi_s, lo2_s, pay_s = _sort3(hi, lo2, payload)
    is_t = (lo2_s & 1) == 1
    lo_key = lo2_s >> 1
    cnt = jnp.cumsum(is_t.astype(jnp.int32))

    # suffix scan: first table (hi, lo) at-or-after each position
    def comb(a, b):
        # in reverse mode `b` is the element NEARER the output position;
        # keep it when present (verified against a toy suffix-fill)
        am, ah, al = a
        bm, bh, bl = b
        return (am | bm, jnp.where(bm, bh, ah), jnp.where(bm, bl, al))

    nm, nh, nl = jax.lax.associative_scan(
        comb,
        (is_t, jnp.where(is_t, hi_s, 0), jnp.where(is_t, lo_key, 0)),
        reverse=True,
    )
    has_here = nm & (nh == hi_s) & (nl - lo_key >= 0) & (nl - lo_key <= max_delta)

    is_q = ~is_t
    p = jnp.zeros((m,), jnp.int32).at[jnp.where(is_q, pay_s, m)].set(
        jnp.where(is_q, cnt, 0), mode="drop"
    )
    has = jnp.zeros((m,), bool).at[jnp.where(is_q, pay_s, m)].set(
        jnp.where(is_q, has_here, False), mode="drop"
    )
    return p, has
