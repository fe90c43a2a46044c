"""VMEM-resident bitonic sort for packed voxel keys (Pallas/Mosaic).

Sorting is the recurring primitive of the whole plan/discovery pipeline:
`sorted_unique` (level-0 + 4 pool edges per UNet plan, twice per Stage-2
step with the mixed plan), `sorted_join`/`sorted_rank` (kernel-map joins),
and candidate mining all reduce to a lexicographic sort of
(hi, lo[, payload]) int32 triples (replacing MinkowskiEngine's hash
tables, reference `models/minkunet.py:62-132`). XLA's TPU `sort` streams
each comparator pass through HBM; at the north-star sizes (262k rows) one
two-key sort measures ~12-18 ms while the data is only ~3 MB — it fits in
VMEM whole.

This kernel keeps all three arrays resident in VMEM blocks across a
`grid=(stages,)` loop and executes ONE bitonic compare-exchange substage
per grid step. Every substage's partner permutation is `index XOR 2^t`,
which on a [rows, 128] layout is a static lane roll (stride < 128) or a
static sublane roll (stride >= 128) plus a select — so the kernel body is
~19 small static variants dispatched by a scalar-prefetched
(stride, block) schedule, and Mosaic compiles each exactly once.

Keys are compared as (hi, lo, payload) with the payload a distinct row
index: the order is total, so the result is deterministic AND reproduces
`jnp.lexsort`'s stability (equal (hi, lo) rows come out in ascending
original index), which `sorted_unique`'s representative ("first
occurrence") semantics rely on.

Capacity: rows are padded to the next power of two >= 1024 with sentinel
keys (sorts last); 3 int32 arrays of 2^20 rows = 12.6 MB VMEM. Larger
inputs fall back to `jnp.lexsort` (static shape switch).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coords import SENTINEL_HI, SENTINEL_LO

LANES = 128
MAX_ROWS = 1 << 20  # 3 int32 arrays at 2^20 rows = 12.6 MB VMEM


def enabled() -> bool:
    """Opt-in while hardware validation is pending (GCDLSS_SORT_KERNEL=1)."""
    return (
        os.environ.get("GCDLSS_SORT_KERNEL", "0") == "1"
        and jax.default_backend() == "tpu"
    )


def supported(n: int) -> bool:
    return 1024 <= n and _next_pow2(max(n, 1024)) <= MAX_ROWS


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _schedule(npad: int) -> np.ndarray:
    """[(j, k)] kernel steps: per round k, its sublane substages
    (j = k/2 .. 128) one step each, then ONE lane-cascade step covering
    j = min(k/2, 64) .. 1 (the kernel unrolls the cascade in-register, so
    the 7 most numerous substages of every round cost one VMEM pass)."""
    out = []
    k = 2
    while k <= npad:
        j = k // 2
        while j >= LANES:
            out.append((j, k))
            j //= 2
        out.append((min(k // 2, LANES // 2), k))
        k *= 2
    return np.asarray(out, np.int32)


def _lex_gt(ah, al, ap, bh, bl, bp):
    """(ah, al, ap) > (bh, bl, bp) lexicographically (all int32)."""
    return (ah > bh) | (
        (ah == bh) & ((al > bl) | ((al == bl) & (ap > bp)))
    )


def _sort_kernel(sched_ref, hi_in, lo_in, pay_in, hi_o, lo_o, pay_o,
                 sem, *, R, G, strides):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        # inputs live in ANY (HBM): one DMA each into the resident out
        # blocks halves the VMEM footprint vs VMEM input blocks (the
        # 2^20-row shape is 12.6 MB instead of 25)
        for idx, (src, dst) in enumerate(
            ((hi_in, hi_o), (lo_in, lo_o), (pay_in, pay_o))
        ):
            cp = pltpu.make_async_copy(src, dst, sem.at[idx])
            cp.start()
            cp.wait()

    j = sched_ref[step, 0]
    k = sched_ref[step, 1]
    gi = (
        jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    )
    # bitonic direction: block of size k at (gi & k) == 0 sorts ascending
    desc = (gi & k) != 0

    hi = hi_o[:]
    lo = lo_o[:]
    pay = pay_o[:]

    def substage(h, l, p, s):
        """One compare-exchange at XOR-stride s (static)."""
        axis = 1 if s < LANES else 0
        shift = s if s < LANES else s // LANES
        size = LANES if s < LANES else R
        upper = (gi & s) != 0

        def partner(x):
            return jnp.where(
                upper,
                pltpu.roll(x, shift, axis),         # [i] <- [i - s]
                pltpu.roll(x, size - shift, axis),  # [i] <- [i + s]
            )

        ph, pl_, pp = partner(h), partner(l), partner(p)
        gt = _lex_gt(h, l, p, ph, pl_, pp)
        # ascending block: upper element keeps the max -> take the
        # partner iff it is larger == ~gt; descending: the inverse.
        # keys are totally ordered (payload distinct) so ~gt == lt.
        take = gt ^ upper ^ desc
        return (jnp.where(take, ph, h), jnp.where(take, pl_, l),
                jnp.where(take, pp, p))

    for s in strides:
        if s >= LANES:
            # one sublane substage per step

            @pl.when(j == s)
            def _(s=s):
                h, l, p = substage(hi, lo, pay, s)
                hi_o[:] = h
                lo_o[:] = l
                pay_o[:] = p
        else:
            # lane cascade: j = s down to 1, unrolled in-register

            @pl.when(j == s)
            def _(s=s):
                h, l, p = hi, lo, pay
                s2 = s
                while s2 >= 1:
                    h, l, p = substage(h, l, p, s2)
                    s2 //= 2
                hi_o[:] = h
                lo_o[:] = l
                pay_o[:] = p


def sort3(hi: jax.Array, lo: jax.Array, pay: jax.Array,
          interpret: bool = False):
    """Sort int32 triples lexicographically by (hi, lo, pay).

    `pay` must be a permutation-distinct tie-break (e.g. arange row ids);
    returns the three arrays in sorted order, same length as the input.
    """
    n = hi.shape[0]
    npad = _next_pow2(max(n, 1024))
    assert npad <= MAX_ROWS, f"sort3 capacity exceeded: {n}"
    R = npad // LANES
    sched = _schedule(npad)
    G = sched.shape[0]

    def pad(x, fill):
        return jnp.full((npad,), fill, jnp.int32).at[:n].set(x)

    hi_p = pad(hi, SENTINEL_HI).reshape(R, LANES)
    lo_p = pad(lo, SENTINEL_LO).reshape(R, LANES)
    # pad payloads continue past the real rows: keys stay totally ordered
    pay_p = (
        jnp.arange(npad, dtype=jnp.int32).at[:n].set(pay).reshape(R, LANES)
    )

    strides = tuple(int(2 ** t) for t in range(int(np.log2(npad))))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec((R, LANES), lambda i, s: (0, 0))] * 3,
        scratch_shapes=[pltpu.SemaphoreType.DMA((3,))],
    )
    out = pl.pallas_call(
        functools.partial(_sort_kernel, R=R, G=G, strides=strides),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((R, LANES), jnp.int32)] * 3,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(jnp.asarray(sched), hi_p, lo_p, pay_p)
    sh, sl, sp = (o.reshape(npad)[:n] for o in out)
    return sh, sl, sp


def lexsort3(hi: jax.Array, lo: jax.Array, interpret: bool = False):
    """(sorted hi, sorted lo, order) — stable two-key lexsort.

    Kernel-backed when enabled()/supported(); otherwise `jnp.lexsort`.
    Drop-in for the `order = lexsort((lo, hi)); hi[order]; lo[order]`
    triple that `sorted_unique` / `sparse_quantize` are built on.
    """
    n = hi.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    if (enabled() or interpret) and supported(n):
        return sort3(hi, lo, rows, interpret=interpret)
    order = jnp.lexsort((lo, hi))
    return hi[order], lo[order], order
