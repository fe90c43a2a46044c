"""Voxel-sharded sparse convolution: the sequence-parallel analog for LiDAR.

The reference's only parallelism is data-parallel DDP (`main.py:163`,
SURVEY §2.5); a single scan never spans GPUs. On TPU the natural second
axis is *voxel sharding*: split each level's row space into contiguous
blocks across an `sp` mesh axis. Levels are sorted by packed (b,x,y,z)
keys, so contiguous row blocks are contiguous key ranges — i.e. spatial
slabs — and a k<=5 kernel's neighbor rows live within a thin boundary
region. Each shard therefore exchanges fixed-width edge slabs ("halos")
with its ring neighbors over ICI (`lax.ppermute`) and runs the same
gather-GEMM locally; no all-gather of activations is ever materialized.

All functions here run INSIDE `jax.shard_map` over a named mesh axis:

  * rulebooks stay GLOBAL-valued (row indices into the whole level) and
    are merely stored sharded; `_window_remap` turns them into indices
    into the local [left-halo | local | right-halo] window.
  * entries outside the window are dropped and COUNTED — the returned
    `overflow` (psum-able) must be zero for exact parity, and
    `required_halo_*` computes the smallest halo that makes it so.
  * the halo exchange is differentiable: `jax.shard_map` transposes
    `ppermute`/`psum` automatically, so `jax.grad` of a sharded loss
    routes boundary cotangents back to their home shards.

Wraparound safety: ring ppermutes hand shard 0 a garbage "left halo"
(shard D-1's tail), but no global index ever points below row 0 or at/
beyond the level capacity, so those window slots are never gathered and
(for pool folds) only ever receive zero contributions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.conv import gather_conv


def _axis_size(axis_name: str) -> int:
    return jax.lax.axis_size(axis_name)


def conv_axis(sp_axis):
    """The mesh axis voxel ROWS are sharded over. A tuple means a composed
    (dp, ..., sp) mesh: rows ride the LAST axis; the leading axes are batch
    groups (halo exchange must stay within one group's ring)."""
    return sp_axis if isinstance(sp_axis, str) else sp_axis[-1]


def halo_window(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """[L, ...] local rows -> [L + 2*halo, ...] with ring-exchanged halos.

    halo <= L exchanges edge slabs with the ring neighbors (one ppermute
    each way). Larger halos — needed by pool maps when per-level fill
    fractions differ, skewing the valid-prefix alignment between levels —
    ride multi-hop full-block shifts; halo is then rounded up to whole
    blocks, up to (d-1)//2 hops each way (beyond that the window would
    wrap onto itself).
    """
    if halo == 0:
        return x
    ln = x.shape[0]
    d = _axis_size(axis_name)
    fwd = [(i, (i + 1) % d) for i in range(d)]  # data moves i -> i+1
    bwd = [(i, (i - 1) % d) for i in range(d)]
    if halo <= ln:
        from_left = jax.lax.ppermute(x[-halo:], axis_name, fwd)
        from_right = jax.lax.ppermute(x[:halo], axis_name, bwd)
        return jnp.concatenate([from_left, x, from_right], axis=0)
    hops = -(-halo // ln)
    if hops > (d - 1) // 2:
        raise ValueError(
            f"halo {halo} needs {hops} ring hops with local rows {ln}; at "
            f"most {(d - 1) // 2} available on a {d}-way mesh — raise the "
            "level capacity or use fewer shards")
    left, right = [], []
    yl = yr = x
    for _ in range(hops):
        yl = jax.lax.ppermute(yl, axis_name, fwd)
        yr = jax.lax.ppermute(yr, axis_name, bwd)
        left.insert(0, yl)
        right.append(yr)
    return jnp.concatenate(left + [x] + right, axis=0)


def padded_halo(halo: int, ln: int) -> int:
    """The effective window halo `halo_window` materializes: slab halos
    stay exact, multi-hop halos round up to whole blocks."""
    return halo if halo <= ln else -(-halo // ln) * ln


def fold_halo(part: jax.Array, ln: int, halo: int, axis_name: str) -> jax.Array:
    """Adjoint of `halo_window` for accumulated outputs: fold a
    [ln + 2*halo, ...] window of partial sums back onto the [ln] local
    block, returning each boundary slab/block to its home shard and
    adding. `halo` must be the padded (window) halo."""
    if halo == 0:
        return part
    d = _axis_size(axis_name)
    fwd = [(i, (i + 1) % d) for i in range(d)]
    bwd = [(i, (i - 1) % d) for i in range(d)]
    if halo <= ln:
        # my window rows [0, halo) belong to the LEFT neighbor's tail;
        # rows [halo + ln, ...) to the RIGHT neighbor's head
        from_right = jax.lax.ppermute(part[:halo], axis_name, bwd)
        from_left = jax.lax.ppermute(part[-halo:], axis_name, fwd)
        out = part[halo : halo + ln]
        out = out.at[ln - halo :].add(from_right)
        out = out.at[:halo].add(from_left)
        return out
    assert halo % ln == 0, "multi-hop fold needs a block-padded halo"
    hops = halo // ln
    out = part[halo : halo + ln]
    for k in range(1, hops + 1):
        # window block -k covers shard i-k's rows: k backward hops home.
        # I receive shard i+k's block -k (covering my rows). Symmetric fwd.
        y = part[(hops - k) * ln : (hops - k + 1) * ln]
        z = part[(hops + k) * ln : (hops + k + 1) * ln]
        for _ in range(k):
            y = jax.lax.ppermute(y, axis_name, bwd)
            z = jax.lax.ppermute(z, axis_name, fwd)
        out = out + y + z
    return out


def _window_remap(idx: jax.Array, n_local: int, halo: int, axis_name: str):
    """Global row indices -> window-relative; (-1, counted) when outside.

    `idx` may hold -1 (absent) or values >= the global capacity (pool
    sentinel); both are dropped silently — only in-range global rows that
    miss the window count as overflow.
    """
    i = jax.lax.axis_index(axis_name)
    d = _axis_size(axis_name)
    base = i * n_local - halo
    rel = idx - base
    inside = (rel >= 0) & (rel < n_local + 2 * halo)
    in_range = (idx >= 0) & (idx < d * n_local)
    ok = in_range & inside
    overflow = jnp.sum((in_range & ~inside).astype(jnp.int32))
    return jnp.where(ok, rel, -1), overflow


def sp_gather_conv(
    x: jax.Array,
    nbr: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    halo: int,
    axis_name: str,
    compute_dtype=None,
):
    """Submanifold sparse conv on a voxel-sharded level.

    Args (all per-shard, inside shard_map):
      x: [L, Ci] local rows of the level's features (invalid rows 0).
      nbr: [L, K] GLOBAL neighbor row indices for the local out rows.
      weight: [K, Ci, Co] (replicated).
    Returns ([L, Co], overflow) — overflow is this shard's count of
    dropped in-range entries (psum for the global count).
    """
    halo = padded_halo(halo, x.shape[0])
    src = halo_window(x, halo, axis_name)
    nbr_rel, overflow = _window_remap(nbr, x.shape[0], halo, axis_name)
    # symmetric_adjoint is invalid here (out space != window space); the
    # M != N generic adjoint scatter-adds into the window and shard_map's
    # ppermute transpose returns halo cotangents to their home shards.
    out = gather_conv(src, nbr_rel, weight, bias, compute_dtype=compute_dtype)
    return out, overflow


def _down_contrib(feats: jax.Array, dcode: jax.Array, weight: jax.Array,
                  precision=None) -> jax.Array:
    """Per-fine-row k2s2 contribution: wide matmul + kernel-offset select
    (same math as `ops.conv.down_conv` before its segment-sum)."""
    ci = feats.shape[1]
    co = weight.shape[2]
    wide = weight.transpose(1, 0, 2).reshape(ci, 8 * co)
    h = jnp.dot(feats, wide, preferred_element_type=jnp.float32,
                precision=precision)
    h = h.reshape(-1, 8, co)
    return jnp.take_along_axis(h, dcode[:, None, None], axis=1)[:, 0, :]


def sp_down_conv(
    x: jax.Array,
    parent: jax.Array,
    dcode: jax.Array,
    weight: jax.Array,
    lc: int,
    *,
    halo: int,
    axis_name: str,
):
    """Strided k2s2 down conv: fine shard -> coarse shard (+halo fold).

    Args:
      x: [Lf, Ci] local fine features. parent/dcode: [Lf] local slices of
      the PoolPlan (parent values GLOBAL coarse rows). lc: local coarse
      rows per shard (coarse capacity // axis size).
    Returns ([lc, Co] f32 partial sums folded across shard boundaries,
    overflow count).
    """
    halo = padded_halo(halo, lc)
    h = _down_contrib(x, dcode, weight)
    rel, overflow = _window_remap(parent, lc, halo, axis_name)
    seg = jnp.where(rel >= 0, rel, lc + 2 * halo)
    part = jax.ops.segment_sum(h, seg, num_segments=lc + 2 * halo + 1)[
        : lc + 2 * halo
    ]
    return fold_halo(part, lc, halo, axis_name), overflow


def sp_up_conv(
    x_coarse: jax.Array,
    parent: jax.Array,
    dcode: jax.Array,
    weight: jax.Array,
    *,
    halo: int,
    axis_name: str,
):
    """Transpose k2s2 up conv: gather each fine row's parent from the
    coarse window. x_coarse: [lc, Ci] local; parent/dcode: [Lf] local
    fine slices with GLOBAL coarse parent rows. Returns ([Lf, Co], overflow)."""
    halo = padded_halo(halo, x_coarse.shape[0])
    src = halo_window(x_coarse, halo, axis_name)
    rel, overflow = _window_remap(parent, x_coarse.shape[0], halo, axis_name)
    ok = rel >= 0
    g = src[jnp.where(ok, rel, 0)] * ok[:, None].astype(src.dtype)
    return _down_contrib(g, dcode, weight), overflow


def sp_bn_stats(x: jax.Array, valid: jax.Array, axis_name: str):
    """Globally-consistent masked BN statistics on a sharded level.

    One-pass E[x^2] - E[x]^2 with f32 accumulation; three scalars/vectors
    psum over the sp axis. Returns (mean [C], biased var [C], count)."""
    xf = x.astype(jnp.float32)
    m = valid[:, None].astype(jnp.float32)
    s = jax.lax.psum(jnp.sum(xf * m, axis=0), axis_name)
    ss = jax.lax.psum(jnp.sum(jnp.square(xf) * m, axis=0), axis_name)
    cnt = jax.lax.psum(jnp.sum(valid.astype(jnp.float32)), axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    mean = s / cnt
    var = jnp.maximum(ss / cnt - jnp.square(mean), 0.0)
    return mean, var, cnt


# ---------------------------------------------------------------------------
# halo sizing helpers (host/jit callable, OUTSIDE shard_map)
# ---------------------------------------------------------------------------


def required_halo_subm(nbr: jax.Array, n_shards: int) -> jax.Array:
    """Smallest halo for which a contiguous-block sharding of this
    neighbor map overflows nowhere. nbr: [cap, K] global indices."""
    cap = nbr.shape[0]
    ln = cap // n_shards
    shard = (jnp.arange(cap, dtype=jnp.int32) // ln)[:, None]
    start = shard * ln
    v = nbr >= 0
    below = jnp.where(v, start - nbr, 0)
    above = jnp.where(v, nbr - (start + ln - 1), 0)
    return jnp.maximum(jnp.max(below), jnp.max(above)).astype(jnp.int32)


def required_halo_pool(parent: jax.Array, cap_coarse: int,
                       n_shards: int) -> jax.Array:
    """Smallest coarse halo for the down/up k2s2 maps: fine shard i's
    parents must land in coarse window [i*lc - h, (i+1)*lc + h)."""
    capf = parent.shape[0]
    lf = capf // n_shards
    lc = cap_coarse // n_shards
    shard = jnp.arange(capf, dtype=jnp.int32) // lf
    start = shard * lc
    v = (parent >= 0) & (parent < cap_coarse)
    below = jnp.where(v, start - parent, 0)
    above = jnp.where(v, parent - (start + lc - 1), 0)
    return jnp.maximum(jnp.max(below), jnp.max(above)).astype(jnp.int32)


def required_halos(plan, n_shards: int) -> dict:
    """Per-level subm/pool halo requirements for a UNetPlan (dict of
    int32 scalars; jit-friendly). Keys: 'stem', 'subm{l}', 'pool{l}'."""
    out = {"stem": required_halo_subm(plan.stem_nbr, n_shards)}
    for l, lvl in enumerate(plan.levels):
        out[f"subm{l}"] = required_halo_subm(lvl.nbr3, n_shards)
    for l, pool in enumerate(plan.pools):
        cap_c = plan.levels[l + 1].coords.shape[0]
        out[f"pool{l}"] = required_halo_pool(pool.parent, cap_c, n_shards)
    return out
