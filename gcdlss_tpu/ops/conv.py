"""Sparse convolution compute primitives: gather-GEMM-scatter on padded buffers.

TPU-native replacement for `MinkowskiConvolution` / `MinkowskiConvolutionTranspose`
(reference `models/minkunet.py:62-132`) and the spconv/torchsparse kernels of
the Cylinder3D path.  All functions take fixed-capacity padded feature buffers
plus plan arrays from `gcdlss_tpu.ops.plan`; invalid rows are zeros and every
op preserves that invariant.

Design notes (MXU-first):
  * Submanifold k=3 conv: `lax.scan` over the 27 kernel offsets; each step is a
    row-gather plus an [N, Ci] x [Ci, Co] matmul — large, static, MXU-tileable.
    The gathered operand is recomputed in backward (scatter-add adjoint), so
    peak memory stays O(N*Ci).
  * k2s2 down conv: one wide matmul [N, Ci] x [Ci, 8*Co], per-row selection of
    the parent's kernel-offset slice, then a segment-sum into the coarse level.
  * k2s2 transpose (up) conv: gather coarse parent features, one wide matmul,
    per-row slice selection. Exactly one parent exists per fine voxel, so no
    neighbor search is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _zeros_like_vma(shape, *refs):
    """Zeros carrying the refs' combined varying-manual-axes type: scan
    carries inside `jax.shard_map` must match their body outputs'
    device-variance, so a plain-constant init fails the vma check
    (scan-vma rule)."""
    z = jnp.zeros(shape, jnp.float32)
    axes = set()
    for r in refs:
        axes |= set(getattr(jax.typeof(r), "vma", ()) or ())
    if axes:
        z = jax.lax.pcast(z, tuple(axes), to="varying")
    return z


def _gather_conv_fwd_impl(feats, nbr, weight, precision):
    n = nbr.shape[0]
    co = weight.shape[2]
    x = feats

    def step(acc, inp):
        nbr_k, w_k = inp
        safe = jnp.where(nbr_k >= 0, nbr_k, 0)
        g = x[safe] * (nbr_k >= 0)[:, None].astype(x.dtype)
        return (
            acc
            + jnp.dot(g, w_k, preferred_element_type=jnp.float32, precision=precision),
            None,
        )

    acc0 = _zeros_like_vma((n, co), feats, nbr)
    acc, _ = jax.lax.scan(step, acc0, (nbr.T, weight))
    return acc


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gather_conv_core(feats, nbr, weight, precision, symmetric_adjoint):
    return _gather_conv_fwd_impl(feats, nbr, weight, precision)


def _gc_fwd(feats, nbr, weight, precision, symmetric_adjoint):
    # save only the inputs — naive autodiff of the offset scan stacks the
    # gathered [K, N, Ci] operand as a residual (gigabytes at KITTI scale)
    return _gather_conv_fwd_impl(feats, nbr, weight, precision), (feats, nbr, weight)


def _gc_bwd(precision, symmetric_adjoint, res, g_out):
    feats, nbr, weight = res
    g_out = g_out.astype(jnp.float32)
    n_out, k = nbr.shape
    n_in = feats.shape[0]
    gb = g_out.astype(feats.dtype)

    if symmetric_adjoint and n_out == n_in:
        # Submanifold map: the adjoint rulebook is the offset-reversed map
        # (offset -d sits at index K-1-k in itertools.product order). One
        # reversed-map gather of g_out per offset then serves BOTH cotangents:
        #   dX  += gathered_gout @ W_k^T
        #   dW_k = feats^T @ gathered_gout      (change of variables j=nbr(i,k))
        # — gathers beat scatter-adds on TPU and backward touches each array
        # once instead of twice.
        gbo = gb  # g_out in compute dtype

        def step(dx, inp):
            nbr_k, w_k = inp  # column K-1-k of nbr, weight W_k
            mask = (nbr_k >= 0)[:, None].astype(feats.dtype)
            safe = jnp.where(nbr_k >= 0, nbr_k, 0)
            go = gbo[safe] * mask
            dW_k = jnp.dot(
                feats.T, go, preferred_element_type=jnp.float32,
                precision=precision,
            )
            dx = dx + jnp.dot(
                go.astype(jnp.float32), w_k.astype(jnp.float32).T,
                preferred_element_type=jnp.float32, precision=precision,
            )
            return dx, dW_k

        dx, dW = jax.lax.scan(
            step, _zeros_like_vma(feats.shape, feats, nbr, g_out),
            (nbr.T[::-1], weight)
        )
        return dx.astype(feats.dtype), None, dW.astype(weight.dtype)

    def step_dw(_, inp):
        nbr_k, w_k = inp
        mask = (nbr_k >= 0)[:, None].astype(feats.dtype)
        safe = jnp.where(nbr_k >= 0, nbr_k, 0)
        g = feats[safe] * mask  # recomputed gather (cheap, frees the residual)
        dW_k = jnp.dot(
            g.T, gb, preferred_element_type=jnp.float32, precision=precision
        )
        return 0, dW_k

    _, dW = jax.lax.scan(step_dw, 0, (nbr.T, weight))

    # strided rulebook (M != N): generic scatter-add adjoint
    def step_dx(dx, inp):
        nbr_k, w_k = inp
        mask = (nbr_k >= 0)[:, None].astype(jnp.float32)
        safe = jnp.where(nbr_k >= 0, nbr_k, 0)
        contrib = jnp.dot(
            g_out, w_k.astype(jnp.float32).T,
            preferred_element_type=jnp.float32, precision=precision,
        ) * mask
        return dx.at[safe].add(contrib, mode="drop"), None

    dx, _ = jax.lax.scan(
        step_dx, _zeros_like_vma(feats.shape, feats, nbr, g_out),
        (nbr.T, weight)
    )
    return dx.astype(feats.dtype), None, dW.astype(weight.dtype)


_gather_conv_core.defvjp(_gc_fwd, _gc_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bulk_conv_core(feats, nbr, weight, symmetric_adjoint):
    return _bulk_conv_fwd_impl(feats, nbr, weight)


def _bulk_conv_fwd_impl(feats, nbr, weight):
    """Small-ci sparse conv: ONE bulk gather + ONE matmul.

    The offset-scan formulation degenerates for tiny channel counts — the
    k=5 ci=1 stem becomes 125 scalar-width gathers plus 125 [N,1]x[1,co]
    outer products (measured 75 ms at 69k voxels on v5e). Bulk form:
    G[i] = concat_k x[nbr[i,k]] is [N, K*ci] (small when K*ci is), and the
    conv is one MXU matmul G @ W.reshape(K*ci, co)."""
    m, k = nbr.shape
    ci = feats.shape[1]
    safe = jnp.where(nbr >= 0, nbr, 0)
    g = feats[safe] * (nbr >= 0)[:, :, None].astype(feats.dtype)  # [M,K,ci]
    return jnp.dot(
        g.reshape(m, k * ci), weight.reshape(k * ci, weight.shape[2]),
        preferred_element_type=jnp.float32,
    )


def _bulk_fwd(feats, nbr, weight, symmetric_adjoint):
    return _bulk_conv_fwd_impl(feats, nbr, weight), (feats, nbr, weight)


def _bulk_bwd(symmetric_adjoint, res, g_out):
    feats, nbr, weight = res
    m, k = nbr.shape
    n, ci = feats.shape
    co = weight.shape[2]
    gb = g_out.astype(feats.dtype)
    # dW: recompute the bulk gather, one contraction over rows
    safe = jnp.where(nbr >= 0, nbr, 0)
    g = feats[safe] * (nbr >= 0)[:, :, None].astype(feats.dtype)
    dW = jnp.dot(
        g.reshape(m, k * ci).T, gb, preferred_element_type=jnp.float32
    ).reshape(k, ci, co)
    if symmetric_adjoint and m == n:
        # dx[j] = sum_k gout[nbr_rev[j,k]] @ W_k^T, in offset chunks so the
        # gathered [N, kc, co] operand stays bounded
        nrev = nbr[:, ::-1]
        w_adj = weight.astype(feats.dtype)  # [K, ci, co]
        chunk = max(1, 2048 // max(co, 1))
        dx = jnp.zeros((n, ci), jnp.float32)
        for s in range(0, k, chunk):
            nc = nrev[:, s:s + chunk]
            kc = nc.shape[1]
            safe_c = jnp.where(nc >= 0, nc, 0)
            gc = gb[safe_c] * (nc >= 0)[:, :, None].astype(feats.dtype)
            wc = w_adj[s:s + kc].transpose(0, 2, 1).reshape(kc * co, ci)
            dx = dx + jnp.dot(gc.reshape(n, kc * co), wc,
                              preferred_element_type=jnp.float32)
        return dx.astype(feats.dtype), None, dW.astype(weight.dtype)
    # strided rulebook: generic per-offset scatter-add adjoint
    def step_dx(dx, inp):
        nbr_k, w_k = inp
        mask = (nbr_k >= 0)[:, None].astype(jnp.float32)
        safe_k = jnp.where(nbr_k >= 0, nbr_k, 0)
        c = jnp.dot(g_out.astype(jnp.float32), w_k.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32) * mask
        return dx.at[safe_k].add(c, mode="drop"), None

    dx, _ = jax.lax.scan(
        step_dx, _zeros_like_vma(feats.shape, feats, nbr, g_out),
        (nbr.T, weight)
    )
    return dx.astype(feats.dtype), None, dW.astype(weight.dtype)


_bulk_conv_core.defvjp(_bulk_fwd, _bulk_bwd)

# bulk path when the gathered operand row K*ci is matmul-sized
_BULK_MAX_KCI = 256


def gather_conv(
    feats: jax.Array,
    nbr: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    compute_dtype=None,
    precision=None,
    symmetric_adjoint: bool = False,
) -> jax.Array:
    """Submanifold sparse conv: out[i] = sum_k W[k] @ feats[nbr[i, k]].

    Custom VJP: backward recomputes the per-offset gathers instead of saving
    the stacked [K, N, Ci] operand (the dominant memory term at scale).
    With `symmetric_adjoint=True` (valid ONLY for submanifold maps whose
    offset list is negation-symmetric in product order — all k^3 kernels and
    their axis subsets), dX uses the offset-reversed rulebook as a gather
    instead of a scatter-add.

    Args:
      feats: [N, Ci] padded features (invalid rows must be 0).
      nbr: [M, K] neighbor row indices into feats, -1 where absent. M == N for
        submanifold convs; strided rulebooks may have M != N.
      weight: [K, Ci, Co].
      bias: optional [Co].
    Returns [M, Co] (invalid rows stay 0 iff their nbr rows are -1/zeros; callers
    re-mask after bias-adds).
    """
    dt = compute_dtype or feats.dtype
    ci = feats.shape[1]
    if nbr.shape[1] * ci <= _BULK_MAX_KCI:
        out = _bulk_conv_core(
            feats.astype(dt), nbr, weight.astype(dt), symmetric_adjoint
        )
    else:
        out = _gather_conv_core(
            feats.astype(dt), nbr, weight.astype(dt), precision,
            symmetric_adjoint
        )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(feats.dtype)


@jax.custom_vjp
def _paired_gather_conv_core(feats, nbr_fwd, nbr_adj, weight):
    return _gather_conv_fwd_impl(feats, nbr_fwd, weight, None)


def _pgc_fwd(feats, nbr_fwd, nbr_adj, weight):
    return (_gather_conv_fwd_impl(feats, nbr_fwd, weight, None),
            (feats, nbr_fwd, nbr_adj, weight))


def _pgc_bwd(res, g_out):
    """All-gather adjoint via the paired rulebook.

    `nbr_adj` column d lists, for each INPUT row f, the output row o with
    (o, f, d) in the forward book (exactly the down_map/up_map pairing of
    `ops/asym`, where the adjoint of gathering fine site stride*o + d is
    gathering coarse site (f - d)/stride at the SAME offset index). This
    replaces the generic scatter-add dX path — XLA scatter-adds measured
    pathologically slow on TPU for these books (the Cylinder3D step ran
    at 0.015 scans/s on them, BENCH.md round-5) — with pure row-gathers.
    """
    feats, nbr_fwd, nbr_adj, weight = res
    gb = g_out.astype(feats.dtype)

    def step_dw(_, inp):
        nbr_k, w_k = inp
        del w_k
        mask = (nbr_k >= 0)[:, None].astype(feats.dtype)
        safe = jnp.where(nbr_k >= 0, nbr_k, 0)
        g = feats[safe] * mask
        return 0, jnp.dot(g.T, gb, preferred_element_type=jnp.float32)

    _, dW = jax.lax.scan(step_dw, 0, (nbr_fwd.T, weight))

    def step_dx(dx, inp):
        nbr_k, w_k = inp  # adj column d, weight W_d
        mask = (nbr_k >= 0)[:, None].astype(feats.dtype)
        safe = jnp.where(nbr_k >= 0, nbr_k, 0)
        go = gb[safe] * mask
        return dx + jnp.dot(
            go.astype(jnp.float32), w_k.astype(jnp.float32).T,
            preferred_element_type=jnp.float32,
        ), None

    dx, _ = jax.lax.scan(
        step_dx, _zeros_like_vma(feats.shape, feats, nbr_adj, g_out),
        (nbr_adj.T, weight),
    )
    return dx.astype(feats.dtype), None, None, dW.astype(weight.dtype)


_paired_gather_conv_core.defvjp(_pgc_fwd, _pgc_bwd)


def paired_gather_conv(
    feats: jax.Array,
    nbr_fwd: jax.Array,
    nbr_adj: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    compute_dtype=None,
) -> jax.Array:
    """Strided sparse conv with an explicit adjoint rulebook (all gathers).

    out[o] = sum_d W[d] @ feats[nbr_fwd[o, d]]; backward gathers g_out via
    `nbr_adj` (see `_pgc_bwd`). Both books must enumerate the SAME
    (o, f, d) pairs from their two sides — `ops/asym.strided_down_map` /
    `inverse_up_map` are such a pair (in either role order).
    """
    dt = compute_dtype or feats.dtype
    out = _paired_gather_conv_core(
        feats.astype(dt), nbr_fwd, nbr_adj, weight.astype(dt))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(feats.dtype)


def down_conv(
    feats: jax.Array,
    parent: jax.Array,
    dcode: jax.Array,
    weight: jax.Array,
    cap_out: int,
    bias: jax.Array | None = None,
    precision=None,
) -> jax.Array:
    """Strided k=2 s=2 sparse conv (fine level -> coarse level).

    Args:
      feats: [Nf, Ci] fine features (invalid rows 0).
      parent: [Nf] coarse row per fine voxel (cap_out where invalid).
      dcode: [Nf] int in [0,8): kernel offset code of this voxel w.r.t. parent.
      weight: [8, Ci, Co].
      cap_out: coarse capacity.
    Returns [cap_out, Co].
    """
    ci = feats.shape[1]
    co = weight.shape[2]
    wide = weight.transpose(1, 0, 2).reshape(ci, 8 * co)  # [Ci, 8*Co]
    h = jnp.dot(feats, wide, preferred_element_type=jnp.float32, precision=precision)
    h = h.reshape(-1, 8, co)
    h = jnp.take_along_axis(h, dcode[:, None, None], axis=1)[:, 0, :]
    seg = jnp.clip(parent, 0, cap_out)
    out = jax.ops.segment_sum(h, seg, num_segments=cap_out + 1)[:cap_out]
    if bias is not None:
        out = out + bias
    return out.astype(feats.dtype)


def up_conv(
    coarse_feats: jax.Array,
    parent: jax.Array,
    dcode: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    precision=None,
) -> jax.Array:
    """Transpose k=2 s=2 sparse conv (coarse level -> existing fine coords).

    Args:
      coarse_feats: [Nc, Ci] (invalid rows 0).
      parent/dcode: the same PoolPlan arrays used by the down conv at this edge.
      weight: [8, Ci, Co].
    Returns [Nf, Co].
    """
    nc, ci = coarse_feats.shape
    co = weight.shape[2]
    safe = jnp.where(parent < nc, parent, 0)
    g = coarse_feats[safe] * (parent < nc)[:, None].astype(coarse_feats.dtype)
    wide = weight.transpose(1, 0, 2).reshape(ci, 8 * co)
    h = jnp.dot(g, wide, preferred_element_type=jnp.float32, precision=precision).reshape(-1, 8, co)
    out = jnp.take_along_axis(h, dcode[:, None, None], axis=1)[:, 0, :]
    if bias is not None:
        out = out + bias
    return out.astype(coarse_feats.dtype)


def masked_batch_norm_stats(x: jax.Array, valid: jax.Array):
    """Mean/var over valid rows only. Returns (mean [C], var [C] biased, count)."""
    m = valid[:, None].astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(valid.astype(x.dtype)), 1.0)
    mean = jnp.sum(x * m, axis=0) / cnt
    var = jnp.sum(jnp.square(x - mean) * m, axis=0) / cnt
    return mean, var, cnt
