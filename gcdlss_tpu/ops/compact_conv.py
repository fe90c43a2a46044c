"""Compacted per-offset forward conv: fill-only FLOPs (Pallas kernels).

Implements BENCH.md's "round-4 design sketch" over `compact_plan`:

  kernel A  r = X[in_list] @ W[tile_k]   — 128-entry tiles, every gst row
            a REAL rulebook entry, weight selected per tile by a dynamic
            sublane slice of the resident weight stack;
  kernel B  out[:, i] = sum_k r[:, pos[i, k]] — the existing windowed
            gather machinery with the block dot replaced by a VPU
            sum over offsets (scatter-free accumulation: per offset the
            positions are inverse ranks, monotone in i).

Both kernels ride `fused_conv.plan_windows` (ragged tile-skipping) and the
transposed-activation ("cols") layout: X arrives channel-pair packed
[cpad/2, N], r is packed between A and B, out leaves as [co, n] f32.
Out-of-window entries reuse `far_contribution` (A: per-entry offset from
tile_k; B: identity weights). Fill overflow (count > f_cap) poisons.

Forward-only by design: `_fused_core_T_bwd` builds its own window plan
from the reversed rulebook, so the compacted forward pairs with the
existing backward unchanged. Gated by GCDLSS_FUSED_COMPACT=1 (off until
hardware-validated; interpret-mode parity in tests/test_compact_conv.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_conv import (
    BLOCK,
    SUBWIN,
    WINDOW,
    _cpad_for,
    _gather_all_offsets,
    _round_up,
)

ABLOCK = 128  # kernel A tile = the compaction's 128-entry granularity


def compact_enabled() -> bool:
    return os.environ.get("GCDLSS_FUSED_COMPACT", "0") == "1"


def compact_min_ci() -> int:
    """Channel floor for routing fused convs through the compacted path.

    128 = the measured viability boundary (BENCH.md: per-offset tile spans
    fit the window and the recoverable FLOP waste is 3.3-3.5x only at the
    ci >= 128 levels). Env-tunable for HW sweeps and for interpret-mode
    tests, where ci=128 is too slow on this rig's 1-core CPU."""
    return int(os.environ.get("GCDLSS_COMPACT_MIN_CI", "128"))


def default_f_cap(n: int, k: int) -> int:
    """Static entry capacity: alpha * n padded to ABLOCK.

    Measured per-row fills on the bench population are 3.5 (L0 k3) to 9.2
    (L4 k3) of the k8=32 dense rows, plus <= k8 tiles of segment padding.
    alpha is env-tunable (GCDLSS_COMPACT_ALPHA); overflow poisons, so a
    too-small alpha is loud, never wrong.
    """
    alpha = float(os.environ.get("GCDLSS_COMPACT_ALPHA", "12"))
    return _round_up(int(alpha * n) + _round_up(k, 8) * ABLOCK, ABLOCK)


# --------------------------------------------------------------------------
# kernel A: r[co, m-tile] = W[tile_k]^T-dot gathered X rows
# --------------------------------------------------------------------------


def _gemm_kernel(tk_ref, ws_ref, ss_ref, xT_hbm, rel_ref, w_ref, r_ref,
                 win, gst, sem, *, W, K8, Cpad, Co):
    i = pl.program_id(0)
    C2 = Cpad // 2

    # pad tiles (f_cap - count, ~40% at the default alpha) are never
    # referenced by pos: skip their DMA/gather/dot entirely and leave the
    # out tile stale (kernel B's rel positions only point at real slots)
    @pl.when(tk_ref[i] >= 0)
    def _():
        cp = pltpu.make_async_copy(
            xT_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[i], 128), W)], win,
            sem.at[0])
        cp.start()
        cp.wait()
        _gather_all_offsets(i, win, ss_ref, rel_ref, gst,
                            B=ABLOCK, WK=SUBWIN, K=K8, C2=C2)
        g = pltpu.bitcast(gst[pl.ds(0, C2), :], jnp.bfloat16)  # [Cpad, AB]
        tk = jnp.maximum(tk_ref[i], 0)
        w = w_ref[pl.ds(tk * Cpad, Cpad), :]  # [Cpad, Co] dyn offset slice
        # r tile [Co, ABLOCK]: contract the packed-channel axis of both
        r_ref[:] = jax.lax.dot_general(
            w, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=("co", "interpret"))
def _compact_gemm(xTp, ws, ss, relT, wstack, tile_k, *, co,
                  interpret=False):
    """r [co, F_cap] f32. wstack: [k8*cpad, co] bf16 (natural row order)."""
    c2, n = xTp.shape
    cpad = 2 * c2
    nb = ws.shape[0]
    k8g = relT.shape[0] // nb  # plan k8 for the single-offset book (8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # tile_k, ws, ss
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xTp windows via DMA
            pl.BlockSpec((k8g, ABLOCK), lambda i, tk, ws, ss: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weight stack resident
        ],
        out_specs=pl.BlockSpec((co, ABLOCK), lambda i, tk, ws, ss: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((c2, WINDOW), jnp.int32),
            pltpu.VMEM((k8g * c2, ABLOCK), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gemm_kernel, W=WINDOW, K8=k8g, Cpad=cpad, Co=co),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((co, nb * ABLOCK), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(tile_k, ws, ss, xTp, relT, wstack)


# --------------------------------------------------------------------------
# kernel B: out[:, i-block] = sum_k gathered r rows
# --------------------------------------------------------------------------


BWIN = 512  # kernel B per-offset window; block + 128 <= BWIN always fits


def _sum_kernel(base_ref, rT_hbm, rel_ref, o_ref, win, sem,
                *, B, K, Copad):
    """out block [Copad, B] = sum over offsets of r rows at per-offset
    windows — each (block, offset) DMAs its own BWIN-row window (positions
    are segment-local ranks: span < B, so the window ALWAYS covers; no far
    path). Rows come out in bf16-unpack (perm) channel order."""
    i = pl.program_id(0)
    C2 = Copad // 2
    nch = B // 128
    o_ref[:] = jnp.zeros((Copad, B), jnp.float32)
    for k in range(K):

        @pl.when(base_ref[i, k] >= 0)
        def _(k=k):
            cp = pltpu.make_async_copy(
                rT_hbm.at[:, pl.ds(
                    pl.multiple_of(jnp.maximum(base_ref[i, k], 0), 128),
                    BWIN)],
                win, sem.at[0])
            cp.start()
            cp.wait()
            rel2 = rel_ref[k:k + 1, :]  # [1, B]
            relb = pltpu.repeat(rel2, C2, axis=0)  # [C2, B]
            div = relb >> 7
            mod = relb & 127  # -1 -> div -1 (matches no tile) -> stays 0
            for cch in range(nch):
                dv = div[:, cch * 128:(cch + 1) * 128]
                idx = mod[:, cch * 128:(cch + 1) * 128]
                gath = jnp.zeros((C2, 128), jnp.int32)
                for t in range(BWIN // 128):
                    tile = win[:, t * 128:(t + 1) * 128]
                    part = jnp.take_along_axis(tile, idx, axis=1)
                    gath = jnp.where(dv == t, part, gath)
                g = pltpu.bitcast(gath, jnp.bfloat16)  # [Copad, 128]
                o_ref[:, cch * 128:(cch + 1) * 128] = (
                    o_ref[:, cch * 128:(cch + 1) * 128]
                    + g.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _compact_sum(rTp, base, relT, *, interpret=False):
    """out [copad, n] f32 in the packed-row (bf16-unpack) channel order.

    base/relT from `compact_plan.pos_block_windows(pos, BLOCK, f_cap)`.
    """
    c2, f = rTp.shape
    copad = 2 * c2
    nb, k8 = base.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # base
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k8, BLOCK), lambda i, b: (i, 0)),
        ],
        out_specs=pl.BlockSpec((copad, BLOCK), lambda i, b: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((c2, BWIN), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_sum_kernel, B=BLOCK, K=k8, Copad=copad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((copad, nb * BLOCK), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(base, rTp, relT)


# --------------------------------------------------------------------------
# kernel C: dW[tile_k] += X[in_list]-tile @ g[out_list]-tile^T
# --------------------------------------------------------------------------


def _dw_kernel(tk_ref, wsx_ref, ssx_ref, wsg_ref, ssg_ref,
               xT_hbm, gT_hbm, relx_ref, relg_ref, o_ref,
               winx, wing, gstx, gstg, sem, *, W, K8G, C2x, C2g, KK):
    """Per 128-entry tile: gather the tile's X rows and g rows (each via
    its own windowed plan), outer-GEMM them, and accumulate into the
    offset's [Cpad, Copad] slab of the resident output stack. The output
    block index is constant, so Pallas keeps it in VMEM across the whole
    grid (zeroed at step 0, written back once at the end)."""
    i = pl.program_id(0)
    cpad, copad = 2 * C2x, 2 * C2g

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros((KK * cpad, copad), jnp.float32)

    # pad tiles contribute nothing: skip their DMAs/gathers/dot entirely
    @pl.when(tk_ref[i] >= 0)
    def _():
        cpx = pltpu.make_async_copy(
            xT_hbm.at[:, pl.ds(pl.multiple_of(wsx_ref[i], 128), W)], winx,
            sem.at[0])
        cpx.start()
        cpg = pltpu.make_async_copy(
            gT_hbm.at[:, pl.ds(pl.multiple_of(wsg_ref[i], 128), W)], wing,
            sem.at[1])
        cpg.start()
        cpx.wait()
        _gather_all_offsets(i, winx, ssx_ref, relx_ref, gstx,
                            B=ABLOCK, WK=SUBWIN, K=K8G, C2=C2x)
        cpg.wait()
        _gather_all_offsets(i, wing, ssg_ref, relg_ref, gstg,
                            B=ABLOCK, WK=SUBWIN, K=K8G, C2=C2g)
        gx = pltpu.bitcast(gstx[pl.ds(0, C2x), :], jnp.bfloat16)
        gg = pltpu.bitcast(gstg[pl.ds(0, C2g), :], jnp.bfloat16)
        d = jax.lax.dot_general(
            gx, gg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Cpad, Copad]
        off = pl.multiple_of(jnp.maximum(tk_ref[i], 0) * cpad, 8)
        o_ref[pl.ds(off, cpad), :] = o_ref[pl.ds(off, cpad), :] + d


@functools.partial(jax.jit, static_argnames=("kk", "interpret"))
def _compact_dw(xTp, gTp, wsx, ssx, relx, wsg, ssg, relg, tile_k, *, kk,
                interpret=False):
    """dW stack [kk*cpad, copad] f32, rows/lanes in bf16-unpack order."""
    c2x, n = xTp.shape
    c2g = gTp.shape[0]
    nt = wsx.shape[0]
    k8g = relx.shape[0] // nt
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # tile_k, wsx, ssx, wsg, ssg
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xTp windows via DMA
            pl.BlockSpec(memory_space=pl.ANY),  # gTp windows via DMA
            pl.BlockSpec((k8g, ABLOCK), lambda i, *_: (i, 0)),
            pl.BlockSpec((k8g, ABLOCK), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((kk * 2 * c2x, 2 * c2g), lambda i, *_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((c2x, WINDOW), jnp.int32),
            pltpu.VMEM((c2g, WINDOW), jnp.int32),
            pltpu.VMEM((k8g * c2x, ABLOCK), jnp.int32),
            pltpu.VMEM((k8g * c2g, ABLOCK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, W=WINDOW, K8G=k8g, C2x=c2x, C2g=c2g,
                          KK=kk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kk * 2 * c2x, 2 * c2g), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
    )(tile_k, wsx, ssx, wsg, ssg, xTp, gTp, relx, relg)


def compact_dw(xT: jax.Array, g_out: jax.Array, nbr: jax.Array,
               interpret: bool = False) -> jax.Array:
    """dW [k, ci, co] f32 at fill-only FLOPs (cols-layout operands).

    dW[k] = sum over offset-k entries of X[in] (x) g[out] — with the
    compacted layout that is one [Cpad, 128] x [128, Copad] MXU tile per
    128 entries, vs the windowed backward's dense k8-unrolled block dot
    (ref: MinkowskiEngine's conv_transposed kernel-map adjoint,
    /root/reference/models/minkunet.py:62-132 relies on ME for this)."""
    from .compact_plan import compact_rulebook
    from .fused_conv import (
        _inv_chan_perm,
        _pack_cols,
        _poison_if_far_overflow,
        plan_windows,
    )

    ci, n = xT.shape
    co = g_out.shape[0]
    kk = nbr.shape[1]
    cpad = _cpad_for(ci)
    copad = _cpad_for(co)
    f_cap = default_f_cap(n, kk)
    in_list, out_list, _, tile_k, cnt = compact_rulebook(nbr, f_cap)
    xTp = _pack_cols(xT, cpad)
    gTp = _pack_cols(g_out, copad)
    wsx, ssx, relx, farx, farnx = plan_windows(
        in_list[:, None], block=ABLOCK, n_src=n)
    wsg, ssg, relg, farg, farng = plan_windows(
        out_list[:, None], block=ABLOCK, n_src=n)
    dwp = _compact_dw(xTp, gTp, wsx, ssx, relx, wsg, ssg, relg, tile_k,
                      kk=kk, interpret=interpret)
    dw = dwp.reshape(kk, cpad, copad)
    dw = dw[:, _inv_chan_perm(cpad), :][:, :, _inv_chan_perm(copad)]
    dw = dw[:, :ci, :co]

    def _far_fix(dw):
        # an entry far in EITHER plan contributed 0 in the kernel (its
        # gathered row is zero); add X[in] (x) g[out] once per union slot
        fox, fix, _ = farx
        fog, fig, _ = farg
        xmask = (
            jnp.zeros((f_cap + 1,), jnp.bool_)
            .at[jnp.where(fox >= 0, fox, f_cap)]
            .set(True, mode="drop")
        )
        dup = xmask[jnp.clip(fog, 0, f_cap)]
        slots = jnp.concatenate([fox, jnp.where(dup, -1, fog)])
        xr = jnp.concatenate(
            [fix, in_list[jnp.clip(fog, 0, f_cap - 1)]])
        gr = jnp.concatenate(
            [out_list[jnp.clip(fox, 0, f_cap - 1)], fig])
        ok = (slots >= 0) & (xr >= 0) & (gr >= 0)
        ks = tile_k[jnp.clip(slots // ABLOCK, 0, f_cap // ABLOCK - 1)]
        okf = ok[:, None].astype(jnp.float32)
        # bf16-round the operands so the fixup's products bit-match the
        # kernel's MXU products (parity with the fused path stays ~f32
        # summation noise instead of bf16 rounding noise)
        xb = xT.T.astype(jnp.bfloat16).astype(jnp.float32)
        gb = g_out.T.astype(jnp.bfloat16).astype(jnp.float32)
        gx = xb[jnp.where(ok, xr, 0)] * okf
        gg = gb[jnp.where(ok, gr, 0)] * okf

        def step(_, k_idx):
            sel = ((ks == k_idx) & ok)[:, None].astype(jnp.float32)
            return 0, jnp.dot((gx * sel).T, gg,
                              preferred_element_type=jnp.float32)

        _, dwf = jax.lax.scan(step, 0, jnp.arange(kk, dtype=jnp.int32))
        return dw + dwf

    dw = jax.lax.cond(farnx + farng > 0, _far_fix, lambda d: d, dw)
    dw = _poison_if_far_overflow(dw, jnp.maximum(farnx, farng))
    return jnp.where(cnt > f_cap, jnp.asarray(jnp.nan, dw.dtype), dw)


def compact_bwd_T(xT: jax.Array, nbr: jax.Array, weight: jax.Array,
                  g_out: jax.Array, interpret: bool = False):
    """(dxT [ci, n] f32, dw [k, ci, co] f32) at fill-only FLOPs.

    dX is a submanifold conv of the cotangent over the column-reversed
    rulebook with transposed weights — exactly `compact_subm_conv_T`
    again; dW is the compacted outer-product accumulation above."""
    w_adj = weight.transpose(0, 2, 1)
    dxT = compact_subm_conv_T(g_out, nbr[:, ::-1], w_adj,
                              interpret=interpret)
    dw = compact_dw(xT, g_out, nbr, interpret=interpret)
    return dxT, dw


# --------------------------------------------------------------------------
# wrapper
# --------------------------------------------------------------------------


def compact_subm_conv_T(xT: jax.Array, nbr: jax.Array, weight: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """[co, n] f32 forward at fill-only FLOPs (cols layout).

    Semantically identical to `fused_subm_conv_T`'s forward (bf16 compute,
    f32 accumulation); parity-tested against the `gather_conv` oracle in
    tests/test_compact_conv.py. Overflowing the entry capacity or FAR_CAP
    poisons (NaN), never truncates.
    """
    from .compact_plan import compact_rulebook
    from .fused_conv import (
        FAR_CAP,
        _inv_chan_perm,
        _pack_cols,
        _poison_if_far_overflow,
        _wflat_perm,
        far_contribution,
        plan_windows,
    )

    ci, n = xT.shape
    k, _, co = weight.shape
    cpad = _cpad_for(ci)
    copad = _cpad_for(co)
    k8 = _round_up(k, 8)
    f_cap = default_f_cap(n, k)
    in_list, _, pos, tile_k, cnt = compact_rulebook(nbr, f_cap)
    xTp = _pack_cols(xT, cpad)
    wstack = _wflat_perm(weight, cpad, k8)  # [k8*cpad, co], bf16-perm rows

    # ---- kernel A: r = X[in_list] @ W[tile_k] --------------------------
    ws_a, ss_a, relT_a, far_a, farn_a = plan_windows(
        in_list[:, None], block=ABLOCK, n_src=n)
    r = _compact_gemm(xTp, ws_a, ss_a, relT_a, wstack, tile_k, co=co,
                      interpret=interpret)  # [co, f_cap]

    def _far_a(r):
        fo, fi, _ = far_a
        fk = jnp.where(fo >= 0, tile_k[jnp.clip(fo // ABLOCK, 0, None)], 0)
        fk = jnp.maximum(fk, 0)
        # bf16-round so the fixup matches the kernel's MXU products
        return r + far_contribution(
            xT.T.astype(jnp.bfloat16).astype(jnp.float32), (fo, fi, fk),
            weight.astype(jnp.bfloat16).astype(jnp.float32), f_cap).T

    r = jax.lax.cond(farn_a > 0, _far_a, lambda r: r, r)
    r = _poison_if_far_overflow(r, farn_a)

    # ---- kernel B: out = sum_k r[pos[:, k]] (structurally far-free) ----
    from .compact_plan import pos_block_windows

    rp = _pack_cols(r, copad)
    base_b, relT_b = pos_block_windows(pos, BLOCK, f_cap, window=BWIN)
    outp = _compact_sum(rp, base_b, relT_b, interpret=interpret)
    out = outp[_inv_chan_perm(copad)][:co]  # natural channel order [co, n]
    # fill overflow: entries beyond f_cap are unrepresented — poison
    return jnp.where(cnt > f_cap, jnp.asarray(jnp.nan, out.dtype), out)
