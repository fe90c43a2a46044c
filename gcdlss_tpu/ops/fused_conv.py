"""Fused windowed gather-GEMM submanifold sparse conv (Pallas TPU kernel).

Replaces the XLA row-gather conv path (`ops/conv.gather_conv`) for large
levels. The XLA path materializes K x N x C bytes of random row-gathers per
conv — the round-1 bottleneck at ~1% MXU. This kernel exploits two facts
about the plan's rulebooks:

  1. Voxels are sorted by (batch, x, y, z), so each kernel offset's neighbor
     map is monotone with slope ~1: within a B-row output block, offset k's
     neighbors span a small window of rows. One double-buffered DMA stages a
     shared W-row window in VMEM and each offset addresses a WK-row
     sub-window of it.
  2. Mosaic supports in-register *lane* gathers on int32 ([S, 128] blocks).
     Features are staged transposed ([C, N]) and bitcast to int32 (two bf16
     channels per lane word), so a row gather becomes per-128-lane-tile
     dynamic gathers + selects at VPU rate.

Per output block: gathered features for all K offsets are stacked into one
[K*C, B] operand and contracted against the [K*C, Co] flattened weights in a
single MXU dot. Rulebook entries falling outside the window ("far" — rare by
construction on sorted LiDAR data) are finished exactly by a fixed-capacity
COO pass in XLA.

Backward (custom VJP) uses the offset-reversed rulebook (negation-symmetric
offset lists: column K-1-k is the adjoint map of column k): one kernel pass
gathers g_out windows and yields BOTH dX (gstack contracted with W) and dW
(x contracted with gstack), with the dW accumulator block revisited across
the sequential grid.

Measured on TPU v5e (tools/kernel_bisect_bench.py, tunnel-safe timing,
262k voxels, C=96, 13% fill): window DMA is the dominant cost; the offset
loop is lowered as a fori_loop to keep Mosaic compile times sane.

Reference parity target: MinkowskiEngine gather-GEMM-scatter
(`/root/reference/models/minkunet.py:62-132`).
"""

from __future__ import annotations

import functools
import os

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

# Default window geometry (measured on KITTI-density scans, span_stats):
# per-offset spans at B=256 are p99.9 < 330; WK=512 with 128-aligned
# sub-starts covers them; W=2048 covers the whole-block span (p99 ~1130,
# max ~1170 incl. batch boundaries).
BLOCK = int(os.environ.get("GCDLSS_FUSED_BLOCK", 256))
WINDOW = int(os.environ.get("GCDLSS_FUSED_WINDOW", 2048))
SUBWIN = int(os.environ.get("GCDLSS_FUSED_SUBWIN", 512))
FAR_CAP = 4096

_ENABLED = os.environ.get("GCDLSS_FUSED_CONV", "1") != "0"

def enabled_on(platform: str | None = None) -> bool:
    if not (_ENABLED and _HAS_PLTPU):
        return False
    if platform is None:
        platform = jax.default_backend()
    return platform == "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cpad_for(ci: int) -> int:
    # xwin is [cpad//2, W] int32 (VMEM tile (8, 128)): cpad//2 must be a
    # multiple of 8, i.e. cpad a multiple of 16; 32 keeps the bitcast-paired
    # gst rows MXU-friendly without padding 32/64/96-channel convs to 128.
    return max(32, _round_up(ci, 32))


# --------------------------------------------------------------------------
# window planning (pure XLA; identical subgraphs across convs of one level
# are CSE'd by XLA within the jitted step)
# --------------------------------------------------------------------------


def plan_windows(nbr: jax.Array, block: int = None, window: int = None,
                 subwin: int = None, far_cap: int = FAR_CAP,
                 n_src: int | None = None):
    """Window/sub-window starts + window-relative rulebook for the kernel.

    Returns (ws [NB], ss [NB, K8], relT [NB*K8, B], far (out, in, k) COO
    with -1 padding, far_count).

    Layout note: every elementwise/reduce op here runs on a [k8-sublane,
    N-lane] transposed view. The naive [N, 27] formulation keeps a 27-wide
    minor dimension — lane-padded 4.75x by XLA — and measured 70 ms on v5e
    for one call (tools/fused_isolate_bench.py); one up-front relayout into
    [nb, k8, block] makes the rest full-lane work.
    """
    block = block or BLOCK
    window = window or WINDOW
    subwin = subwin or SUBWIN
    # a window narrower than the sub-window would clip sub-starts with a
    # negative upper bound and silently corrupt the conv output (env knobs
    # GCDLSS_FUSED_WINDOW/SUBWIN are user-tunable)
    assert window >= subwin, (
        f"window ({window}) must be >= subwin ({subwin})")
    assert subwin // 128 <= 127, (
        f"subwin ({subwin}) exceeds the 7-bit ntile pack (max 16256)")
    n, k = nbr.shape
    # the DMA'd window lives in the SOURCE buffer (the rulebook's target
    # rows): for submanifold convs that's the same n rows, but pool convs
    # read the other level — clip window starts against ITS length
    n_src = n if n_src is None else n_src
    nb = n // block
    k8 = _round_up(k, 8)
    # one relayout: [N, k] -> [nb, k8, block] (pad offsets with -1)
    nbrT = jnp.full((n, k8), -1, jnp.int32)
    nbrT = jax.lax.dynamic_update_slice(nbrT, nbr, (0, 0))
    nbrT = nbrT.reshape(nb, block, k8).transpose(0, 2, 1)  # [nb, k8, block]

    big = jnp.where(nbrT >= 0, nbrT, jnp.int32(1 << 30))
    mins = jnp.min(big, axis=2)  # [nb, k8]
    anymin = jnp.min(mins, axis=1)  # [nb]
    ws = jnp.clip(
        jnp.where(anymin >= (1 << 30), 0, anymin),
        0, max(n_src - window, 0),
    ).astype(jnp.int32) & ~jnp.int32(127)
    wlen_rows = window  # scalar: static base-clip bound below
    ws_out = ws
    # ragged gather planning: rulebooks are monotone per offset, so the rows
    # a 128-lane chunk needs span far fewer tiles than the sub-window. Per
    # (block, offset, 128-chunk): a 128-aligned chunk base plus the number
    # of 128-tiles actually touched, packed into the base's free low 7 bits
    # (base is 128-aligned; ntile <= subwin/128 <= 16). The kernel's tile
    # scan predicates on ntile and skips absent tiles — measured avg 1.09
    # of 4 tiles needed at L0 k3, 0.74 for the k5 stem (49% of chunks
    # entirely empty). ss is [nb, k8*nch] int32, chunk-minor.
    nch = block // 128
    bigc = big.reshape(nb, k8, nch, 128)
    minc = jnp.min(bigc, axis=3)  # [nb, k8, nch]
    base = (
        jnp.clip(jnp.where(minc >= (1 << 30), 0, minc - ws[:, None, None]),
                 0, wlen_rows - subwin).astype(jnp.int32) & ~jnp.int32(127)
    )
    rel = bigc - (ws[:, None, None, None] + base[:, :, :, None])
    near = (bigc < (1 << 30)) & (rel >= 0) & (rel < subwin)
    relc = jnp.where(near, rel, -1).astype(jnp.int32)
    maxrel = jnp.max(relc, axis=3)  # [nb, k8, nch]
    ntile = jnp.where(maxrel < 0, 0, (maxrel >> 7) + 1).astype(jnp.int32)
    if os.environ.get("GCDLSS_FUSED_RAGGED", "1") == "0":
        # bisection fallback: scan every tile of the sub-window for non-empty
        # chunks (the kernel's full-variant branch), keeping per-chunk bases
        ntile = jnp.where(ntile > 0, subwin // 128, 0)
    ss = (base | ntile).reshape(nb, k8 * nch)
    relT = relc.reshape(nb * k8, block)
    near = near.reshape(nb, k8, block)

    far_mask = (nbrT >= 0) & ~near  # [nb, k8, block]
    far_count = jnp.sum(far_mask.astype(jnp.int32))

    # `jnp.nonzero` measured 22 ms at 69k voxels (sort-like lowering) while
    # far_count is zero on every measured scan — extract only when needed
    def _extract(_):
        (flat_idx,) = jnp.nonzero(far_mask.reshape(-1), size=far_cap,
                                  fill_value=-1)
        # flat index decodes as ((b*k8 + kk)*block + col)
        col = flat_idx % block
        bk = flat_idx // block
        far_k = jnp.where(flat_idx >= 0, bk % k8, 0).astype(jnp.int32)
        far_out = jnp.where(
            flat_idx >= 0, (bk // k8) * block + col, -1
        ).astype(jnp.int32)
        safe_flat = jnp.where(flat_idx >= 0, flat_idx, 0)
        far_in = jnp.where(
            flat_idx >= 0, nbrT.reshape(-1)[safe_flat], -1
        ).astype(jnp.int32)
        return far_out, far_in, far_k

    def _empty(_):
        return (jnp.full((far_cap,), -1, jnp.int32),
                jnp.full((far_cap,), -1, jnp.int32),
                jnp.zeros((far_cap,), jnp.int32))

    far = jax.lax.cond(far_count > 0, _extract, _empty, None)
    return ws_out, ss, relT, far, far_count


def _poison_if_far_overflow(x: jax.Array, far_n) -> jax.Array:
    """far entries beyond FAR_CAP cannot be represented (static shapes), and
    silently truncating them would corrupt the conv output invisibly —
    poison it with NaN instead so tests/losses fail loudly. far_count is 0
    on every measured real scan (BENCH.md); this can only fire on
    adversarial geometry or a user-shrunken GCDLSS_FUSED_WINDOW."""
    return jnp.where(far_n > FAR_CAP, jnp.asarray(jnp.nan, x.dtype), x)


def far_contribution(feats: jax.Array, far, weight: jax.Array,
                     n_out: int) -> jax.Array:
    """Exact COO finish for rulebook entries outside the kernel windows.

    Plain differentiable jnp (JAX autodiff supplies its adjoints)."""
    far_out, far_in, far_k = far
    ok = far_in >= 0
    g = feats[jnp.where(ok, far_in, 0)] * ok[:, None].astype(feats.dtype)

    def step(acc, inp):
        k_idx, w_k = inp
        sel = (far_k == k_idx)[:, None].astype(feats.dtype)
        acc = acc + jnp.dot(g * sel, w_k, preferred_element_type=jnp.float32)
        return acc, None

    kk = weight.shape[0]
    contrib, _ = jax.lax.scan(
        step, jnp.zeros((far_out.shape[0], weight.shape[2]), jnp.float32),
        (jnp.arange(kk, dtype=jnp.int32), weight),
    )
    out = jnp.zeros((n_out, weight.shape[2]), jnp.float32)
    return out.at[jnp.where(ok, far_out, n_out)].add(contrib, mode="drop")


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------


def _gather_all_offsets(i, win, ss_ref, rel_ref, gst, *, B, WK, K, C2):
    K8 = _round_up(K, 8)
    """Per kernel offset: lane-gather its rows from its sub-window of `win`
    into gst rows [k*C2:(k+1)*C2].

    The offset loop is python-UNROLLED on purpose: a fori_loop variant (all
    rel/ss/gst accesses dynamically indexed by k) measured 77.8 ms vs 8.7 ms
    unrolled on v5e (tools/fori_diag_bench.py) — Mosaic lowers the dynamic
    sublane indexing badly. Unrolling costs one slow Mosaic compile per conv
    shape (minutes through this rig's remote-compile tunnel, then cached by
    the persistent compilation cache).

    Ragged tile skip: ss packs (128-aligned chunk base | ntile) per
    (block, offset, 128-lane chunk) — see plan_windows. The WK//128-tile
    scan dispatches on ntile through static variants (1, 2, full) under
    pl.when, so chunks whose rows span one or two tiles (the monotone-
    rulebook common case) skip the rest, and empty chunks skip the window
    reads entirely."""
    WKT = WK // 128
    nch = B // 128
    # measured ntile distribution on 262k ring-scan books: ~90% of chunks
    # empty, ~10% one tile, 0.3% two — a 2-tile variant buys nothing
    # (avg reads 0.110 vs 0.116) while costing ~40% more unrolled Mosaic
    # code, which is minutes of remote compile per conv shape on this rig
    variants = sorted({1, WKT})
    # one unconditional zero of the whole scratch (covers the ~90% empty
    # chunks and the k8 padding rows) beats 2*K*nch predicated small stores
    gst[:] = jnp.zeros((K8 * C2, B), jnp.int32)
    for k in range(K):
        # per-offset skip: chunk emptiness is spatially correlated, so most
        # offsets are empty in BOTH chunks of a block; one scalar branch
        # retires them. The rel->div/mod VPU index math lives INSIDE the
        # branch so empty offsets pay zero vector work (hoisting it out for
        # all K measured as the dominant per-block cost once the gathers
        # themselves were ragged-skipped).
        ssv = [ss_ref[i, k * nch + c] for c in range(nch)]
        nts = [v & 127 for v in ssv]
        any_k = nts[0] > 0
        for c in range(1, nch):
            any_k = any_k | (nts[c] > 0)

        @pl.when(any_k)
        def _(k=k, ssv=ssv, nts=nts):
            rel2 = rel_ref[k:k + 1, :]  # [1, B]
            # div/mod on the [1, B] row BEFORE the C2-row repeat: two
            # [C2, B]-sized passes (the repeats) instead of three
            # (repeat + shift + and at full size)
            div = pltpu.repeat(rel2 >> 7, C2, axis=0)  # [C2, B]
            mod = pltpu.repeat(rel2 & 127, C2, axis=0)
            for cch in range(nch):
                nt = nts[cch]
                base = pl.multiple_of(ssv[cch] - nt, 128)
                dv = div[:, cch * 128:(cch + 1) * 128]
                idx = mod[:, cch * 128:(cch + 1) * 128]

                for vi, v in enumerate(variants):
                    lo = variants[vi - 1] if vi else 0
                    pred = ((nt > lo) & (nt <= v)) if v < WKT else (nt > lo)

                    @pl.when(pred)
                    def _(v=v, dv=dv, idx=idx, base=base, k=k, cch=cch):
                        acc = jnp.zeros((C2, 128), jnp.int32)
                        for t in range(v):
                            tile = win[:, pl.ds(
                                pl.multiple_of(base + t * 128, 128), 128)]
                            part = jnp.take_along_axis(tile, idx, axis=1)
                            acc = jnp.where(dv == t, part, acc)
                        gst[k * C2:(k + 1) * C2,
                            cch * 128:(cch + 1) * 128] = acc


def _window_dma(src_hbm, buf, ws_ref, j, sem_slot, W, op):
    """Issue (op='start') or complete (op='wait') block j's window copy."""
    dma = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[j], 128), W)], buf,
        sem_slot)
    getattr(dma, op)()


def _fwd_kernel(ws_ref, ss_ref, xT_hbm, rel_ref, w_ref, o_ref,
                win_a, win_b, gst, sem, *, B, W, WK, K, Cpad, Co,
                TOUT=False):
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    C2 = Cpad // 2
    dbuf = win_b is not None

    def start(buf, j, s):
        _window_dma(xT_hbm, buf, ws_ref, j, sem.at[s], W, "start")

    def wait(buf, j, s):
        _window_dma(xT_hbm, buf, ws_ref, j, sem.at[s], W, "wait")

    if not dbuf:
        # single-buffered: large-channel convs trade DMA overlap for VMEM
        start(win_a, i, 0)
        wait(win_a, i, 0)
        _gather_all_offsets(i, win_a, ss_ref, rel_ref, gst,
                            B=B, WK=WK, K=K, C2=C2)
    else:
        even = jax.lax.rem(i, 2) == 0

        @pl.when(i == 0)
        def _():
            start(win_a, 0, 0)

        @pl.when((i + 1 < nb) & even)
        def _():
            start(win_b, i + 1, 1)

        @pl.when((i + 1 < nb) & ~even)
        def _():
            start(win_a, i + 1, 0)

        @pl.when(even)
        def _():
            wait(win_a, i, 0)
            _gather_all_offsets(i, win_a, ss_ref, rel_ref, gst,
                                B=B, WK=WK, K=K, C2=C2)

        @pl.when(~even)
        def _():
            wait(win_b, i, 1)
            _gather_all_offsets(i, win_b, ss_ref, rel_ref, gst,
                                B=B, WK=WK, K=K, C2=C2)

    g = pltpu.bitcast(gst[:], jnp.bfloat16)  # [K*Cpad, B]
    if TOUT:
        # transposed-activation mode: out block [Co, B] — same MXU work,
        # swapped dot operands; no output transpose anywhere. NOTE: the
        # contract-dim-0-of-both form IS Mosaic's native MXU orientation
        # here — rewriting this as the "canonical" [Co,K]@[K,B] with a
        # pre-transposed weight forced a per-grid-step weight relayout and
        # measured 10x slower fwd (38 vs 3.7 ms at 384->256ch, 2026-08-17
        # HW logs). Do not "fix" the orientation.
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        o_ref[:] = jax.lax.dot_general(
            g, w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _bwd_kernel(ws_ref, ss_ref, goT_hbm, rel_ref, wmat_ref, xT_ref,
                dx_ref, dw_hbm, win_a, win_b, gst, dw_acc, sem,
                *, B, W, WK, K, Copad, CiChunk, TOUT=False):
    ci_c = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    C2 = Copad // 2
    dbuf = win_b is not None

    def start(buf, j, s):
        _window_dma(goT_hbm, buf, ws_ref, j, sem.at[s], W, "start")

    def wait(buf, j, s):
        _window_dma(goT_hbm, buf, ws_ref, j, sem.at[s], W, "wait")

    if not dbuf:
        # single-buffered: large-channel convs trade DMA overlap for VMEM
        start(win_a, i, 0)
        wait(win_a, i, 0)
        _gather_all_offsets(i, win_a, ss_ref, rel_ref, gst,
                            B=B, WK=WK, K=K, C2=C2)
    else:
        even = jax.lax.rem(i, 2) == 0

        @pl.when(i == 0)
        def _():
            start(win_a, 0, 0)

        @pl.when((i + 1 < nb) & even)
        def _():
            start(win_b, i + 1, 1)

        @pl.when((i + 1 < nb) & ~even)
        def _():
            start(win_a, i + 1, 0)

        @pl.when(even)
        def _():
            wait(win_a, i, 0)
            _gather_all_offsets(i, win_a, ss_ref, rel_ref, gst,
                                B=B, WK=WK, K=K, C2=C2)

        @pl.when(~even)
        def _():
            wait(win_b, i, 1)
            _gather_all_offsets(i, win_b, ss_ref, rel_ref, gst,
                                B=B, WK=WK, K=K, C2=C2)

    g = pltpu.bitcast(gst[:], jnp.bfloat16)  # [K*Copad, B]
    if TOUT:
        # dX chunk [CiChunk, B] = wmat_chunk^T @ g (transposed-activation);
        # contract-dim-0 form is Mosaic-native — see the fwd kernel's note
        dx_ref[:] = jax.lax.dot_general(
            wmat_ref[:], g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        # dX chunk [B, CiChunk] = g^T @ wmat_chunk
        dx_ref[:] = jax.lax.dot_general(
            g, wmat_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # dW chunk [CiChunk, K*Copad] += xT_chunk @ g^T   (contract lanes = rows)
    # accumulated in a VMEM scratch, written to HBM once at the last block:
    # a VMEM *output* block here gets double-buffered by the pipeliner and
    # blows the 16 MB scoped-VMEM limit for 256-channel convs
    x_chunk = pltpu.bitcast(xT_ref[:], jnp.bfloat16)  # [CiChunk, B]
    contrib = jax.lax.dot_general(
        x_chunk, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dw_acc[:] = contrib

    @pl.when(i > 0)
    def _():
        dw_acc[:] = dw_acc[:] + contrib

    @pl.when(i == nb - 1)
    def _():
        cp = pltpu.make_async_copy(
            dw_acc, dw_hbm.at[pl.ds(ci_c * CiChunk, CiChunk), :],
            sem.at[2])
        cp.start()
        cp.wait()


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------


def _pad_T(x: jax.Array, cpad: int) -> jax.Array:
    """[N, C] -> transposed, channel-pair-packed int32 [cpad//2, N].

    Channels (2j, 2j+1) pack into one int32 lane-word; the in-kernel
    `pltpu.bitcast(int32 -> bf16)` unpack places the LOW half at the even
    sublane, matching little-endian `lax.bitcast_convert_type` packing."""
    n, c = x.shape
    xp = jnp.zeros((n, cpad), jnp.bfloat16)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(jnp.bfloat16), (0, 0))
    xi = jax.lax.bitcast_convert_type(
        xp.reshape(n, cpad // 2, 2), jnp.int32
    )  # [N, cpad//2]
    return xi.T


def _fwd_geometry(cpad: int, co: int, k: int):
    """(window, dbuf) for the forward kernel under a ~14 MB VMEM budget."""
    k8 = _round_up(k, 8)

    def est(w, nbuf):
        return (nbuf * (cpad // 2) * w * 4      # window buffer(s)
                + k8 * (cpad // 2) * BLOCK * 4  # gst
                + k8 * cpad * co * 2            # wflat (resident)
                + 2 * BLOCK * co * 4)           # out blocks

    # the half-window fallbacks never go below SUBWIN (plan_windows asserts
    # window >= subwin; see the backward path's equivalent clamp)
    half = max(SUBWIN, WINDOW // 2)
    for w, nbuf in ((WINDOW, 2), (WINDOW, 1), (half, 1)):
        if est(w, nbuf) <= 14 * 1024 * 1024:
            return w, nbuf == 2
    return half, False


@functools.partial(jax.jit,
                   static_argnames=("k", "B", "W", "WK", "dbuf", "interpret",
                                    "tout"))
def _fused_fwd_one(xT, ws, ss, relT, wflat, *, k, B, W, WK, dbuf=True,
                   interpret=False, tout=False):
    """wflat is k8-padded: [k8*cpad, co] with zero rows for offsets >= k, so
    stale gst rows beyond the real offsets contribute nothing to the dot.
    With `tout` the output is the transposed [co, n] block layout."""
    cpad, n = 2 * xT.shape[0], xT.shape[1]
    nbk, _ = relT.shape
    co = wflat.shape[1]
    k8 = _round_up(k, 8)
    nb = nbk // k8
    kern = functools.partial(_fwd_kernel, B=B, W=W, WK=WK, K=k, Cpad=cpad,
                             Co=co, TOUT=tout)
    if dbuf:
        win_scratch = [pltpu.VMEM((cpad // 2, W), jnp.int32),
                       pltpu.VMEM((cpad // 2, W), jnp.int32)]
    else:
        base = kern

        def kern(ws_r, ss_r, xT_r, rel_r, w_r, o_r, win_a, gst, sem):
            base(ws_r, ss_r, xT_r, rel_r, w_r, o_r, win_a, None, gst, sem)

        win_scratch = [pltpu.VMEM((cpad // 2, W), jnp.int32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k8, B), lambda i, ws, ss: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((co, B), lambda i, ws, ss: (0, i)) if tout
                   else pl.BlockSpec((B, co), lambda i, ws, ss: (i, 0))),
        scratch_shapes=win_scratch + [
            pltpu.VMEM((k8 * cpad // 2, B), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    n_out = nb * B  # rulebook rows; == n for submanifold convs
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((co, n_out) if tout else (n_out, co),
                                       jnp.float32),
        interpret=interpret,
        # the default 16 MB scoped-VMEM budget is shared with the enclosing
        # program's co-scheduled prefetches: the SAME 384->256ch kernel that
        # compiles standalone OOM'd at 21.7M inside the full discover step
        # (2026-08-17 HW logs). Self-usage tops out ~14 MB (_fwd_geometry);
        # 32 MB leaves co-scheduling headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(ws, ss, xT, relT, wflat)


@functools.partial(jax.jit,
                   static_argnames=("k", "B", "W", "WK", "interpret",
                                    "tout"))
def _fused_bwd_one(goT, xT, ws, ss, relT_rev, wmat, *, k, B, W, WK,
                   interpret=False, tout=False):
    """Returns (dX [N, Cpad] f32, dW_flat [Cpad, K8*Copad] f32).

    wmat is k8-padded ([k8*copad, cpad], zero rows beyond the real offsets)
    and dw's lane dim is k8*copad — a multiple of 128, which the final
    VMEM->HBM dw DMA requires; the caller slices the real [k, ci, co] out."""
    copad, n = 2 * goT.shape[0], goT.shape[1]
    cpad = 2 * xT.shape[0]
    k8 = _round_up(k, 8)
    nb = relT_rev.shape[0] // k8
    n = nb * B  # adjoint-rulebook rows; == goT lanes for subm convs

    # ci_chunk sized to a ~13 MB VMEM budget: the dw output block
    # [ci_chunk, k*copad] f32 dominates at large channel counts (256-ch
    # convs OOM'd the 16 MB scoped vmem at ci_chunk=128); large channel
    # counts also shrink the DMA window and drop double-buffering.
    # ci_chunk MUST DIVIDE cpad: `min(cpad, 128)` silently floor-divided
    # cpad=192 (the decoder's 128+64-concat convs) to ONE chunk, leaving dx
    # channels 128-191 and the dw tail unwritten — NaN in interpret mode,
    # stale garbage on HW (round-4 regression test test_fused_bwd_ci192).
    # cpad is a 32-multiple (_cpad_for), so a 32-mult divisor <= 128 always
    # exists; prefer the largest (fewer grid sweeps re-gather the window).
    ci_chunk = next(d for d in (128, 96, 64, 32) if cpad % d == 0)
    dbuf = copad <= 128
    # Single ci sweep when VMEM affords it: the ci-chunk grid axis re-DMAs
    # the window and re-gathers gst once PER CHUNK (gst depends only on the
    # block index), so chunking exactly doubles the 256-ch backward's
    # gather+DMA (HW: 256-ch fwd+bwd 17.75 -> 13.69 ms unchunked). The
    # ESTIMATE below undercounts real scoped usage: the pipeliner
    # double-buffers every BlockSpec operand incl. the resident wmat (the
    # 384-ch decoder-concat adjoint estimated 24.8 MB, measured 35.46 MB
    # scoped, and OOM'd the 32 MB limit inside the full discover step).
    # The 20 MB budget admits the 256-ch convs (est 18.1, compiles
    # in-step) and keeps the 384-ch adjoints chunked.
    est_full = (
        (2 if dbuf else 1) * (copad // 2) * W * 4  # window buffer(s)
        + k8 * (copad // 2) * B * 4                # gst
        + k8 * copad * cpad * 2                    # wmat (resident)
        + cpad * k8 * copad * 4                    # dw_acc
        + 2 * cpad * B * 4 + (cpad // 2) * B * 4 * 2  # dx out + xT blocks
    )
    # (non-tout dx blocks put ci on the LANE dim, which must stay a
    # 128-multiple; the tout/cols default puts it on sublanes, any 8-mult)
    if (cpad > ci_chunk and est_full <= 20 * 1024 * 1024
            and (tout or cpad % 128 == 0)):
        ci_chunk = cpad
    n_chunks = cpad // ci_chunk
    kern = functools.partial(_bwd_kernel, B=B, W=W, WK=WK, K=k, Copad=copad,
                             CiChunk=ci_chunk, TOUT=tout)
    if dbuf:
        win_scratch = [
            pltpu.VMEM((copad // 2, W), jnp.int32),
            pltpu.VMEM((copad // 2, W), jnp.int32),
        ]
    else:
        base = kern

        def kern(ws, ss, goT, rel, wmat, xT, dx, dw, win_a, gst, dwa, sem):
            base(ws, ss, goT, rel, wmat, xT, dx, dw, win_a, None, gst, dwa,
                 sem)

        win_scratch = [pltpu.VMEM((copad // 2, W), jnp.int32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k8, B), lambda c, i, ws, ss: (i, 0)),
            pl.BlockSpec((k8 * copad, ci_chunk), lambda c, i, ws, ss: (0, c)),
            pl.BlockSpec((ci_chunk // 2, B), lambda c, i, ws, ss: (c, i)),
        ],
        out_specs=(
            (pl.BlockSpec((ci_chunk, B), lambda c, i, ws, ss: (c, i)) if tout
             else pl.BlockSpec((B, ci_chunk), lambda c, i, ws, ss: (i, c))),
            pl.BlockSpec(memory_space=pl.ANY),  # dw written by explicit DMA
        ),
        scratch_shapes=win_scratch + [
            pltpu.VMEM((k8 * copad // 2, B), jnp.int32),
            pltpu.VMEM((ci_chunk, k8 * copad), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((cpad, n) if tout else (n, cpad),
                                 jnp.float32),
            jax.ShapeDtypeStruct((cpad, k8 * copad), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # see the forward core's note on the shared scoped-VMEM budget
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(ws, ss, goT, relT_rev, wmat, xT)


# --------------------------------------------------------------------------
# grid-chunking drivers
#
# The scalar-prefetch staging pads ss's minor dim to 128 lanes in the 1 MB
# SMEM (measured: a [nb, 32] int32 ss allocated exactly nb*128*4 bytes), so
# one pallas_call tops out around nb ~ 1790 blocks. Levels beyond that
# (batch-8 stems: nb = 2160) are split into equal chunks of <= NB_MAX grid
# blocks over the SAME Mosaic kernel: the rulebook arrays slice cleanly
# along nb (window starts are absolute rows into the full source buffer,
# which stays a whole ANY-space operand), padded tail blocks carry rel = -1
# and gather exact zeros, and the per-chunk dw partials sum. Single-chunk
# calls emit byte-identical programs to the unchunked form, preserving the
# persistent compile cache.
# --------------------------------------------------------------------------

NB_MAX = int(os.environ.get("GCDLSS_FUSED_NB_MAX", "1536"))


def _nb_limit(k8: int, B: int) -> int:
    # ss stages [nb, k8 * (B//128)] int32 into SMEM, lane-padded to 128:
    # wide-offset books (the k5 stem: 128*2 = 256 lanes) halve the block
    # budget relative to the k3 default
    lanes = max(128, k8 * (B // 128))
    return min(NB_MAX, (896 * 1024 // 4) // lanes)


def _chunk_geometry(nb: int, nb_max: int):
    nch = -(-nb // nb_max)
    nbc = -(-nb // nch)
    return nch, nbc, nch * nbc


def _pad_books(ws, ss, relT, k8, B, nb, nbp):
    ws_p = jnp.concatenate([ws, jnp.zeros((nbp - nb,), jnp.int32)])
    ss_p = jnp.concatenate(
        [ss, jnp.zeros((nbp - nb, ss.shape[1]), jnp.int32)], axis=0)
    rel_p = jnp.concatenate(
        [relT, jnp.full(((nbp - nb) * k8, B), -1, jnp.int32)], axis=0)
    return ws_p, ss_p, rel_p


def _fused_fwd_core(xT, ws, ss, relT, wflat, *, k, B, W, WK, dbuf=True,
                    interpret=False, tout=False):
    k8 = _round_up(k, 8)
    nb = ws.shape[0]
    nb_max = _nb_limit(k8, B)
    if nb <= nb_max:
        return _fused_fwd_one(xT, ws, ss, relT, wflat, k=k, B=B, W=W, WK=WK,
                              dbuf=dbuf, interpret=interpret, tout=tout)
    nch, nbc, nbp = _chunk_geometry(nb, nb_max)
    # padded tail blocks carry ws=0 and rel=-1 books, gathering exact zeros
    ws_p, ss_p, rel_p = _pad_books(ws, ss, relT, k8, B, nb, nbp)
    outs = [
        _fused_fwd_one(
            xT, ws_p[c * nbc:(c + 1) * nbc], ss_p[c * nbc:(c + 1) * nbc],
            rel_p[c * nbc * k8:(c + 1) * nbc * k8], wflat,
            k=k, B=B, W=W, WK=WK, dbuf=dbuf, interpret=interpret, tout=tout)
        for c in range(nch)
    ]
    out = jnp.concatenate(outs, axis=1 if tout else 0)
    return out[:, :nb * B] if tout else out[:nb * B]


def _fused_bwd_core(goT, xT, ws, ss, relT_rev, wmat, *, k, B, W, WK,
                    interpret=False, tout=False):
    k8 = _round_up(k, 8)
    nb = relT_rev.shape[0] // k8
    nb_max = _nb_limit(k8, B)
    if nb <= nb_max:
        return _fused_bwd_one(goT, xT, ws, ss, relT_rev, wmat, k=k, B=B,
                              W=W, WK=WK, interpret=interpret, tout=tout)
    nch, nbc, nbp = _chunk_geometry(nb, nb_max)
    ws_p, ss_p, rel_p = _pad_books(ws, ss, relT_rev, k8, B, nb, nbp)
    # xT is blocked by the nb grid axis in the backward kernel (it feeds the
    # dW contraction), so its lane dim must cover the padded blocks too
    xT_p = jnp.concatenate(
        [xT, jnp.zeros((xT.shape[0], (nbp - nb) * B), xT.dtype)], axis=1)
    dxs, dw = [], None
    for c in range(nch):
        dx_c, dw_c = _fused_bwd_one(
            goT, xT_p[:, c * nbc * B:(c + 1) * nbc * B],
            ws_p[c * nbc:(c + 1) * nbc], ss_p[c * nbc:(c + 1) * nbc],
            rel_p[c * nbc * k8:(c + 1) * nbc * k8], wmat,
            k=k, B=B, W=W, WK=WK, interpret=interpret, tout=tout)
        dxs.append(dx_c)
        dw = dw_c if dw is None else dw + dw_c
    dx = jnp.concatenate(dxs, axis=1 if tout else 0)
    dx = dx[:, :nb * B] if tout else dx[:nb * B]
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_core(feats, nbr, weight, interpret):
    out, _ = _fused_core_fwd(feats, nbr, weight, interpret)
    return out


def _fused_core_fwd(feats, nbr, weight, interpret):
    n, ci = feats.shape
    k, _, co = weight.shape
    cpad = _cpad_for(ci)
    k8 = _round_up(k, 8)
    w_f, dbuf_f = _fwd_geometry(cpad, co, k)
    ws, ss, relT, far, far_n = plan_windows(nbr, window=w_f)
    xT = _pad_T(feats, cpad)
    wflat = jnp.zeros((k8, cpad, co), jnp.bfloat16)
    wflat = jax.lax.dynamic_update_slice(
        wflat, weight.astype(jnp.bfloat16), (0, 0, 0)
    ).reshape(k8 * cpad, co)
    out = _fused_fwd_core(xT, ws, ss, relT, wflat, k=k, dbuf=dbuf_f,
                          B=BLOCK, W=w_f, WK=SUBWIN, interpret=interpret)
    # the COO finish costs ~3-5 ms even with zero entries (27-step scan of
    # [far_cap, C] dots) — skip it entirely on the (typical) far-free path
    out = jax.lax.cond(
        far_n > 0,
        lambda o: o + far_contribution(feats, far, weight, n),
        lambda o: o,
        out,
    )
    return _poison_if_far_overflow(out, far_n), (feats, nbr, weight, xT)


def _fused_core_bwd(interpret, res, g_out):
    """Adjoint via the offset-reversed rulebook.

    The fwd near/far classification is NOT symmetric under rulebook
    transposition (per-(block,offset) windows), so the backward builds its
    OWN window plan over nbr_rev — kernel(near) + COO(far) of that plan is
    complete on its own, independent of the fwd split."""
    feats, nbr, weight, xT = res
    n, ci = feats.shape
    k, _, co = weight.shape
    cpad = 2 * xT.shape[0]  # xT is channel-pair-packed int32 [cpad//2, N]
    copad = _cpad_for(co)
    g_out = g_out.astype(jnp.float32)
    goT = _pad_T(g_out, copad)
    nbr_rev = nbr[:, ::-1]
    # large-channel adjoints use a smaller window (VMEM budget; see
    # _fused_bwd_core) — the extra out-of-window entries go to the COO pass
    w2 = WINDOW if copad <= 128 else max(SUBWIN, WINDOW // 2)
    ws2, ss2, relT2, far2, far_n2 = plan_windows(nbr_rev, window=w2)
    # wmat[k*copad + co_i, ci] = weight[k, ci, co_i]  (k8-padded)
    k8 = _round_up(k, 8)
    wmat = jnp.zeros((k8, copad, cpad), jnp.bfloat16)
    wmat = jax.lax.dynamic_update_slice(
        wmat, weight.astype(jnp.bfloat16).transpose(0, 2, 1), (0, 0, 0)
    ).reshape(k8 * copad, cpad)
    dx_pad, dw_flat = _fused_bwd_core(
        goT, xT, ws2, ss2, relT2, wmat, k=k,
        B=BLOCK, W=w2, WK=SUBWIN, interpret=interpret,
    )
    dx = dx_pad[:, :ci]
    dw = dw_flat.reshape(cpad, k8, copad)[:ci, :k, :co].transpose(1, 0, 2)

    # far part of the REVERSED plan: entry (b, j=nbr_rev[b,k], k) demands
    # dx[b] += W_k^T gout[j]  and  dW_k += feats[b] gout[j]^T
    # (skipped entirely on the typical far-free path — see plan_windows)
    def _with_far(args):
        dx, dw = args
        w_adj = weight.transpose(0, 2, 1)  # [K, Co, Ci]
        dx = dx + far_contribution(g_out, far2, w_adj, n)
        far_out, far_in, far_k = far2
        ok = (far_in >= 0)[:, None].astype(jnp.float32)
        gx = feats[jnp.where(far_in >= 0, far_out, 0)].astype(jnp.float32) * ok
        gg = g_out[jnp.where(far_in >= 0, far_in, 0)] * ok

        def dw_step(_, k_idx):
            sel = (far_k == k_idx)[:, None].astype(jnp.float32)
            return 0, jnp.dot((gx * sel).T, gg,
                              preferred_element_type=jnp.float32)

        _, dw_far = jax.lax.scan(dw_step, 0, jnp.arange(k, dtype=jnp.int32))
        return dx, dw + dw_far

    dx, dw = jax.lax.cond(far_n2 > 0, _with_far, lambda a: a, (dx, dw))
    dx = _poison_if_far_overflow(dx, far_n2)
    dw = _poison_if_far_overflow(dw, far_n2)
    return dx.astype(feats.dtype), None, dw.astype(weight.dtype)


_fused_core.defvjp(lambda f, nb, w, i: _fused_core_fwd(f, nb, w, i),
                   _fused_core_bwd)


def fused_subm_conv(
    feats: jax.Array,
    nbr: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for `gather_conv` on submanifold negation-symmetric rulebooks.

    Requires feats rows to be a multiple of BLOCK and >= WINDOW; callers
    should fall back to `gather_conv` otherwise (see `supported`).
    """
    out = _fused_core(feats, nbr, weight, interpret)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(feats.dtype)


# --------------------------------------------------------------------------
# transposed-activation ("T") mode
#
# Activations stay [C, N] bf16 between convs (BN/ReLU/residual/concat are all
# elementwise or axis-0 ops there), so the per-conv [N, C] -> packed [C/2, N]
# relayout — an XLA transpose measured ~4-5 ms/conv at 262k voxels — becomes
# a pure elementwise pack: channels (j, C/2+j) combine into one int32 lane
# word (contiguous half-slices, no stride-2 sublane access). The packed bf16
# row order is then the interleaved split-halves permutation, absorbed into
# the (tiny) weight staging instead of the (huge) activations. Kernels write
# transposed output blocks by swapping the dot operands — zero extra cost.
# --------------------------------------------------------------------------


def _chan_perm(cpad: int) -> np.ndarray:
    """bf16-row r (after in-kernel int32->bf16 bitcast) -> channel index."""
    perm = np.empty(cpad, np.int64)
    perm[0::2] = np.arange(cpad // 2)
    perm[1::2] = np.arange(cpad // 2) + cpad // 2
    return perm


def _inv_chan_perm(cpad: int) -> np.ndarray:
    perm = _chan_perm(cpad)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(cpad)
    return inv


def _pack_cols(xT: jax.Array, cpad: int) -> jax.Array:
    """[C, N] float -> packed int32 [cpad//2, N] (split-halves convention:
    word j = channel j | channel (cpad/2 + j) << 16). Pure elementwise."""
    c, n = xT.shape
    xb = xT.astype(jnp.bfloat16)
    if c < cpad:
        xb = jnp.concatenate(
            [xb, jnp.zeros((cpad - c, n), jnp.bfloat16)], axis=0)
    lo = jax.lax.bitcast_convert_type(xb[: cpad // 2], jnp.uint16)
    hi = jax.lax.bitcast_convert_type(xb[cpad // 2:], jnp.uint16)
    word = lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)
    return jax.lax.bitcast_convert_type(word, jnp.int32)


def _wflat_perm(weight: jax.Array, cpad: int, k8: int) -> jax.Array:
    """[k, ci, co] -> [k8*cpad, co] bf16 with rows in bf16-unpack order."""
    k, ci, co = weight.shape
    wp = jnp.zeros((k, cpad, co), jnp.bfloat16)
    wp = jax.lax.dynamic_update_slice(wp, weight.astype(jnp.bfloat16),
                                      (0, 0, 0))
    wp = wp[:, _chan_perm(cpad), :]
    wflat = jnp.zeros((k8, cpad, co), jnp.bfloat16)
    wflat = jax.lax.dynamic_update_slice(wflat, wp, (0, 0, 0))
    return wflat.reshape(k8 * cpad, co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_core_T(xT, nbr, weight, interpret):
    out, _ = _fused_core_T_fwd(xT, nbr, weight, interpret)
    return out


def _fused_core_T_fwd(xT, nbr, weight, interpret):
    ci, n = xT.shape
    k, _, co = weight.shape
    cpad = _cpad_for(ci)
    k8 = _round_up(k, 8)
    # (A "compacted fill-only FLOPs" path was built and HW-benched here in
    # rounds 3-4 and REMOVED: see BENCH.md round-4 compact-conv burial —
    # the dense dot is ~2.7 ms of the 9.4 ms L3 conv, gather+DMA dominate,
    # and the compacted r round-trip + per-tile window DMA cost more than
    # the dot waste it recovers. Measured 17.3 ms vs 9.4 ms windowed.)
    w_f, dbuf_f = _fwd_geometry(cpad, co, k)
    ws, ss, relT, far, far_n = plan_windows(nbr, window=w_f)
    xTp = _pack_cols(xT, cpad)
    wflat = _wflat_perm(weight, cpad, k8)
    out = _fused_fwd_core(xTp, ws, ss, relT, wflat, k=k, dbuf=dbuf_f,
                          B=BLOCK, W=w_f, WK=SUBWIN, interpret=interpret,
                          tout=True)  # [co, n] f32

    def _with_far(o):
        fc = far_contribution(xT.T, far, weight, n)  # rare: pays transposes
        return o + fc.T

    out = jax.lax.cond(far_n > 0, _with_far, lambda o: o, out)
    return _poison_if_far_overflow(out, far_n), (xT, nbr, weight, xTp)


def _fused_core_T_bwd(interpret, res, g_out):
    """Adjoint in the transposed layout; see `_fused_core_bwd`."""
    xT, nbr, weight, xTp = res
    ci, n = xT.shape
    k, _, co = weight.shape
    cpad = 2 * xTp.shape[0]
    copad = _cpad_for(co)
    g_out = g_out.astype(jnp.float32)  # [co, n]
    goT = _pack_cols(g_out, copad)
    nbr_rev = nbr[:, ::-1]
    w2 = WINDOW if copad <= 128 else max(SUBWIN, WINDOW // 2)
    ws2, ss2, relT2, far2, far_n2 = plan_windows(nbr_rev, window=w2)
    k8 = _round_up(k, 8)
    # wmat rows follow g's bf16-unpack (split-halves) order on copad; its
    # minor axis stays natural-cpad so dx rows come out in channel order
    wmat = jnp.zeros((k, copad, cpad), jnp.bfloat16)
    wmat = jax.lax.dynamic_update_slice(
        wmat, weight.astype(jnp.bfloat16).transpose(0, 2, 1), (0, 0, 0))
    wmat = wmat[:, _chan_perm(copad), :]
    wmat_p = jnp.zeros((k8, copad, cpad), jnp.bfloat16)
    wmat_p = jax.lax.dynamic_update_slice(wmat_p, wmat, (0, 0, 0))
    wmat_p = wmat_p.reshape(k8 * copad, cpad)
    dxT_pad, dw_flat = _fused_bwd_core(
        goT, xTp, ws2, ss2, relT2, wmat_p, k=k,
        B=BLOCK, W=w2, WK=SUBWIN, interpret=interpret, tout=True,
    )
    dxT = dxT_pad[:ci]  # [ci, n]
    # dw rows/lanes are in bf16-unpack order on BOTH axes: unpermute
    dw = dw_flat[_inv_chan_perm(cpad)].reshape(cpad, k8, copad)
    dw = dw[:, :, _inv_chan_perm(copad)][:ci, :k, :co].transpose(1, 0, 2)

    def _with_far(args):
        dxT, dw = args
        feats = xT.T  # rare path: pays the transposes inside the cond
        g_rows = g_out.T
        w_adj = weight.transpose(0, 2, 1)
        dxT = dxT + far_contribution(g_rows, far2, w_adj, n).T
        far_out, far_in, far_k = far2
        ok = (far_in >= 0)[:, None].astype(jnp.float32)
        gx = feats[jnp.where(far_in >= 0, far_out, 0)].astype(jnp.float32) * ok
        gg = g_rows[jnp.where(far_in >= 0, far_in, 0)] * ok

        def dw_step(_, k_idx):
            sel = (far_k == k_idx)[:, None].astype(jnp.float32)
            return 0, jnp.dot((gx * sel).T, gg,
                              preferred_element_type=jnp.float32)

        _, dw_far = jax.lax.scan(dw_step, 0, jnp.arange(k, dtype=jnp.int32))
        return dxT, dw + dw_far

    dxT, dw = jax.lax.cond(far_n2 > 0, _with_far, lambda a: a, (dxT, dw))
    dxT = _poison_if_far_overflow(dxT, far_n2)
    dw = _poison_if_far_overflow(dw, far_n2)
    return dxT.astype(xT.dtype), None, dw.astype(weight.dtype)


_fused_core_T.defvjp(lambda x, nb, w, i: _fused_core_T_fwd(x, nb, w, i),
                     _fused_core_T_bwd)


# ---- strided pool convs (down/up k2s2) through the same kernels ---------
#
# A pool conv is a gather-GEMM over an explicit rulebook just like the
# submanifold case, but its adjoint is NOT the column-reversed book: the
# adjoint of gathering children[j, d] (down) is gathering upmap[i, d] (up)
# with the transposed weights at the SAME offset d. The caller provides
# both books (plan.PoolPlan.children / upmap).


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_pool_core_T(xT, nbr_fwd, nbr_adj, weight, interpret):
    out, _ = _fused_pool_core_T_fwd(xT, nbr_fwd, nbr_adj, weight, interpret)
    return out


def _fused_pool_core_T_fwd(xT, nbr_fwd, nbr_adj, weight, interpret):
    ci, n_in = xT.shape
    k, _, co = weight.shape
    cpad = _cpad_for(ci)
    k8 = _round_up(k, 8)
    n_out = nbr_fwd.shape[0]
    w_f, dbuf_f = _fwd_geometry(cpad, co, k)
    ws, ss, relT, far, far_n = plan_windows(nbr_fwd, window=w_f, n_src=n_in)
    xTp = _pack_cols(xT, cpad)
    wflat = _wflat_perm(weight, cpad, k8)
    out = _fused_fwd_core(xTp, ws, ss, relT, wflat, k=k, dbuf=dbuf_f,
                          B=BLOCK, W=w_f, WK=SUBWIN, interpret=interpret,
                          tout=True)  # [co, n_out]

    def _with_far(o):
        fc = far_contribution(xT.T, far, weight, n_out)
        return o + fc.T

    out = jax.lax.cond(far_n > 0, _with_far, lambda o: o, out)
    return _poison_if_far_overflow(out, far_n), (xT, nbr_adj, weight, xTp)


def _fused_pool_core_T_bwd(interpret, res, g_out):
    """dx via the adjoint rulebook at the same offset index (no column
    flip), dW accumulated over the adjoint book's (row, entry, d) pairs —
    identical pairs to the forward book's, just enumerated from the other
    side."""
    xT, nbr_adj, weight, xTp = res
    ci, n_in = xT.shape
    k, _, co = weight.shape
    cpad = 2 * xTp.shape[0]
    copad = _cpad_for(co)
    g_out = g_out.astype(jnp.float32)  # [co, n_out]
    goT = _pack_cols(g_out, copad)
    w2 = WINDOW if copad <= 128 else max(SUBWIN, WINDOW // 2)
    ws2, ss2, relT2, far2, far_n2 = plan_windows(
        nbr_adj, window=w2, n_src=g_out.shape[1])
    k8 = _round_up(k, 8)
    wmat = jnp.zeros((k, copad, cpad), jnp.bfloat16)
    wmat = jax.lax.dynamic_update_slice(
        wmat, weight.astype(jnp.bfloat16).transpose(0, 2, 1), (0, 0, 0))
    wmat = wmat[:, _chan_perm(copad), :]
    wmat_p = jnp.zeros((k8, copad, cpad), jnp.bfloat16)
    wmat_p = jax.lax.dynamic_update_slice(wmat_p, wmat, (0, 0, 0))
    wmat_p = wmat_p.reshape(k8 * copad, cpad)
    dxT_pad, dw_flat = _fused_bwd_core(
        goT, xTp, ws2, ss2, relT2, wmat_p, k=k,
        B=BLOCK, W=w2, WK=SUBWIN, interpret=interpret, tout=True,
    )
    dxT = dxT_pad[:ci]  # [ci, n_in]
    dw = dw_flat[_inv_chan_perm(cpad)].reshape(cpad, k8, copad)
    dw = dw[:, :, _inv_chan_perm(copad)][:ci, :k, :co].transpose(1, 0, 2)

    def _with_far(args):
        dxT, dw = args
        feats = xT.T
        g_rows = g_out.T
        w_adj = weight.transpose(0, 2, 1)
        dxT = dxT + far_contribution(g_rows, far2, w_adj, n_in).T
        far_out, far_in, far_k = far2
        ok = (far_in >= 0)[:, None].astype(jnp.float32)
        gx = feats[jnp.where(far_in >= 0, far_out, 0)].astype(jnp.float32) * ok
        gg = g_rows[jnp.where(far_in >= 0, far_in, 0)] * ok

        def dw_step(_, k_idx):
            sel = (far_k == k_idx)[:, None].astype(jnp.float32)
            return 0, jnp.dot((gx * sel).T, gg,
                              preferred_element_type=jnp.float32)

        _, dw_far = jax.lax.scan(dw_step, 0, jnp.arange(k, dtype=jnp.int32))
        return dxT, dw + dw_far

    dxT, dw = jax.lax.cond(far_n2 > 0, _with_far, lambda a: a, (dxT, dw))
    dxT = _poison_if_far_overflow(dxT, far_n2)
    dw = _poison_if_far_overflow(dw, far_n2)
    return dxT.astype(xT.dtype), None, None, dw.astype(weight.dtype)


_fused_pool_core_T.defvjp(
    lambda x, nf, na, w, i: _fused_pool_core_T_fwd(x, nf, na, w, i),
    _fused_pool_core_T_bwd)


def fused_pool_conv_T(
    xT: jax.Array,
    nbr_fwd: jax.Array,
    nbr_adj: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Strided k2s2 pool conv (down OR up) in the transposed layout.

    down: nbr_fwd = pool.children [capc, 8], nbr_adj = pool.upmap [capf, 8]
    up:   nbr_fwd = pool.upmap,  nbr_adj = pool.children
    Returns [Co, nbr_fwd.rows] in xT's dtype."""
    out = _fused_pool_core_T(xT, nbr_fwd, nbr_adj, weight, interpret)
    if bias is not None:
        out = out + bias.astype(jnp.float32)[:, None]
    return out.astype(xT.dtype)


def pool_supported(n_in: int, n_out: int, ci: int | None = None) -> bool:
    """Both sides need whole blocks; the window DMA sources the input (fwd)
    and the gradient (bwd) buffers, so both must hold one window. The fwd
    pass plans windows over the n_out-row book and the bwd over the
    n_in-row book (rows past the scalar-prefetch SMEM ceiling are handled
    by the grid-chunking drivers)."""
    return (n_in % BLOCK == 0 and n_out % BLOCK == 0
            and n_in >= WINDOW and n_out >= WINDOW
            and (ci is None or ci >= 32))


def fused_subm_conv_T(
    xT: jax.Array,
    nbr: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """`fused_subm_conv` in the transposed-activation layout.

    xT: [Ci, N] (bf16/f32), returns [Co, N] in xT's dtype. Same shape gates
    as `supported` (N multiple of BLOCK, >= WINDOW)."""
    out = _fused_core_T(xT, nbr, weight, interpret)
    if bias is not None:
        out = out + bias.astype(jnp.float32)[:, None]
    return out.astype(xT.dtype)


def fits_vmem(ci: int, co: int, kernel_volume: int) -> bool:
    """Would the fwd AND bwd kernels fit the scoped-VMEM budget at their
    most conservative geometry (half window, single buffer)?

    Mirrors `_fwd_geometry`'s estimator, which silently returned its last
    fallback even when over budget — fine for every MinkUNet shape (the
    widest, the 384->256 decoder concat, estimates 13.9 MB), but the
    Cylinder3D 512-ch stacks OOM'd Mosaic at 34.26 M scoped (round-5 HW
    log). Callers with wide channel counts must check this and fall back
    to the XLA gather path."""
    cpad = _cpad_for(ci)
    copad = _cpad_for(co)
    k8 = _round_up(kernel_volume, 8)
    half = max(SUBWIN, WINDOW // 2)
    budget = 14 * 1024 * 1024
    fwd = ((cpad // 2) * half * 4          # window buffer
           + k8 * (cpad // 2) * BLOCK * 4  # gst
           + k8 * cpad * co * 2            # wflat (resident)
           + 2 * BLOCK * co * 4)           # out blocks
    bwd = ((copad // 2) * half * 4
           + k8 * (copad // 2) * BLOCK * 4
           + k8 * copad * cpad * 2         # wmat (resident)
           + 32 * k8 * copad * 4           # dw_acc at the smallest ci_chunk
           + 2 * cpad * BLOCK * 4 + (cpad // 2) * BLOCK * 4 * 2)
    return fwd <= budget and bwd <= budget


def supported(n_rows: int, ci: int | None = None,
              kernel_volume: int | None = None) -> bool:
    """Shape gate: the kernel needs whole blocks and at least one window.

    Channel/kernel product is bounded so the unrolled offset loop stays
    Mosaic-compilable and gst fits VMEM: k3 convs for any ci, and the
    125-offset ci=1 stem (cpad=32, K*cpad=4000 — the XLA path runs its
    width-1 gathers at ~68 ms vs a few ms fused)."""
    ok = n_rows % BLOCK == 0 and n_rows >= WINDOW
    if ci is not None and kernel_volume is not None:
        small_k = kernel_volume <= 32 and ci >= 32
        stem_like = kernel_volume * _cpad_for(ci) <= 4096
        ok = ok and (small_k or stem_like)
    elif ci is not None:
        ok = ok and ci >= 32
    elif kernel_volume is not None:
        ok = ok and kernel_volume <= 32
    return ok
