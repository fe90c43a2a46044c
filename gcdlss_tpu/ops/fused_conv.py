"""Fused windowed gather-GEMM submanifold sparse conv (Pallas TPU kernel).

Replaces the XLA row-gather conv path (`ops/conv.gather_conv`) for large
levels. The XLA path streams ~K x N x C bytes of random row-gathers per conv
(~22 GB/s effective on v5e — the round-1 bottleneck at ~1% MXU). This kernel
exploits two facts about the plan's rulebooks:

  1. Voxels are sorted by (batch, x, y, z), so each kernel offset's neighbor
     map is monotone with slope ~1: within a B-row output block, offset k's
     neighbors span ~B + jitter rows (measured p99.9 jitter < 100 on
     KITTI-density scans). One DMA stages a shared W-row window in VMEM and
     each offset addresses a WK-row sub-window of it.
  2. Mosaic's `tpu.dynamic_gather` supports in-register *lane* gathers
     ([S, 128] blocks, int32). Features are staged transposed ([C, N]) and
     bitcast to int32 (two bf16 channels per sublane), so a row gather
     becomes per-128-lane-tile dynamic gathers + selects at VPU rate —
     no one-hot matmuls, no per-row DMAs.

Per output block: gathered features for all K offsets are stacked into one
[K*C, B] operand and contracted against the [K*C, Co] flattened weights in a
single MXU dot. Rulebook entries falling outside the window ("far" — rare by
construction, zero on measured LiDAR data at the default W/WK) are finished
exactly by a fixed-capacity COO pass in XLA.

Backward (custom VJP) uses the offset-reversed rulebook (negation-symmetric
offset lists: column K-1-k is the adjoint map of column k): one kernel pass
gathers g_out windows and yields BOTH dX (gstack @ W^T) and dW
(x^T @ gstack), chunked over Ci so the f32 dW accumulator fits VMEM.

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
BLOCK = 256
WINDOW = 2048
SUBWIN = 512
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


# --------------------------------------------------------------------------
# window planning (pure XLA; identical subgraphs across convs of one level
# are CSE'd by XLA within the jitted step)
# --------------------------------------------------------------------------


def plan_windows(nbr: jax.Array, block: int = BLOCK, window: int = WINDOW,
                 subwin: int = SUBWIN, far_cap: int = FAR_CAP):
    """Window/sub-window starts + window-relative rulebook for the kernel.

    Returns (ws [NB], ss [NB, K], relT [NB, K, B], far (out, in, k) COO with
    -1 padding, far_count).
    """
    n, k = nbr.shape
    nb = n // block
    big = jnp.where(nbr >= 0, nbr, jnp.int32(1 << 30)).reshape(nb, block, k)
    mins = jnp.min(big, axis=1)  # [NB, K]
    anymin = jnp.min(mins, axis=1)
    ws = jnp.clip(
        jnp.where(anymin >= (1 << 30), jnp.arange(nb, dtype=jnp.int32) * block,
                  anymin),
        0, max(n - window, 0),
    ).astype(jnp.int32) & ~jnp.int32(127)
    ss = (
        jnp.clip(jnp.where(mins >= (1 << 30), 0, mins - ws[:, None]),
                 0, window - subwin).astype(jnp.int32) & ~jnp.int32(127)
    )
    blk = jnp.arange(n, dtype=jnp.int32) // block
    rel = nbr - (ws[blk][:, None] + ss[blk, :])
    near = (nbr >= 0) & (rel >= 0) & (rel < subwin)
    rel = jnp.where(near, rel, -1).astype(jnp.int32)
    # [NB*K8, B]: per block, K sublane rows (padded to a multiple of 8) of
    # B lane-wise rel indices
    k8 = _round_up(k, 8)
    relT = rel.reshape(nb, block, k).transpose(0, 2, 1)
    relT = jnp.concatenate(
        [relT, jnp.full((nb, k8 - k, block), -1, jnp.int32)], axis=1
    ).reshape(nb * k8, block) if k8 != k else relT.reshape(nb * k, block)

    far_mask = (nbr >= 0) & ~near
    far_count = jnp.sum(far_mask.astype(jnp.int32))
    (flat_idx,) = jnp.nonzero(far_mask.reshape(-1), size=far_cap,
                              fill_value=-1)
    far_out = jnp.where(flat_idx >= 0, flat_idx // k, -1).astype(jnp.int32)
    far_k = jnp.where(flat_idx >= 0, flat_idx % k, 0).astype(jnp.int32)
    safe_flat = jnp.where(flat_idx >= 0, flat_idx, 0)
    far_in = jnp.where(
        flat_idx >= 0, nbr.reshape(-1)[safe_flat], -1
    ).astype(jnp.int32)
    return ws, ss, relT, (far_out, far_in, far_k), far_count


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


def _gather_stack(xwin_ref, ss_val, rel2, gst, k_idx, *, B, WK, C2):
    """Gather offset k's rows from the i32 window ref into gst rows.

    rel2: [1, B] window-relative indices (lane layout), -1 where absent.
    Sublane broadcast via pltpu.repeat (jnp broadcasts of row slices hit
    Mosaic "Invalid input layout")."""
    base = pl.multiple_of(ss_val, 128)
    relb = pltpu.repeat(rel2, C2, axis=0)  # [C2, B]
    div = relb >> 7
    mod = relb & 127
    for c in range(B // 128):
        dv = div[:, c * 128:(c + 1) * 128]
        idx = mod[:, c * 128:(c + 1) * 128]
        acc = jnp.zeros((C2, 128), jnp.int32)
        for t in range(WK // 128):
            tile = xwin_ref[:, pl.ds(pl.multiple_of(base + t * 128, 128), 128)]
            part = jnp.take_along_axis(tile, idx, axis=1)
            acc = jnp.where(dv == t, part, acc)
        gst[k_idx * C2:(k_idx + 1) * C2, c * 128:(c + 1) * 128] = acc


def _fwd_kernel(ws_ref, ss_ref, xT_hbm, rel_ref, w_ref, o_ref, xwin, gst, sem,
                *, B, W, WK, K, Cpad, Co):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        xT_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[i], 128), W)], xwin, sem
    )
    cp.start()
    cp.wait()
    C2 = Cpad // 2
    for k in range(K):
        _gather_stack(xwin, ss_ref[i, k], rel_ref[k:k + 1, :], gst, k,
                      B=B, WK=WK, C2=C2)
    g = pltpu.bitcast(gst[:], jnp.bfloat16)  # [K*Cpad, B]
    o_ref[:] = jax.lax.dot_general(
        g, w_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(ws_ref, ss_ref, goT_hbm, rel_ref, wmat_ref, xT_ref,
                dx_ref, dw_ref, gwin, gst, sem,
                *, B, W, WK, K, Copad, CiChunk):
    ci_c = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        goT_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[i], 128), W)], gwin, sem
    )
    cp.start()
    cp.wait()
    C2 = Copad // 2
    for k in range(K):
        _gather_stack(gwin, ss_ref[i, k], rel_ref[k:k + 1, :], gst, k,
                      B=B, WK=WK, C2=C2)
    g = pltpu.bitcast(gst[:], jnp.bfloat16)  # [K*Copad, B]
    # dX chunk [B, CiChunk] = g^T @ wmat_chunk
    dx_ref[:] = jax.lax.dot_general(
        g, wmat_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dW chunk [CiChunk, K*Copad] += xT_chunk @ g^T   (contract lanes = rows)
    x_chunk = pltpu.bitcast(xT_ref[:], jnp.bfloat16)  # [CiChunk, B]
    contrib = jax.lax.dot_general(
        x_chunk, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dw_ref[:] = contrib

    @pl.when(i > 0)
    def _():
        dw_ref[:] = dw_ref[:] + contrib


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


@functools.partial(jax.jit, static_argnames=("B", "W", "WK", "interpret"))
def _fused_fwd_core(xT, ws, ss, relT, wflat, *, B, W, WK, interpret=False):
    cpad, n = 2 * xT.shape[0], xT.shape[1]
    nbk, _ = relT.shape
    co = wflat.shape[1]
    k = ss.shape[1]
    k8 = _round_up(k, 8)
    nb = nbk // k8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k8, B), lambda i, ws, ss: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, co), lambda i, ws, ss: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((cpad // 2, W), jnp.int32),
            pltpu.VMEM((k * cpad // 2, B), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, B=B, W=W, WK=WK, K=k, Cpad=cpad, Co=co),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, co), jnp.float32),
        interpret=interpret,
    )(ws, ss, xT, relT, wflat)


@functools.partial(jax.jit, static_argnames=("B", "W", "WK", "interpret"))
def _fused_bwd_core(goT, xT, ws, ss, relT_rev, wmat, *, B, W, WK,
                    interpret=False):
    """Returns (dX [N, Cpad] f32, dW_flat [Cpad, K*Copad] f32)."""
    copad, n = 2 * goT.shape[0], goT.shape[1]
    cpad = 2 * xT.shape[0]
    k = ss.shape[1]
    k8 = _round_up(k, 8)
    nb = relT_rev.shape[0] // k8
    ci_chunk = min(cpad, 128)
    n_chunks = cpad // ci_chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k8, B), lambda c, i, ws, ss: (i, 0)),
            pl.BlockSpec((k * copad, ci_chunk), lambda c, i, ws, ss: (0, c)),
            pl.BlockSpec((ci_chunk // 2, B), lambda c, i, ws, ss: (c, i)),
        ],
        out_specs=(
            pl.BlockSpec((B, ci_chunk), lambda c, i, ws, ss: (i, c)),
            pl.BlockSpec((ci_chunk, k * copad), lambda c, i, ws, ss: (c, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((copad // 2, W), jnp.int32),
            pltpu.VMEM((k * copad // 2, B), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, B=B, W=W, WK=WK, K=k, Copad=copad,
                          CiChunk=ci_chunk),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, cpad), jnp.float32),
            jax.ShapeDtypeStruct((cpad, k * copad), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(ws, ss, goT, relT_rev, wmat, xT)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_core(feats, nbr, weight, interpret):
    out, _ = _fused_core_fwd(feats, nbr, weight, interpret)
    return out


def _fused_core_fwd(feats, nbr, weight, interpret):
    n, ci = feats.shape
    k, _, co = weight.shape
    cpad = _round_up(max(ci, 16), 16 if ci <= 16 else 128)
    ws, ss, relT, far, _ = plan_windows(nbr)
    xT = _pad_T(feats, cpad)
    wflat = jnp.zeros((k, cpad, co), jnp.bfloat16)
    wflat = jax.lax.dynamic_update_slice(
        wflat, weight.astype(jnp.bfloat16), (0, 0, 0)
    ).reshape(k * cpad, co)
    out = _fused_fwd_core(xT, ws, ss, relT, wflat,
                          B=BLOCK, W=WINDOW, WK=SUBWIN, interpret=interpret)
    out = out + far_contribution(feats, far, weight, n)
    return out, (feats, nbr, weight, xT)


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
    copad = _round_up(max(co, 16), 16 if co <= 16 else 128)
    g_out = g_out.astype(jnp.float32)
    goT = _pad_T(g_out, copad)
    nbr_rev = nbr[:, ::-1]
    ws2, ss2, relT2, far2, _ = plan_windows(nbr_rev)
    # wmat[k*copad + co_i, ci] = weight[k, ci, co_i]
    wmat = jnp.zeros((k, copad, cpad), jnp.bfloat16)
    wmat = jax.lax.dynamic_update_slice(
        wmat, weight.astype(jnp.bfloat16).transpose(0, 2, 1), (0, 0, 0)
    ).reshape(k * copad, cpad)
    dx_pad, dw_flat = _fused_bwd_core(
        goT, xT, ws2, ss2, relT2, wmat,
        B=BLOCK, W=WINDOW, WK=SUBWIN, interpret=interpret,
    )
    dx = dx_pad[:, :ci]
    dw = dw_flat.reshape(cpad, k, copad)[:ci, :, :co].transpose(1, 0, 2)

    # far part of the REVERSED plan: entry (b, j=nbr_rev[b,k], k) demands
    # dx[b] += W_k^T gout[j]  and  dW_k += feats[b] gout[j]^T
    w_adj = weight.transpose(0, 2, 1)  # [K, Co, Ci]
    dx = dx + far_contribution(g_out, far2, w_adj, n)
    far_out, far_in, far_k = far2
    ok = (far_in >= 0)[:, None].astype(jnp.float32)
    gx = feats[jnp.where(far_in >= 0, far_out, 0)].astype(jnp.float32) * ok
    gg = g_out[jnp.where(far_in >= 0, far_in, 0)] * ok

    def dw_step(_, k_idx):
        sel = (far_k == k_idx)[:, None].astype(jnp.float32)
        return 0, jnp.dot((gx * sel).T, gg, preferred_element_type=jnp.float32)

    _, dw_far = jax.lax.scan(dw_step, 0, jnp.arange(k, dtype=jnp.int32))
    dw = dw + dw_far
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


def supported(n_rows: int) -> bool:
    return n_rows % BLOCK == 0 and n_rows >= WINDOW
