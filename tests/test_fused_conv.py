"""Fused windowed gather-GEMM conv (`ops/fused_conv`) vs `gather_conv` oracle.

Runs the Pallas kernel in interpret mode on CPU; the hardware path shares
the traced program.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gcdlss_tpu.ops.conv import gather_conv
from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.ops import fused_conv as fc


def _sorted_coords(rng, cap, nscans=2, lo=-40, hi=40, vs=0.1, fill=0.9):
    n = int(cap * fill)
    pts = rng.uniform(lo, hi, size=(n, 3))
    c = np.floor(pts / vs).astype(np.int32)
    b = rng.integers(0, nscans, size=(n, 1)).astype(np.int32)
    c = np.concatenate([b, c], axis=1)
    c = np.unique(c, axis=0)  # sorted lexicographically, like the plan's order
    m = min(len(c), cap)
    coords = np.zeros((cap, 4), np.int32)
    coords[:m] = c[:m]
    valid = np.zeros((cap,), bool)
    valid[:m] = True
    return jnp.asarray(coords), jnp.asarray(valid)


def _nbr_and_feats(rng, cap, ci, kernel="k3"):
    coords, valid = _sorted_coords(rng, cap)
    caps = (cap, max(cap // 4, 256), 256, 256, 256)
    plan = build_unet_plan(coords, valid, caps)
    nbr = plan.levels[0].nbr3 if kernel == "k3" else plan.stem_nbr
    feats = jnp.asarray(
        rng.standard_normal((cap, ci)).astype(np.float32)
    ) * valid[:, None]
    return nbr, feats.astype(jnp.bfloat16), valid


@pytest.mark.parametrize("ci,co,kernel", [(16, 32, "k3"), (8, 16, "k5")])
def test_fused_forward_matches_gather(ci, co, kernel):
    rng = np.random.default_rng(0)
    cap = 2048
    nbr, feats, valid = _nbr_and_feats(rng, cap, ci, kernel)
    k = nbr.shape[1]
    w = jnp.asarray(rng.standard_normal((k, ci, co)).astype(np.float32) * 0.1)
    ref = gather_conv(feats, nbr, w)
    out = fc.fused_subm_conv(feats, nbr, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_far_entries_exact():
    """Corrupt some rulebook rows to point far outside the window; the COO
    finish must reproduce the oracle exactly."""
    rng = np.random.default_rng(1)
    cap, ci, co = 2048, 16, 16
    nbr, feats, valid = _nbr_and_feats(rng, cap, ci)
    nbr = np.asarray(nbr).copy()
    rows = rng.integers(0, cap, size=64)
    cols = rng.integers(0, nbr.shape[1], size=64)
    nbr[rows, cols] = rng.integers(0, cap, size=64)  # arbitrary far targets
    nbr = jnp.asarray(nbr)
    w = jnp.asarray(rng.standard_normal((nbr.shape[1], ci, co)).astype(np.float32) * 0.1)
    ref = gather_conv(feats, nbr, w)
    out = fc.fused_subm_conv(feats, nbr, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_grads_match_gather():
    rng = np.random.default_rng(2)
    cap, ci, co = 2048, 16, 16
    nbr, feats, valid = _nbr_and_feats(rng, cap, ci)
    k = nbr.shape[1]
    w = jnp.asarray(rng.standard_normal((k, ci, co)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.standard_normal((cap, co)).astype(np.float32))

    def loss_ref(f, ww):
        return jnp.sum(gather_conv(f, nbr, ww, symmetric_adjoint=True).astype(jnp.float32) * cot)

    def loss_fused(f, ww):
        return jnp.sum(fc.fused_subm_conv(f, nbr, ww, interpret=True).astype(jnp.float32) * cot)

    gf_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gf, gw = jax.grad(loss_fused, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(
        np.asarray(gf, np.float32), np.asarray(gf_ref, np.float32),
        rtol=0.1, atol=0.1,
    )
    np.testing.assert_allclose(
        np.asarray(gw, np.float32), np.asarray(gw_ref, np.float32),
        rtol=0.1, atol=0.1,
    )


@pytest.mark.smoke
def test_fused_bwd_ci192():
    """cpad=192 backward (the decoder's 128+64-concat convs): every dx
    channel written. Regression: `ci_chunk = min(cpad, 128)` floor-divided
    192 to ONE 128-row chunk, leaving dx[:, 128:] and the dw tail
    unwritten (NaN in interpret mode, stale garbage on HW)."""
    rng = np.random.default_rng(5)
    cap, ci, co = 2048, 192, 32
    nbr, feats, valid = _nbr_and_feats(rng, cap, ci)
    k = nbr.shape[1]
    w = jnp.asarray(rng.standard_normal((k, ci, co)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.standard_normal((cap, co)).astype(np.float32))
    f32 = feats.astype(jnp.float32)

    def loss_ref(f, ww):
        return jnp.sum(gather_conv(f, nbr, ww, symmetric_adjoint=True)
                       .astype(jnp.float32) * cot)

    def loss_fused(f, ww):
        return jnp.sum(fc.fused_subm_conv_T(f.T, nbr, ww, interpret=True).T
                       .astype(jnp.float32) * cot)

    gf_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(f32, w)
    gf, gw = jax.grad(loss_fused, argnums=(0, 1))(f32, w)
    assert np.isfinite(np.asarray(gf, np.float32)).all()
    # the bug zeroed/poisoned exactly the tail channels — check them apart
    np.testing.assert_allclose(
        np.asarray(gf[:, 128:], np.float32),
        np.asarray(gf_ref[:, 128:], np.float32), rtol=0.1, atol=0.1)
    np.testing.assert_allclose(
        np.asarray(gf, np.float32), np.asarray(gf_ref, np.float32),
        rtol=0.1, atol=0.1)
    # dw: bf16 products accumulated over ~2048 rows — compare relative to
    # the gradient's scale (pointwise rtol trips on near-zero entries)
    gw_ref = np.asarray(gw_ref, np.float32)
    dw_rel = (np.abs(np.asarray(gw, np.float32) - gw_ref).max()
              / max(np.abs(gw_ref).max(), 1e-9))
    assert dw_rel < 0.02, dw_rel


def test_ragged_variant_dispatch_exact():
    """Adversarial rulebook that drives every ragged-gather variant: per
    128-lane chunk, rows spread over the full subwin (ntile = WK//128),
    exactly one tile (ntile = 1), two tiles (ntile = 2), or no neighbors at
    all (ntile = 0). The kernel's pl.when dispatch must agree with the
    oracle on every row."""
    rng = np.random.default_rng(7)
    cap, ci, co, k = 2048, 16, 16, 27
    B, WK = fc.BLOCK, fc.SUBWIN
    nbr = np.full((cap, k), -1, np.int32)
    for blk in range(cap // B):
        base = blk * B
        for cch in range(B // 128):
            lane0 = base + cch * 128
            mode = (blk * (B // 128) + cch) % 4
            for i in range(128):
                row = lane0 + i
                if mode == 0:      # full spread across all WK//128 tiles
                    nbr[row, : k - 1] = base + (
                        (i * 137 + np.arange(k - 1) * 61) % min(WK, cap - base)
                    )
                elif mode == 1:    # single tile
                    nbr[row, : k - 1] = base + ((i * 7 + np.arange(k - 1)) % 128)
                elif mode == 2:    # exactly two tiles
                    nbr[row, : k - 1] = base + 128 + (
                        (i * 11 + np.arange(k - 1) * 3) % 256)
                # mode 3: all -1 (empty chunk)
        # every row keeps a valid center so the output row is well-defined
        nbr[base:base + B, k - 1] = np.arange(base, base + B)
    nbr = jnp.asarray(np.minimum(nbr, cap - 1))
    feats = jnp.asarray(
        rng.standard_normal((cap, ci)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, ci, co)).astype(np.float32) * 0.1)
    ref = gather_conv(feats, nbr, w)
    out = fc.fused_subm_conv(feats, nbr, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )
    # the plan really is ragged: all four ntile classes must be present
    # (unless the GCDLSS_FUSED_RAGGED=0 bisection fallback collapses them)
    import os
    if os.environ.get("GCDLSS_FUSED_RAGGED", "1") != "0":
        ws, ss, relT, far, far_n = fc.plan_windows(nbr)
        ntile = np.asarray(ss) & 127
        assert {0, 1, 2, WK // 128} <= set(np.unique(ntile).tolist())


def test_supported_predicate():
    assert not fc.supported(fc.WINDOW - fc.BLOCK)
    assert not fc.supported(fc.WINDOW + 1)
    assert fc.supported(fc.WINDOW)
    assert fc.supported(4 * fc.WINDOW)


def test_fused_large_channel_single_buffer_bwd():
    """copad > 128 takes the single-buffered small-window backward path."""
    rng = np.random.default_rng(5)
    cap, ci, co = 2048, 32, 192
    nbr, feats, valid = _nbr_and_feats(rng, cap, ci)
    k = nbr.shape[1]
    w = jnp.asarray(rng.standard_normal((k, ci, co)).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.standard_normal((cap, co)).astype(np.float32))

    def loss_ref(f, ww):
        return jnp.sum(gather_conv(f, nbr, ww, symmetric_adjoint=True).astype(jnp.float32) * cot)

    def loss_fused(f, ww):
        return jnp.sum(fc.fused_subm_conv(f, nbr, ww, interpret=True).astype(jnp.float32) * cot)

    gf_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    gf, gw = jax.grad(loss_fused, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf, np.float32),
                               np.asarray(gf_ref, np.float32), rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(gw, np.float32),
                               np.asarray(gw_ref, np.float32), rtol=0.1, atol=0.1)


def test_fused_conv_T_interpret_matches_gather(plan_fixture=None):
    """Transposed-activation fused conv (values + dX/dW) equals gather_conv
    in interpret mode — validates the split-halves packing, the permuted
    weight staging, and the swapped-operand kernel dots."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gcdlss_tpu.ops.coords import encode_coords, sorted_unique, decode_keys, SENTINEL_HI
    from gcdlss_tpu.ops import plan as P
    from gcdlss_tpu.ops.conv import gather_conv
    from gcdlss_tpu.ops import fused_conv as F

    rng = np.random.default_rng(5)
    cap = 2048
    pts = rng.integers(-10, 10, size=(2600, 3)).astype(np.int32)
    b = rng.integers(0, 2, size=(2600, 1)).astype(np.int32)
    c = np.unique(np.concatenate([b, pts], 1), axis=0)[: int(cap * 0.9)]
    coords = np.zeros((cap, 4), np.int32)
    coords[: len(c)] = c
    valid = np.zeros((cap,), bool)
    valid[: len(c)] = True
    hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
    (uh, ul), rep, inv, cnt = sorted_unique(hi, lo, cap)
    lvalid = uh != SENTINEL_HI
    lcoords = jnp.where(lvalid[:, None], decode_keys(uh, ul), 0)
    nbr = P._join_offsets(lcoords, lvalid, uh, ul, P.KERNEL_OFFSETS_3, 32)

    ci, co, k = 32, 48, 27
    x = (rng.standard_normal((cap, ci)) * np.asarray(lvalid)[:, None]).astype(np.float32)
    w = (rng.standard_normal((k, ci, co)) * 0.1).astype(np.float32)
    xj, wj = jnp.asarray(x), jnp.asarray(w)

    ref = gather_conv(xj.astype(jnp.bfloat16), nbr, wj, None,
                      symmetric_adjoint=True)
    outT = F.fused_subm_conv_T(xj.T.astype(jnp.bfloat16), nbr, wj,
                               interpret=True)
    np.testing.assert_allclose(
        np.asarray(outT.T, np.float32), np.asarray(ref, np.float32),
        atol=2e-2)

    mod = jnp.cos(jnp.arange(cap * co).reshape(cap, co) * 0.01)

    def loss_ref(x_, w_):
        o = gather_conv(x_.astype(jnp.bfloat16), nbr, w_, None,
                        symmetric_adjoint=True)
        return jnp.sum(o.astype(jnp.float32) * mod)

    def loss_T(x_, w_):
        o = F.fused_subm_conv_T(x_.T.astype(jnp.bfloat16), nbr, w_,
                                interpret=True).T
        return jnp.sum(o.astype(jnp.float32) * mod)

    gr = jax.grad(loss_ref, argnums=(0, 1))(xj, wj)
    gt = jax.grad(loss_T, argnums=(0, 1))(xj, wj)
    np.testing.assert_allclose(np.asarray(gt[0]), np.asarray(gr[0]),
                               atol=1e-3)
    dwr, dwt = np.asarray(gr[1]), np.asarray(gt[1])
    assert np.abs(dwt - dwr).max() / (np.abs(dwr).max() + 1e-9) < 0.02


def test_fused_pool_conv_T_interpret_matches_xla():
    """Down/up k2s2 pool convs through the fused kernel (explicit
    children/upmap rulebooks, adjoint = the other book at the same offset)
    match ops/conv.down_conv/up_conv in values and dX/dW."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gcdlss_tpu.ops.plan import build_unet_plan
    from gcdlss_tpu.ops.conv import down_conv, up_conv
    from gcdlss_tpu.ops import fused_conv as F

    rng = np.random.default_rng(7)
    caps = (4096, 2048, 1024, 512, 256)
    pts = rng.integers(-25, 25, size=(5200, 3)).astype(np.int32)
    b = rng.integers(0, 2, size=(5200, 1)).astype(np.int32)
    c = np.unique(np.concatenate([b, pts], 1), axis=0)[: int(caps[0] * 0.9)]
    coords = np.zeros((caps[0], 4), np.int32)
    coords[: len(c)] = c
    valid = np.zeros((caps[0],), bool)
    valid[: len(c)] = True
    plan = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), caps)
    pool = plan.pools[0]
    capf, capc = caps[0], caps[1]

    ci, co = 32, 64
    x = (rng.standard_normal((capf, ci))
         * np.asarray(plan.levels[0].valid)[:, None]).astype(np.float32)
    w = (rng.standard_normal((8, ci, co)) * 0.1).astype(np.float32)
    xj, wj = jnp.asarray(x), jnp.asarray(w)

    ref = down_conv(xj.astype(jnp.bfloat16), pool.parent, pool.dcode, wj, capc)
    out = F.fused_pool_conv_T(xj.T.astype(jnp.bfloat16), pool.children,
                              pool.upmap, wj, interpret=True)
    np.testing.assert_allclose(np.asarray(out.T, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2)

    mod = jnp.cos(jnp.arange(capc * co).reshape(capc, co) * 0.01)

    def loss_ref(x_, w_):
        o = down_conv(x_.astype(jnp.bfloat16), pool.parent, pool.dcode, w_,
                      capc)
        return jnp.sum(o.astype(jnp.float32) * mod)

    def loss_T(x_, w_):
        o = F.fused_pool_conv_T(x_.T.astype(jnp.bfloat16), pool.children,
                                pool.upmap, w_, interpret=True).T
        return jnp.sum(o.astype(jnp.float32) * mod)

    gr = jax.grad(loss_ref, argnums=(0, 1))(xj, wj)
    gt = jax.grad(loss_T, argnums=(0, 1))(xj, wj)
    np.testing.assert_allclose(np.asarray(gt[0]), np.asarray(gr[0]),
                               atol=5e-2)
    assert (np.abs(np.asarray(gt[1]) - np.asarray(gr[1])).max()
            / (np.abs(np.asarray(gr[1])).max() + 1e-9) < 0.01)

    # up direction: swap the books, W [8, co, ci]
    xc = (rng.standard_normal((capc, co))
          * np.asarray(plan.levels[1].valid)[:, None]).astype(np.float32)
    wu = (rng.standard_normal((8, co, ci)) * 0.1).astype(np.float32)
    xcj, wuj = jnp.asarray(xc), jnp.asarray(wu)
    refu = up_conv(xcj.astype(jnp.bfloat16), pool.parent, pool.dcode, wuj)
    outu = F.fused_pool_conv_T(xcj.T.astype(jnp.bfloat16), pool.upmap,
                               pool.children, wuj, interpret=True)
    np.testing.assert_allclose(np.asarray(outu.T, np.float32),
                               np.asarray(refu, np.float32), atol=5e-2)


def test_fused_chunked_matches_unchunked(monkeypatch):
    """Grid-chunking (NB_MAX exceeded, with a padded tail chunk) is exact:
    fwd, dX and dW equal the single-call path in interpret mode."""
    rng = np.random.default_rng(7)
    cap = 2048  # nb = 8 blocks; NB_MAX=3 -> 3 chunks of 3 with 1 padded
    ci, co = 16, 32
    nbr, feats, valid = _nbr_and_feats(rng, cap, ci, "k3")
    k = nbr.shape[1]
    w = jnp.asarray(rng.standard_normal((k, ci, co)).astype(np.float32) * 0.1)
    mod = jnp.asarray(rng.standard_normal((cap, co)).astype(np.float32))

    def loss(f, wt):
        return jnp.sum(fc.fused_subm_conv(f, nbr, wt, interpret=True)
                       .astype(jnp.float32) * mod)

    ref_out = fc.fused_subm_conv(feats, nbr, w, interpret=True)
    ref_dx, ref_dw = jax.grad(loss, argnums=(0, 1))(feats, w)

    monkeypatch.setattr(fc, "NB_MAX", 3)
    out = fc.fused_subm_conv(feats, nbr, w, interpret=True)
    dx, dw = jax.grad(loss, argnums=(0, 1))(feats, w)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(ref_dx))
    # dW sums per-chunk partials, so association differs from the
    # single-call accumulation
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref_dw),
                               rtol=1e-5, atol=1e-5)


def test_fused_asym_subset_books_match_gather():
    """Cylinder3D routes axis-subset (1,3,3)/(3,1,3)/(3,1,1) rulebooks —
    sliced columns of the 27-offset map, negation-symmetric in product
    order — through the fused kernel. Fwd + grads must match the XLA
    gather path on these K=9 / K=3 books (new k8 geometries: 16 and 8)."""
    from gcdlss_tpu.ops.asym import offset_subset

    rng = np.random.default_rng(7)
    cap = 2048
    nbr27, feats, valid = _nbr_and_feats(rng, cap, 32, "k3")
    cot = jnp.asarray(rng.standard_normal((cap, 24)).astype(np.float32))
    for shape in ((1, 3, 3), (3, 1, 3), (3, 1, 1)):
        cols = offset_subset(shape)
        offs = np.array(
            [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             for dz in (-1, 0, 1)], np.int32)[cols]
        assert ((offs + offs[::-1]) == 0).all()  # the routing precondition
        nbr = nbr27[:, cols]
        k = len(cols)
        w = jnp.asarray(
            rng.standard_normal((k, 32, 24)).astype(np.float32) * 0.1)

        ref = gather_conv(feats, nbr, w, symmetric_adjoint=True)
        out = fc.fused_subm_conv(feats, nbr, w, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05)

        def loss_ref(f, ww):
            return jnp.sum(
                gather_conv(f, nbr, ww, symmetric_adjoint=True).astype(
                    jnp.float32) * cot)

        def loss_fus(f, ww):
            return jnp.sum(
                fc.fused_subm_conv(f, nbr, ww, interpret=True).astype(
                    jnp.float32) * cot)

        gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
        gx_f, gw_f = jax.grad(loss_fus, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(
            np.asarray(gx_f, np.float32), np.asarray(gx_r, np.float32),
            rtol=0.1, atol=0.05)
        np.testing.assert_allclose(
            np.asarray(gw_f), np.asarray(gw_r), rtol=0.1,
            atol=0.05 * float(jnp.max(jnp.abs(gw_r))))


def test_fits_vmem_contract():
    """Every MinkUNet34 conv shape must stay inside the fused kernel's
    scoped-VMEM estimate (they all compile on HW today); the Cylinder3D
    512-ch stacks must be rejected (Mosaic OOM'd at 34.26M scoped,
    BENCH.md round-5)."""
    minkunet_shapes = [
        (1, 32, 125),                      # stem
        (32, 32, 27), (32, 64, 27), (64, 64, 27), (64, 128, 27),
        (128, 128, 27), (128, 256, 27), (256, 256, 27),
        (384, 256, 27),                    # widest decoder concat
        (256, 128, 27), (192, 96, 27), (128, 96, 27), (96, 96, 27),
    ]
    for ci, co, k in minkunet_shapes:
        assert fc.fits_vmem(ci, co, k), (ci, co, k)
    assert not fc.fits_vmem(512, 512, 27)
    assert not fc.fits_vmem(512, 512, 9)
    assert fc.fits_vmem(256, 256, 9)
