"""Compacted per-offset forward conv (ops/compact_conv) vs gather_conv.

Interpret mode on CPU; the hardware path shares the traced program."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gcdlss_tpu.ops.conv import gather_conv
from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.ops import compact_conv as cc
from gcdlss_tpu.ops import compact_plan as cp


def _fixture(rng, cap, ci, kernel="k3"):
    """Planar-surface voxels (LiDAR-like adjacency: ~5-9 k3 entries/row),
    run through the real plan builder for genuine rulebooks."""
    m = int(cap * 0.9)
    side = int(np.ceil(np.sqrt(m)))
    g = np.stack(np.meshgrid(np.arange(side), np.arange(side)),
                 -1).reshape(-1, 2)[:m]
    z = ((g[:, 0] * 3 + g[:, 1] * 7) % 5) // 2  # gentle voxel-height slope
    coords = np.zeros((cap, 4), np.int32)
    coords[:m, 1] = g[:, 0]
    coords[:m, 2] = g[:, 1]
    coords[:m, 3] = z
    valid = np.zeros(cap, bool)
    valid[:m] = True
    order = np.lexsort((coords[:m, 3], coords[:m, 2], coords[:m, 1]))
    coords[:m] = coords[:m][order]
    caps = (cap, max(cap // 4, 256), 256, 256, 256)
    plan = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), caps)
    nbr = plan.levels[0].nbr3 if kernel == "k3" else plan.stem_nbr
    x = jnp.asarray(rng.standard_normal((cap, ci)).astype(np.float32))
    x = (x * valid[:, None]).astype(jnp.bfloat16)
    return nbr, x


@pytest.mark.parametrize("ci,co,kernel", [(16, 32, "k3"), (8, 16, "k5")])
def test_compact_forward_matches_gather(ci, co, kernel, monkeypatch):
    # the planar fixture's k5 fill (~20/row) exceeds the real-scan default
    monkeypatch.setenv("GCDLSS_COMPACT_ALPHA", "24")
    rng = np.random.default_rng(0)
    cap = 2048
    nbr, x = _fixture(rng, cap, ci, kernel)
    w = jnp.asarray(
        rng.standard_normal((nbr.shape[1], ci, co)).astype(np.float32) * 0.1)
    ref = gather_conv(x, nbr, w)
    out = cc.compact_subm_conv_T(x.T, nbr, w, interpret=True)
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_allclose(
        np.asarray(out.T, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


@pytest.mark.slow
def test_compact_bwd_matches_gather_grads(monkeypatch):
    """dX (compacted conv over the reversed book) and dW (kernel C outer
    accumulation) vs the windowed fused backward (same bf16 products, only
    the f32 summation order differs -> tight tolerance) and vs jax.grad
    through the f32 gather_conv oracle (bf16-product noise -> the fused
    tests' established 0.1 tolerance)."""
    from gcdlss_tpu.ops import fused_conv as fc

    monkeypatch.setenv("GCDLSS_COMPACT_ALPHA", "24")
    rng = np.random.default_rng(5)
    cap, ci, co = 2048, 16, 32
    nbr, x = _fixture(rng, cap, ci)
    # bf16-representable operands: the f32 oracle's products then equal
    # the kernels' MXU products exactly, so parity is summation-order only
    w = jnp.asarray(
        rng.standard_normal((nbr.shape[1], ci, co)).astype(np.float32)
        * 0.1).astype(jnp.bfloat16).astype(jnp.float32)
    cot = jnp.asarray(
        rng.standard_normal((co, cap)).astype(np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)
    dxT, dw = cc.compact_bwd_T(x.T.astype(jnp.float32), nbr, w, cot,
                               interpret=True)

    def loss_fused(xT, ww):
        return jnp.sum(
            fc.fused_subm_conv_T(xT, nbr, ww, interpret=True)
            .astype(jnp.float32) * cot)

    fgx, fgw = jax.grad(loss_fused, argnums=(0, 1))(
        x.T.astype(jnp.float32), w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(fgw),
                               rtol=2e-3, atol=2e-3)
    # dX passes through the bf16-packed r intermediate (kernel B reads
    # bf16 r values), one rounding the windowed path doesn't have:
    # ~0.4% * sqrt(k) relative, measured max 0.6% on this fixture
    np.testing.assert_allclose(np.asarray(dxT), np.asarray(fgx),
                               rtol=0.02, atol=0.02)

    def loss_ref(x_, ww):
        return jnp.sum(gather_conv(x_, nbr, ww).astype(jnp.float32) * cot.T)

    rgx, rgw = jax.grad(loss_ref, argnums=(0, 1))(x.astype(jnp.float32), w)
    np.testing.assert_allclose(np.asarray(dxT.T), np.asarray(rgx),
                               rtol=0.02, atol=0.02)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rgw),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_fused_compact_wiring_end_to_end(monkeypatch):
    """GCDLSS_FUSED_COMPACT=1 routes the fused custom_vjp through the
    compacted forward AND backward (MIN_CI lowered so the ci>=128 gate is
    exercisable in interpret mode on this rig's 1-core CPU)."""
    from gcdlss_tpu.ops import fused_conv as fc

    monkeypatch.setenv("GCDLSS_COMPACT_ALPHA", "24")
    monkeypatch.setenv("GCDLSS_FUSED_COMPACT", "1")
    monkeypatch.setenv("GCDLSS_COMPACT_MIN_CI", "16")
    rng = np.random.default_rng(7)
    cap, ci, co = 2048, 32, 32
    nbr, x = _fixture(rng, cap, ci)
    # bf16-representable so oracle parity is summation-order + the bf16 r
    # intermediate only (see test_compact_bwd_matches_gather_grads)
    w = jnp.asarray(
        rng.standard_normal((nbr.shape[1], ci, co)).astype(np.float32)
        * 0.1).astype(jnp.bfloat16).astype(jnp.float32)
    cot = jnp.asarray(
        rng.standard_normal((co, cap)).astype(np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32)
    out = fc.fused_subm_conv_T(x.T, nbr, w, interpret=True)
    ref = gather_conv(x, nbr, w)
    np.testing.assert_allclose(
        np.asarray(out.T, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05)

    def loss(xT, ww):
        return jnp.sum(
            fc.fused_subm_conv_T(xT, nbr, ww, interpret=True)
            .astype(jnp.float32) * cot)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x.T.astype(jnp.float32), w)

    def loss_ref(x_, ww):
        return jnp.sum(gather_conv(x_, nbr, ww).astype(jnp.float32) * cot.T)

    rgx, rgw = jax.grad(loss_ref, argnums=(0, 1))(x.astype(jnp.float32), w)
    np.testing.assert_allclose(np.asarray(gx.T), np.asarray(rgx),
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rgw),
                               rtol=0.1, atol=0.1)


def test_compact_fill_overflow_poisons(monkeypatch):
    monkeypatch.setenv("GCDLSS_COMPACT_ALPHA", "0.25")
    rng = np.random.default_rng(1)
    cap, ci, co = 2048, 16, 16
    nbr, x = _fixture(rng, cap, ci)
    # alpha=0.25 cannot hold this book (center offset alone fills 1/row)
    f_cap = cc.default_f_cap(cap, 27)
    _, _, _, _, cnt = cp.compact_rulebook(nbr, f_cap)
    assert int(cnt) > f_cap, "fixture must overflow"
    w = jnp.asarray(
        rng.standard_normal((27, ci, co)).astype(np.float32) * 0.1)
    out = cc.compact_subm_conv_T(x.T, nbr, w, interpret=True)
    assert np.isnan(np.asarray(out)).all()
