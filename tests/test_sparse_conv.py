import jax
import jax.numpy as jnp
import numpy as np

from gcdlss_tpu.ops.coords import encode_coords
from gcdlss_tpu.ops.plan import build_unet_plan, KERNEL_OFFSETS_3
from gcdlss_tpu.ops.conv import gather_conv, down_conv, up_conv


def _random_sparse(rng, n_active, extent=6, nbatch=2, ci=4):
    # unique voxel set
    seen = set()
    pts = []
    while len(pts) < n_active:
        c = (
            int(rng.integers(0, nbatch)),
            int(rng.integers(-extent, extent)),
            int(rng.integers(-extent, extent)),
            int(rng.integers(-extent, extent)),
        )
        if c not in seen:
            seen.add(c)
            pts.append(c)
    coords = np.array(pts, np.int32)
    feats = rng.standard_normal((n_active, ci)).astype(np.float32)
    return coords, feats


def _dense_from_sparse(coords, feats, extent, nbatch, ci):
    size = 2 * extent + 2
    vol = np.zeros((nbatch, size, size, size, ci), np.float32)
    for c, f in zip(coords, feats):
        vol[c[0], c[1] + extent, c[2] + extent, c[3] + extent] = f
    return vol


def test_subm_conv_matches_dense_oracle():
    rng = np.random.default_rng(0)
    extent, nbatch, ci, co, n = 5, 2, 4, 8, 120
    coords, feats = _random_sparse(rng, n, extent, nbatch, ci)
    cap = 160
    pad_coords = np.zeros((cap, 4), np.int32)
    pad_coords[:n] = coords
    valid = np.zeros(cap, bool)
    valid[:n] = True
    plan = build_unet_plan(jnp.asarray(pad_coords), jnp.asarray(valid), caps=(cap,), num_levels=1)
    lvl = plan.levels[0]

    w = rng.standard_normal((27, ci, co)).astype(np.float32) * 0.1
    # rep maps sorted-unique row -> original input row
    x = np.zeros((cap, ci), np.float32)
    rep = np.asarray(plan.rep)
    for i in range(cap):
        if rep[i] < n:
            x[i] = feats[rep[i]]

    out = np.asarray(gather_conv(jnp.asarray(x), lvl.nbr3, jnp.asarray(w), precision='highest'))

    # dense oracle: correlate with offsets
    vol = _dense_from_sparse(coords, feats, extent, nbatch, ci)
    lcoords = np.asarray(lvl.coords)
    for i in range(cap):
        if rep[i] >= n:
            continue
        b, cx, cy, cz = lcoords[i]
        acc = np.zeros(co, np.float32)
        for k, (dx, dy, dz) in enumerate(KERNEL_OFFSETS_3):
            px, py, pz = cx + dx + extent, cy + dy + extent, cz + dz + extent
            if 0 <= px < vol.shape[1] and 0 <= py < vol.shape[2] and 0 <= pz < vol.shape[3]:
                acc += vol[b, px, py, pz] @ w[k]
        np.testing.assert_allclose(out[i], acc, rtol=1e-4, atol=1e-4)


def test_down_up_conv_structure():
    rng = np.random.default_rng(1)
    extent, nbatch, ci, co, n = 5, 2, 4, 6, 100
    coords, feats = _random_sparse(rng, n, extent, nbatch, ci)
    cap = 128
    pad_coords = np.zeros((cap, 4), np.int32)
    pad_coords[:n] = coords
    valid = np.zeros(cap, bool)
    valid[:n] = True
    plan = build_unet_plan(
        jnp.asarray(pad_coords), jnp.asarray(valid), caps=(cap, cap), num_levels=2
    )
    lvl0, lvl1 = plan.levels
    pool = plan.pools[0]
    rep = np.asarray(plan.rep)
    x = np.zeros((cap, ci), np.float32)
    for i in range(cap):
        if rep[i] < n:
            x[i] = feats[rep[i]]

    w = rng.standard_normal((8, ci, co)).astype(np.float32) * 0.1
    out = np.asarray(down_conv(jnp.asarray(x), pool.parent, pool.dcode, jnp.asarray(w), cap, precision='highest'))

    # oracle: for each coarse voxel, sum over fine children with per-child offset weight
    c0 = np.asarray(lvl0.coords)
    c1 = np.asarray(lvl1.coords)
    v0 = np.asarray(lvl0.valid)
    v1 = np.asarray(lvl1.valid)
    expected = np.zeros((cap, co), np.float32)
    for i in range(cap):
        if not v0[i]:
            continue
        b, fx, fy, fz = c0[i]
        parent = (b, fx >> 1, fy >> 1, fz >> 1)
        d = ((fx & 1) << 2) | ((fy & 1) << 1) | (fz & 1)
        j = np.where((c1 == parent).all(axis=1) & v1)[0]
        assert len(j) == 1
        expected[j[0]] += x[i] @ w[d]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)

    # up conv: out[f] = coarse[parent(f)] @ w[dcode(f)]
    y = rng.standard_normal((cap, co)).astype(np.float32)
    y[~v1] = 0
    wu = rng.standard_normal((8, co, ci)).astype(np.float32) * 0.1
    up = np.asarray(up_conv(jnp.asarray(y), pool.parent, pool.dcode, jnp.asarray(wu), precision='highest'))
    pa = np.asarray(pool.parent)
    dc = np.asarray(pool.dcode)
    for i in range(cap):
        if not v0[i]:
            continue
        np.testing.assert_allclose(up[i], y[pa[i]] @ wu[dc[i]], rtol=1e-4, atol=1e-4)


def test_plan_pool_invariants():
    rng = np.random.default_rng(2)
    coords, _ = _random_sparse(rng, 64, extent=7, nbatch=2)
    cap = 80
    pad = np.zeros((cap, 4), np.int32)
    pad[:64] = coords
    valid = np.zeros(cap, bool)
    valid[:64] = True
    plan = build_unet_plan(
        jnp.asarray(pad), jnp.asarray(valid), caps=(cap,) * 5, num_levels=5
    )
    # counts decrease monotonically, every valid voxel has a valid parent
    counts = [int(l.count) for l in plan.levels]
    assert counts[0] == 64
    assert all(counts[i + 1] <= counts[i] for i in range(4))
    for l in range(4):
        pa = np.asarray(plan.pools[l].parent)
        v = np.asarray(plan.levels[l].valid)
        nv = np.asarray(plan.levels[l + 1].valid)
        assert np.all(pa[v] < cap)
        assert np.all(nv[pa[v]])
        # invalid rows point at cap
        assert np.all(pa[~v] == cap)


def test_backbone_layout_parity():
    """The transposed-activation ("cols") backbone equals the row layout
    bit-for-bit on the XLA fallback paths, with an identical param tree."""
    import os
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gcdlss_tpu.ops.plan import build_unet_plan
    from gcdlss_tpu.models.minkunet import MinkUNetSeg

    rng = np.random.default_rng(3)
    cap = 2048
    caps = (2048, 1024, 512, 512, 256)
    pts = rng.integers(-20, 20, size=(2600, 3)).astype(np.int32)
    b = rng.integers(0, 2, size=(2600, 1)).astype(np.int32)
    c = np.unique(np.concatenate([b, pts], 1), axis=0)[: int(cap * 0.9)]
    coords = np.zeros((cap, 4), np.int32)
    coords[: len(c)] = c
    valid = np.zeros((cap,), bool)
    valid[: len(c)] = True
    plan = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), caps)
    feats = jnp.asarray(
        rng.uniform(0, 1, (cap, 1)).astype(np.float32)) * valid[:, None]

    outs = {}
    prev = os.environ.get("GCDLSS_LAYOUT")
    try:
        for lay in ("rows", "cols"):
            os.environ["GCDLSS_LAYOUT"] = lay
            model = MinkUNetSeg(num_classes=5, arch="MinkUNet14",
                                planes=(8,) * 8)
            v = model.init(jax.random.PRNGKey(0), plan, feats, train=False)
            out = model.apply(v, plan, feats, train=False)
            outs[lay] = (np.asarray(out["logits"]), np.asarray(out["feats"]),
                         jax.tree_util.tree_structure(v))
    finally:
        if prev is None:
            os.environ.pop("GCDLSS_LAYOUT", None)
        else:
            os.environ["GCDLSS_LAYOUT"] = prev
    assert outs["rows"][2] == outs["cols"][2]
    np.testing.assert_allclose(outs["rows"][0], outs["cols"][0], atol=1e-5)
    np.testing.assert_allclose(outs["rows"][1], outs["cols"][1], atol=1e-5)
