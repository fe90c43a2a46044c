import jax
import jax.numpy as jnp
import numpy as np

from gcdlss_tpu.ops.coords import (
    SENTINEL_HI,
    encode_coords,
    sorted_unique,
    lookup_sorted,
    decode_keys,
)


def _rand_coords(rng, n, lo=-50, hi=50, nbatch=2):
    c = rng.integers(lo, hi, size=(n, 3))
    b = rng.integers(0, nbatch, size=(n, 1))
    return np.hstack([b, c]).astype(np.int32)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    coords = _rand_coords(rng, 100)
    valid = np.ones(100, bool)
    hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
    back = decode_keys(hi, lo)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_sorted_unique_matches_numpy():
    rng = np.random.default_rng(1)
    coords = _rand_coords(rng, 500, lo=-5, hi=5)  # many duplicates
    valid = np.ones(500, bool)
    valid[440:] = False
    hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
    (uh, ul), rep, inverse, count = sorted_unique(hi, lo, 500)

    ref_unique, ref_index, ref_inverse = np.unique(
        coords[:440], axis=0, return_index=True, return_inverse=True
    )
    assert int(count) == len(ref_unique)
    got = np.asarray(decode_keys(uh, ul))[: int(count)]
    np.testing.assert_array_equal(got, ref_unique)  # sorted order matches lexsort
    # representative = first occurrence
    np.testing.assert_array_equal(np.asarray(rep)[: int(count)], ref_index)
    np.testing.assert_array_equal(np.asarray(inverse)[:440], ref_inverse)
    # invalid rows map to capacity
    assert np.all(np.asarray(inverse)[440:] == 500)
    # padding is sentinel
    assert np.all(np.asarray(uh)[int(count) :] == np.int32(SENTINEL_HI))


def test_sorted_unique_capacity_drop():
    coords = np.array([[0, i, 0, 0] for i in range(10)], np.int32)
    hi, lo = encode_coords(jnp.asarray(coords), jnp.ones(10, bool))
    (uh, ul), rep, inverse, count = sorted_unique(hi, lo, 4)
    # groups beyond capacity dropped; inverse points to capacity
    assert int(count) == 10  # count reports true uniques even if they overflow
    inv = np.asarray(inverse)
    assert np.all(inv[:4] == np.arange(4))
    assert np.all(inv[4:] == 4)


def test_lookup_sorted():
    rng = np.random.default_rng(2)
    coords = _rand_coords(rng, 300, lo=-8, hi=8)
    valid = np.ones(300, bool)
    hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
    (uh, ul), rep, inverse, count = sorted_unique(hi, lo, 300)
    n = int(count)

    # every unique key must be found at its own position
    idx = lookup_sorted(uh, ul, uh[:n], ul[:n])
    np.testing.assert_array_equal(np.asarray(idx), np.arange(n))

    # keys guaranteed absent return -1
    missing = np.array([[7, 0, 0, 0], [0, 100, 100, 100]], np.int32)
    mh, ml = encode_coords(jnp.asarray(missing), jnp.ones(2, bool))
    idx = lookup_sorted(uh, ul, mh, ml)
    assert np.all(np.asarray(idx) == -1)

    # invalid queries return -1
    qh, ql = encode_coords(jnp.asarray(missing), jnp.zeros(2, bool))
    idx = lookup_sorted(uh, ul, qh, ql)
    assert np.all(np.asarray(idx) == -1)


def test_sorted_join_matches_binary_search():
    from gcdlss_tpu.ops.join import sorted_join

    rng = np.random.default_rng(5)
    coords = _rand_coords(rng, 400, lo=-10, hi=10)
    valid = np.ones(400, bool)
    valid[380:] = False
    hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
    (uh, ul), rep, inverse, count = sorted_unique(hi, lo, 400)

    q = _rand_coords(rng, 900, lo=-12, hi=12)
    qv = np.ones(900, bool)
    qv[850:] = False
    qh, ql = encode_coords(jnp.asarray(q), jnp.asarray(qv))
    expected = np.asarray(lookup_sorted(uh, ul, qh, ql))
    got = np.asarray(sorted_join(uh, ul, qh, ql))
    np.testing.assert_array_equal(got, expected)


def test_symmetric_neighbor_map_matches_full_join():
    """The transpose-halved rulebook build equals the full per-offset join."""
    import numpy as np
    import jax.numpy as jnp
    from gcdlss_tpu.ops.coords import encode_coords, sorted_unique, decode_keys, SENTINEL_HI
    from gcdlss_tpu.ops.plan import build_neighbor_map, KERNEL_OFFSETS_3, KERNEL_OFFSETS_5

    rng = np.random.default_rng(7)
    cap = 512
    pts = rng.integers(-12, 12, size=(600, 3)).astype(np.int32)
    b = rng.integers(0, 2, size=(600, 1)).astype(np.int32)
    c = np.unique(np.concatenate([b, pts], 1), axis=0)[: int(cap * 0.9)]
    coords = np.zeros((cap, 4), np.int32)
    coords[: len(c)] = c
    valid = np.zeros((cap,), bool)
    valid[: len(c)] = True
    hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
    (uh, ul), rep, inv, cnt = sorted_unique(hi, lo, cap)
    lvalid = uh != SENTINEL_HI
    lcoords = jnp.where(lvalid[:, None], decode_keys(uh, ul), 0)
    for offs in (KERNEL_OFFSETS_3, KERNEL_OFFSETS_5):
        ref = build_neighbor_map(lcoords, lvalid, uh, ul, offs, symmetric=False)
        sym = build_neighbor_map(lcoords, lvalid, uh, ul, offs, symmetric=True)
        np.testing.assert_array_equal(np.asarray(sym), np.asarray(ref))


def test_cube_column_neighbor_map_matches_full_join():
    """The column-decomposition build (rank join + consecutive-row window)
    equals the per-offset sort-merge join for full k^3 kernels."""
    import numpy as np
    import jax.numpy as jnp
    from gcdlss_tpu.ops.coords import encode_coords, sorted_unique, decode_keys, SENTINEL_HI
    from gcdlss_tpu.ops import plan as P

    rng = np.random.default_rng(17)
    cap = 1024
    pts = rng.integers(-12, 12, size=(1600, 3)).astype(np.int32)
    b = rng.integers(0, 3, size=(1600, 1)).astype(np.int32)
    c = np.unique(np.concatenate([b, pts], 1), axis=0)[: int(cap * 0.9)]
    coords = np.zeros((cap, 4), np.int32)
    coords[: len(c)] = c
    valid = np.zeros((cap,), bool)
    valid[: len(c)] = True
    hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
    (uh, ul), rep, inv, cnt = sorted_unique(hi, lo, cap)
    lvalid = uh != SENTINEL_HI
    lcoords = jnp.where(lvalid[:, None], decode_keys(uh, ul), 0)
    for offs in (P.KERNEL_OFFSETS_3, P.KERNEL_OFFSETS_5):
        ref = P._join_offsets(lcoords, lvalid, uh, ul, offs, 32)
        cols = P._build_cube_neighbor_map(lcoords, lvalid, uh, ul,
                                          round(len(offs) ** (1 / 3)))
        np.testing.assert_array_equal(np.asarray(cols), np.asarray(ref))


def test_plan_kernel_interpret_matches_join():
    """Rank-join + Pallas candidates kernel (+ far-pair repair) equals the
    per-offset join, k=3 in interpret mode (k=5 is validated on hardware —
    the 1000-op interpret compile is pathologically slow on CPU XLA)."""
    import numpy as np
    import jax.numpy as jnp
    from gcdlss_tpu.ops.coords import encode_coords, sorted_unique, decode_keys, SENTINEL_HI
    from gcdlss_tpu.ops import plan as P

    rng = np.random.default_rng(23)
    cap = 2048
    pts = rng.integers(-14, 14, size=(2600, 3)).astype(np.int32)
    b = rng.integers(0, 3, size=(2600, 1)).astype(np.int32)
    c = np.unique(np.concatenate([b, pts], 1), axis=0)[: int(cap * 0.9)]
    coords = np.zeros((cap, 4), np.int32)
    coords[: len(c)] = c
    valid = np.zeros((cap,), bool)
    valid[: len(c)] = True
    hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
    (uh, ul), rep, inv, cnt = sorted_unique(hi, lo, cap)
    lvalid = uh != SENTINEL_HI
    lcoords = jnp.where(lvalid[:, None], decode_keys(uh, ul), 0)
    ref = P._join_offsets(lcoords, lvalid, uh, ul, P.KERNEL_OFFSETS_3, 32)
    out = P._build_cube_kernel_map(lcoords, lvalid, uh, ul, 3, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_plan_kernel_v2_interpret_matches_join():
    """v2 (boundary-rank planning + in-kernel two-level count) equals the
    per-offset join bit-exactly, k=3 in interpret mode, on a distribution
    with batch straddles, dense blobs and an invalid tail."""
    import numpy as np
    import jax.numpy as jnp
    from gcdlss_tpu.ops.coords import encode_coords, sorted_unique, decode_keys, SENTINEL_HI
    from gcdlss_tpu.ops import plan as P

    rng = np.random.default_rng(29)
    cap = 2048
    blobs = rng.integers(-12, 12, size=(12, 3))
    pts = (blobs[rng.integers(0, 12, 2600)]
           + rng.integers(-3, 4, size=(2600, 3))).astype(np.int32)
    b = rng.integers(0, 3, size=(2600, 1)).astype(np.int32)
    c = np.unique(np.concatenate([b, pts], 1), axis=0)[: int(cap * 0.9)]
    coords = np.zeros((cap, 4), np.int32)
    coords[: len(c)] = c
    valid = np.zeros((cap,), bool)
    valid[: len(c)] = True
    hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
    (uh, ul), rep, inv, cnt = sorted_unique(hi, lo, cap)
    lvalid = uh != SENTINEL_HI
    lcoords = jnp.where(lvalid[:, None], decode_keys(uh, ul), 0)
    ref = P._join_offsets(lcoords, lvalid, uh, ul, P.KERNEL_OFFSETS_3, 32)
    out = P._build_cube_kernel_map(lcoords, lvalid, uh, ul, 3,
                                   interpret=True, version=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_plan_kernel_v2_chunked_matches_join(monkeypatch):
    """Grid-chunked v2 (NB_MAX exceeded: per-chunk OFF for the center
    column, sentinel-padded tail blocks) equals the per-offset join."""
    import numpy as np
    import jax.numpy as jnp
    from gcdlss_tpu.ops.coords import encode_coords, sorted_unique, decode_keys, SENTINEL_HI
    from gcdlss_tpu.ops import plan as P
    from gcdlss_tpu.ops import plan_kernel as pk

    rng = np.random.default_rng(31)
    cap = 2304  # nb = 9; NB_MAX=2 -> 5 chunks of 2 with 1 padded block
    pts = rng.integers(-14, 14, size=(2900, 3)).astype(np.int32)
    b = rng.integers(0, 3, size=(2900, 1)).astype(np.int32)
    c = np.unique(np.concatenate([b, pts], 1), axis=0)[: int(cap * 0.9)]
    coords = np.zeros((cap, 4), np.int32)
    coords[: len(c)] = c
    valid = np.zeros((cap,), bool)
    valid[: len(c)] = True
    hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
    (uh, ul), rep, inv, cnt = sorted_unique(hi, lo, cap)
    lvalid = uh != SENTINEL_HI
    lcoords = jnp.where(lvalid[:, None], decode_keys(uh, ul), 0)
    ref = P._join_offsets(lcoords, lvalid, uh, ul, P.KERNEL_OFFSETS_3, 32)
    monkeypatch.setattr(pk, "NB_MAX", 2)
    out = P._build_cube_kernel_map(lcoords, lvalid, uh, ul, 3,
                                   interpret=True, version=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sorted_unique_presorted_matches_sort_path():
    """Presorted fast path is bit-identical to the sort path on inputs whose
    valid rows are key-sorted, including mid-stream sentinel pads (batch
    concat boundaries) and duplicate keys."""
    from gcdlss_tpu.ops.coords import sorted_unique_presorted

    rng = np.random.default_rng(11)
    for cap, n_side in [(64, 40), (500, 300), (37, 100)]:
        sides = []
        for b in range(2):
            m = rng.integers(n_side // 2, n_side - 4)
            c = rng.integers(-20, 20, size=(m, 3)).astype(np.int32)
            c = np.unique(
                np.concatenate([np.full((m, 1), b, np.int32), c], axis=1),
                axis=0)
            # plant duplicates (stay adjacent under sortedness)
            c = np.repeat(c, rng.integers(1, 3, size=len(c)), axis=0)[:n_side]
            pad = np.zeros((n_side - len(c), 4), np.int32)
            sides.append((np.concatenate([c, pad]),
                          np.arange(n_side) < len(c)))
        coords = np.concatenate([s[0] for s in sides])
        valid = np.concatenate([s[1] for s in sides])
        hi, lo = encode_coords(jnp.asarray(coords), jnp.asarray(valid))
        ref = sorted_unique(hi, lo, cap)
        fast = sorted_unique_presorted(hi, lo, cap)
        for r, f, name in zip(ref, fast, ["keys", "rep", "inverse", "count"]):
            np.testing.assert_array_equal(
                np.asarray(jax.tree_util.tree_leaves(r)),
                np.asarray(jax.tree_util.tree_leaves(f)), err_msg=name)


def test_build_unet_plan_presorted_identical():
    from gcdlss_tpu.ops.plan import build_unet_plan

    rng = np.random.default_rng(12)
    n, cap = 512, 512
    pts = rng.uniform(-10, 10, size=(int(n * 0.8), 3))
    q = np.floor(pts / 0.4).astype(np.int32)
    c = np.unique(
        np.concatenate([np.zeros((len(q), 1), np.int32), q], axis=1), axis=0)
    coords = np.zeros((n, 4), np.int32)
    coords[: len(c)] = c
    valid = np.arange(n) < len(c)
    caps = (cap, cap // 2, 256, 256, 256)
    p0 = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), caps)
    p1 = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), caps,
                         presorted=True)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_presorted_plan_on_device_quantize_output():
    """The mixed branch feeds `sparse_quantize` output straight into a
    presorted plan build — quantize output voxels must satisfy the
    sortedness contract."""
    from gcdlss_tpu.ops.voxelize import sparse_quantize
    from gcdlss_tpu.ops.plan import build_unet_plan

    rng = np.random.default_rng(13)
    npts, cap = 4096, 1024
    pts = jnp.asarray(rng.uniform(-8, 8, size=(npts, 3)).astype(np.float32))
    bidx = jnp.asarray(rng.integers(0, 2, npts).astype(np.int32))
    pvalid = jnp.asarray(rng.random(npts) < 0.9)
    vox = sparse_quantize(pts, bidx, pvalid, 0.25, cap)
    caps = (cap, cap // 2, 256, 256, 256)
    p0 = build_unet_plan(vox["coords"], vox["valid"], caps)
    p1 = build_unet_plan(vox["coords"], vox["valid"], caps, presorted=True)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

def test_build_unet_plan_assume_unique_identical():
    """The voxel-level LaserMix re-batch feeds duplicate-free coords into
    `build_unet_plan(assume_unique=True)` — the nodup fast path must be
    bit-identical to the general sort path (incl. rep/inverse semantics)."""
    from gcdlss_tpu.ops.plan import build_unet_plan

    rng = np.random.default_rng(21)
    n = 768
    base = rng.integers(-12, 12, (n // 2, 3)).astype(np.int32)
    c0 = np.concatenate([np.zeros((n // 2, 1), np.int32), base], 1)
    c1 = np.concatenate(
        [np.ones((n // 2, 1), np.int32),
         base + rng.integers(0, 2, (n // 2, 3)).astype(np.int32)], 1)
    c = np.concatenate([c0, c1])
    key = ((c[:, 0].astype(np.int64) << 45)
           + ((c[:, 1] + 64).astype(np.int64) << 30)
           + ((c[:, 2] + 64).astype(np.int64) << 15)
           + (c[:, 3] + 64))
    _, ui = np.unique(key, return_index=True)
    c = c[np.sort(ui)]
    m = len(c)
    coords = np.zeros((n, 4), np.int32)
    coords[:m] = c
    # re-batch by a coordinate parity (mimics lasermix_voxel_groups):
    # unique (group, x, y, z) keys by construction
    g = ((coords[:, 1] + coords[:, 2]) % 2).astype(np.int32) * 2 + coords[:, 0]
    coords = np.concatenate([g[:, None], coords[:, 1:4]], 1)
    valid = np.arange(n) < m
    caps = (n, max(n // 2, 256), 256, 256, 256)
    p0 = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), caps)
    p1 = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), caps,
                         assume_unique=True)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

def test_plan_capacity_overflow_metric():
    """`plan_capacity_overflow` reports the unique voxels dropped by
    per-level caps (0 when capacities fit — the default_caps contract)."""
    from gcdlss_tpu.ops.plan import build_unet_plan, plan_capacity_overflow
    from gcdlss_tpu.train.common import default_caps

    rng = np.random.default_rng(5)
    n = 2048
    # surface-like cloud (the geometry the default ratios are tuned for —
    # LiDAR scans are 2D surfaces): a noisy ground plane patch
    xy = rng.uniform(-8, 8, size=(int(n * 0.9), 2))
    z = rng.normal(0, 0.05, size=(len(xy), 1))
    pts = np.concatenate([xy, z], axis=1)
    q = np.floor(pts / 0.08).astype(np.int32)
    c = np.unique(
        np.concatenate([np.zeros((len(q), 1), np.int32), q], axis=1), axis=0)
    coords = np.zeros((n, 4), np.int32)
    coords[: len(c)] = c
    valid = np.arange(n) < len(c)

    # tiny coarse caps force truncation: the metric must report it
    tight = (n, 256, 256, 256, 256)
    p_tight = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), tight)
    assert int(plan_capacity_overflow(p_tight)) > 0

    roomy = default_caps(n)
    # default ratios must hold a surface workload with zero truncation
    p_roomy = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), roomy)
    assert int(plan_capacity_overflow(p_roomy)) == 0
