"""Voxel-sharding (SP) primitives: halo-exchange sparse conv parity on the
virtual 8-device CPU mesh.

The sequence-parallel analog for this domain (SURVEY §2.5: "sharding a
scan's voxel set across chips with halo exchange for sparse conv"): each
level's rows split into contiguous blocks over an `sp` mesh axis, edge
slabs ride `lax.ppermute`, rulebooks stay global-valued. Every test
asserts bit-level/tolerance parity against the unsharded ops AND zero
window overflow at the `required_halo_*` halos.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import PartitionSpec as P

from gcdlss_tpu.parallel.mesh import make_mesh
from gcdlss_tpu.parallel import voxel_shard as vs
from gcdlss_tpu.ops.conv import (
    gather_conv, down_conv, up_conv, masked_batch_norm_stats,
)
from gcdlss_tpu.ops.plan import build_unet_plan

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices"),
]

# per-level caps fitted ~1.15x over the fixture's true unique counts —
# aligned fill fractions keep the pool halos structural (plane-sized)
# instead of fill-skew-sized, exactly as production cap tuning does
CAPS = (2048, 1664, 1168, 744, 408)
D = 8


@pytest.fixture(scope="module")
def batch():
    import bench as benchmod

    rng = np.random.default_rng(7)
    rows = []
    for s in range(2):
        pts = benchmod.synth_scan_points(rng, 1000)
        c = np.unique(np.floor(pts / 0.5).astype(np.int32), axis=0)
        rows.append(
            np.concatenate([np.full((len(c), 1), s, np.int32), c], axis=1))
    coords = np.concatenate(rows)
    n = coords.shape[0]
    assert n <= CAPS[0]
    full = np.zeros((CAPS[0], 4), np.int32)
    full[:n] = coords
    valid = np.zeros((CAPS[0],), bool)
    valid[:n] = True
    labels = rng.integers(0, 17, CAPS[0]).astype(np.int32)
    return {
        "coords": jnp.asarray(full),
        "feats": jnp.asarray(
            rng.uniform(0, 1, (CAPS[0], 1)).astype(np.float32)),
        "labels": jnp.asarray(labels),
        "mapped_labels": jnp.asarray(labels),
        "valid": jnp.asarray(valid),
    }


@pytest.fixture(scope="module")
def plan(batch):
    return jax.jit(
        lambda c, v: build_unet_plan(c, v, CAPS, presorted=True)
    )(batch["coords"], batch["valid"])


def _shard_map(mesh, fn, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def test_required_halo_bounds(plan):
    halos = jax.jit(lambda p: vs.required_halos(p, D))(plan)
    for k, v in halos.items():
        v = int(v)
        assert 0 <= v, k
        if k.startswith("pool"):
            ln = CAPS[int(k[4:]) + 1] // D
        else:
            ln = CAPS[0 if k == "stem" else int(k[4:])] // D
        # every halo must be reachable on the 8-way ring (<= 3 hops)
        assert -(-v // ln) <= (D - 1) // 2, (k, v, ln)
    # subm halos are slab-local (thin spatial boundary), pools may hop
    for l in range(5):
        assert int(halos[f"subm{l}"]) <= CAPS[l] // D, ("subm", l)


def test_sp_gather_conv_parity_and_grads(plan):
    mesh = make_mesh(D, axis="sp")
    lvl = plan.levels[0]
    nbr = plan.stem_nbr  # k=5: the widest halo demand
    halo = int(jax.jit(lambda n: vs.required_halo_subm(n, D))(nbr))
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(CAPS[0], 8)).astype(np.float32)
    ) * lvl.valid[:, None]
    w = jnp.asarray(rng.normal(size=(nbr.shape[1], 8, 16)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(CAPS[0], 16)).astype(np.float32))

    def ref_loss(x, w):
        return jnp.sum(gather_conv(x, nbr, w, symmetric_adjoint=True) * cot)

    ref = jax.jit(jax.value_and_grad(ref_loss, argnums=(0, 1)))
    ref_l, (ref_dx, ref_dw) = ref(x, w)

    # classic pmap pattern: per-shard value_and_grad of the LOCAL loss
    # contribution (jax transposes the in-body ppermute halo exchange,
    # returning boundary cotangents home), then explicit psums make the
    # scalar loss and the replicated-weight grad globally consistent
    def sp_vag(x, w, nbr, cot):
        def local_loss(x, w):
            out, ovf = vs.sp_gather_conv(x, nbr, w, halo=halo, axis_name="sp")
            return jnp.sum(out * cot), ovf

        (l, ovf), (dx, dw) = jax.value_and_grad(
            local_loss, argnums=(0, 1), has_aux=True)(x, w)
        return (jax.lax.psum(l, "sp"), jax.lax.psum(ovf, "sp"), dx,
                jax.lax.psum(dw, "sp"))

    fn = _shard_map(
        mesh, sp_vag,
        in_specs=(P("sp"), P(), P("sp"), P("sp")),
        out_specs=(P(), P(), P("sp"), P()),
    )
    sp_l, ovf, sp_dx, sp_dw = jax.jit(fn)(x, w, nbr, cot)
    assert int(ovf) == 0
    np.testing.assert_allclose(float(sp_l), float(ref_l), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sp_dx), np.asarray(ref_dx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp_dw), np.asarray(ref_dw),
                               rtol=1e-5, atol=1e-4)


def test_sp_gather_conv_overflow_detects_small_halo(plan):
    mesh = make_mesh(D, axis="sp")
    nbr = plan.stem_nbr
    halo = int(jax.jit(lambda n: vs.required_halo_subm(n, D))(nbr))
    assert halo > 1  # the fixture genuinely crosses shard boundaries
    x = jnp.ones((CAPS[0], 4), jnp.float32)
    w = jnp.ones((nbr.shape[1], 4, 4), jnp.float32)

    def f(x, nbr):
        out, ovf = vs.sp_gather_conv(x, nbr, w, halo=1, axis_name="sp")
        return jax.lax.psum(ovf, "sp")

    ovf = jax.jit(
        _shard_map(mesh, f, in_specs=(P("sp"), P("sp")), out_specs=P())
    )(x, nbr)
    assert int(ovf) > 0


def test_sp_pool_convs_parity(plan):
    mesh = make_mesh(D, axis="sp")
    pool = plan.pools[0]
    capf, capc = CAPS[0], CAPS[1]
    lc = capc // D
    halo = int(jax.jit(
        lambda p: vs.required_halo_pool(p, capc, D))(pool.parent))
    rng = np.random.default_rng(1)
    xf = jnp.asarray(rng.normal(size=(capf, 6)).astype(np.float32))
    xf = xf * plan.levels[0].valid[:, None]
    xc = jnp.asarray(rng.normal(size=(capc, 6)).astype(np.float32))
    xc = xc * plan.levels[1].valid[:, None]
    w = jnp.asarray(rng.normal(size=(8, 6, 12)).astype(np.float32))

    ref_down = jax.jit(
        lambda x: down_conv(x, pool.parent, pool.dcode, w, capc))(xf)

    def down_fn(x, parent, dcode):
        out, ovf = vs.sp_down_conv(
            x, parent, dcode, w, lc, halo=halo, axis_name="sp")
        return out, jax.lax.psum(ovf, "sp")

    sp_down, ovf = jax.jit(_shard_map(
        mesh, down_fn,
        in_specs=(P("sp"), P("sp"), P("sp")),
        out_specs=(P("sp"), P()),
    ))(xf, pool.parent, pool.dcode)
    assert int(ovf) == 0
    np.testing.assert_allclose(
        np.asarray(sp_down), np.asarray(ref_down), rtol=1e-5, atol=1e-5)

    ref_up = jax.jit(lambda x: up_conv(x, pool.parent, pool.dcode, w))(xc)

    def up_fn(x, parent, dcode):
        out, ovf = vs.sp_up_conv(
            x, parent, dcode, w, halo=halo, axis_name="sp")
        return out, jax.lax.psum(ovf, "sp")

    sp_up, ovf = jax.jit(_shard_map(
        mesh, up_fn,
        in_specs=(P("sp"), P("sp"), P("sp")),
        out_specs=(P("sp"), P()),
    ))(xc, pool.parent, pool.dcode)
    assert int(ovf) == 0
    np.testing.assert_allclose(
        np.asarray(sp_up), np.asarray(ref_up), rtol=1e-5, atol=1e-5)


def test_sp_bn_stats_parity(plan):
    mesh = make_mesh(D, axis="sp")
    lvl = plan.levels[0]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(CAPS[0], 5)).astype(np.float32))
    x = x * lvl.valid[:, None]

    ref_mean, ref_var, ref_cnt = jax.jit(
        lambda x, v: masked_batch_norm_stats(x, v))(x, lvl.valid)

    fn = jax.jit(_shard_map(
        mesh,
        lambda x, v: vs.sp_bn_stats(x, v, "sp"),
        in_specs=(P("sp"), P("sp")),
        out_specs=(P(), P(), P()),
    ))
    mean, var, cnt = fn(x, lvl.valid)
    np.testing.assert_allclose(float(cnt), float(ref_cnt))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var),
                               rtol=1e-4, atol=1e-5)


def test_sp_pretrain_step_parity(batch, plan):
    """Full MinkUNet train step, voxel-sharded vs single-device: identical
    loss, grads (via updated params), BN stats, and zero halo overflow."""
    from gcdlss_tpu.parallel.sp_step import backbone_halos, make_sp_pretrain_step
    from gcdlss_tpu.train.pretrain import (
        PretrainConfig, create_pretrain_state, pretrain_train_step)

    cfg = PretrainConfig(
        num_labeled_classes=17, num_classes=19, unknown_label=17,
        voxel_caps=CAPS, arch="MinkUNet14", planes=(8,) * 8,
        steps_per_epoch=1, epochs=2, warmup_epochs=1,
    )
    halos = backbone_halos(plan, D)
    mesh = make_mesh(D, axis="sp")

    state1 = create_pretrain_state(jax.random.PRNGKey(0), cfg)
    new1, m1 = pretrain_train_step(state1, batch, cfg)

    state8 = create_pretrain_state(jax.random.PRNGKey(0), cfg)
    sp_step = make_sp_pretrain_step(cfg, mesh, halos)
    new8, m8 = sp_step(state8, batch)

    assert int(m8["sp_overflow"]) == 0
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    # the SGD update bakes in the psum'd grads: whole param trees must match
    flat1 = jax.tree_util.tree_leaves(new1.params)
    flat8 = jax.tree_util.tree_leaves(new8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new1.batch_stats),
                    jax.tree_util.tree_leaves(new8.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_dp_sp_pretrain_step_parity(batch):
    """Composed (dp=2, sp=4) mesh: one scan per dp group, each group's
    voxel rows sharded 4-way. Equals the single-device step on the two
    scans' concatenated batch (BN, CE mean, and grads psum over both
    axes; batch ids are disjoint so the union plan is the block concat
    of the group plans up to padding placement, which the masked sums
    ignore)."""
    from jax.sharding import Mesh
    from gcdlss_tpu.parallel.sp_step import (
        backbone_halos, make_dp_sp_pretrain_step)
    from gcdlss_tpu.train.pretrain import (
        PretrainConfig, create_pretrain_state, pretrain_train_step)

    # split the 2-scan fixture into per-scan groups at half the caps
    caps_g = tuple(c // 2 for c in CAPS)
    coords = np.asarray(batch["coords"])
    valid = np.asarray(batch["valid"])
    gb, gv, gf, gl = [], [], [], []
    rng = np.random.default_rng(3)
    for s in range(2):
        sel = valid & (coords[:, 0] == s)
        n = int(sel.sum())
        assert n <= caps_g[0]
        c = np.zeros((caps_g[0], 4), np.int32)
        c[:n] = coords[sel]
        v = np.zeros((caps_g[0],), bool)
        v[:n] = True
        f = np.zeros((caps_g[0], 1), np.float32)
        f[:n] = np.asarray(batch["feats"])[sel]
        l = np.full((caps_g[0],), -1, np.int32)
        l[:n] = np.asarray(batch["mapped_labels"])[sel]
        gb.append(c); gv.append(v); gf.append(f); gl.append(l)
    grouped = {
        "coords": jnp.asarray(np.stack(gb)),
        "valid": jnp.asarray(np.stack(gv)),
        "feats": jnp.asarray(np.stack(gf)),
        "labels": jnp.asarray(np.stack(gl)),
        "mapped_labels": jnp.asarray(np.stack(gl)),
    }

    cfg_ref = PretrainConfig(
        num_labeled_classes=17, num_classes=19, unknown_label=17,
        voxel_caps=CAPS, arch="MinkUNet14", planes=(8,) * 8,
        steps_per_epoch=1, epochs=2, warmup_epochs=1,
    )
    cfg_g = PretrainConfig(
        num_labeled_classes=17, num_classes=19, unknown_label=17,
        voxel_caps=caps_g, arch="MinkUNet14", planes=(8,) * 8,
        steps_per_epoch=1, epochs=2, warmup_epochs=1,
    )

    # reference: single device on the concatenated batch (labels must
    # match the grouped split: mask out rows the groups dropped — none)
    ref_batch = dict(batch)
    ref_batch["mapped_labels"] = jnp.where(
        batch["valid"], batch["mapped_labels"], -1)
    ref_batch["labels"] = ref_batch["mapped_labels"]
    state1 = create_pretrain_state(jax.random.PRNGKey(0), cfg_ref)
    new1, m1 = pretrain_train_step(state1, ref_batch, cfg_ref)

    # halos: max requirement over the two group plans at sp=4
    plans = [jax.jit(
        lambda c, v: build_unet_plan(c, v, caps_g, presorted=True)
    )(grouped["coords"][g], grouped["valid"][g]) for g in range(2)]
    halos = tuple(
        max(h) for h in zip(*[backbone_halos(p, 4) for p in plans]))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    state8 = create_pretrain_state(jax.random.PRNGKey(0), cfg_g)
    step = make_dp_sp_pretrain_step(cfg_g, mesh, halos)
    new8, m8 = step(state8, grouped)

    assert int(m8["sp_overflow"]) == 0
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                    jax.tree_util.tree_leaves(new8.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new1.batch_stats),
                    jax.tree_util.tree_leaves(new8.batch_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
