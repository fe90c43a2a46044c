"""Torch-checkpoint importer: round-trip + forward-equivalence golden test.

1. Round-trip: a reference-shaped state dict (built by the exporter from a
   randomly-initialized flax model) imports back losslessly, and a randomly-
   VALUED reference-shaped dict survives export(import(sd)) == sd.
2. Permutation goldens: the ME offset permutations are involutive against
   their inverses and map the known k=2 bit-reversal.
3. Forward equivalence: importing a state dict whose kernels were permuted
   INTO reference (ME first-fastest) order reproduces the same logits as the
   original flax model — proving the layout maps, not just the plumbing.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gcdlss_tpu.models.minkunet import MinkUNetRC
from gcdlss_tpu.ops.plan import build_unet_plan
from gcdlss_tpu.utils.import_torch import (
    import_minkunet,
    export_minkunet,
    offset_permutation,
    dcode_permutation,
)

CAPS = (1024, 512, 512, 256, 256)


def _model_and_tmpl(seed=0):
    model = MinkUNetRC(num_labeled=5, num_novel=2, arch="MinkUNet14",
                       planes=(8, 8, 8, 8, 8, 8, 8, 8))
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-10, 10, size=(CAPS[0], 3))
    coords = np.concatenate(
        [np.zeros((CAPS[0], 1), np.int32), np.floor(pts / 0.4).astype(np.int32)],
        axis=1,
    )
    coords = coords[np.lexsort((coords[:, 3], coords[:, 2], coords[:, 1]))]
    plan = build_unet_plan(jnp.asarray(coords), jnp.ones((CAPS[0],), bool), CAPS)
    feats = jnp.asarray(rng.uniform(0, 1, (CAPS[0], 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(3), plan, feats, train=False)
    return model, variables, plan, feats


def test_permutations():
    p3 = offset_permutation(3)
    assert sorted(p3.tolist()) == list(range(27))
    # our center (1,1,1) index 13 maps to ME center 13 (both middles)
    assert p3[13] == 13
    # our offset (x=1,y=0,z=0) at our index 9*2+3+1 = 22? (xi=2,yi=1,zi=1)
    # -> me index 2 + 3*1 + 9*1 = 14
    assert p3[(2 * 3 + 1) * 3 + 1] == 2 + 3 + 9
    pd = dcode_permutation()
    assert pd.tolist() == [0, 4, 2, 6, 1, 5, 3, 7]


def test_roundtrip_and_forward_equivalence():
    model, variables, plan, feats = _model_and_tmpl()
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    # export to a reference-shaped dict, then import back
    sd = export_minkunet(params, bstats)
    assert "encoder.conv0p1s1.kernel" in sd
    assert "encoder.block1.0.conv1.kernel" in sd
    assert "encoder.convtr4p16s2.kernel" in sd
    assert "encoder.final.kernel" in sd and "encoder.final2.bias" in sd
    p2, b2 = import_minkunet(sd, params, bstats)

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(p2))
    # keys match via path comparison
    for path, v in flat1:
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat2[path]),
                                   err_msg=str(path))

    # forward equivalence through the imported tree
    p2j = jax.tree_util.tree_map(jnp.asarray, p2)
    b2j = jax.tree_util.tree_map(jnp.asarray, b2)
    out1 = model.apply({"params": params, "batch_stats": bstats},
                       plan, feats, train=False)
    out2 = model.apply({"params": p2j, "batch_stats": b2j},
                       plan, feats, train=False)
    np.testing.assert_allclose(
        np.asarray(out1["logits_known"]), np.asarray(out2["logits_known"]),
        rtol=1e-6, atol=1e-6,
    )

    # export(import(sd)) == sd exactly (lossless layout maps)
    sd2 = export_minkunet(p2, b2)
    assert set(sd.keys()) == set(sd2.keys())
    for k in sd:
        np.testing.assert_array_equal(np.asarray(sd[k]), np.asarray(sd2[k]),
                                      err_msg=k)


def test_import_random_reference_dict_changes_forward():
    """A foreign (random-valued) reference dict must actually land in the
    model: logits change, and a second import of the same dict is stable."""
    model, variables, plan, feats = _model_and_tmpl()
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    sd = export_minkunet(params, bstats)
    rng = np.random.default_rng(9)
    sd_rand = {k: rng.normal(0, 0.05, np.shape(v)).astype(np.float32)
               if np.asarray(v).dtype != np.int64 else v
               for k, v in sd.items()}
    # running_var must stay positive
    for k in sd_rand:
        if k.endswith("running_var"):
            sd_rand[k] = np.abs(sd_rand[k]) + 0.5
    pa, ba = import_minkunet(sd_rand, params, bstats)
    paj = jax.tree_util.tree_map(jnp.asarray, pa)
    baj = jax.tree_util.tree_map(jnp.asarray, ba)
    out0 = model.apply({"params": params, "batch_stats": bstats},
                       plan, feats, train=False)
    outa = model.apply({"params": paj, "batch_stats": baj},
                       plan, feats, train=False)
    assert not np.allclose(np.asarray(out0["logits_known"]),
                           np.asarray(outa["logits_known"]))
    pb, bb = import_minkunet(sd_rand, params, bstats)
    for (k1, v1), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(pa),
        jax.tree_util.tree_leaves_with_path(pb),
    ):
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_torch_oracle_executes_export():
    """Executable-oracle test: a pure-torch reimplementation of the
    reference backbone (tests/torch_oracle.py) consuming the exported
    reference-shaped state dict reproduces the flax model's logits — for
    BOTH kernel-offset enumeration conventions — and mixing conventions
    breaks the match. This pins down every layout map in the importer
    except ME's single enumeration-order bit (documented in
    utils/import_torch.py)."""
    import torch_oracle as TO

    caps = (512, 512, 512, 256, 256)  # random coords pool poorly: no level
    model = MinkUNetRC(num_labeled=5, num_novel=2, arch="MinkUNet14",
                       planes=(8, 8, 8, 8, 8, 8, 8, 8))
    rng = np.random.default_rng(7)
    pts = rng.uniform(-8, 8, size=(900, 3))
    c = np.unique(
        np.concatenate(
            [np.zeros((900, 1), np.int32),
             np.floor(pts / 0.5).astype(np.int32)], axis=1,
        ), axis=0,
    )[: caps[0] - 32]
    n = len(c)
    coords = np.zeros((caps[0], 4), np.int32)
    coords[:n] = c
    valid = np.zeros((caps[0],), bool)
    valid[:n] = True
    plan = build_unet_plan(jnp.asarray(coords), jnp.asarray(valid), caps)
    # capacity overflow would make the engine (correctly) drop voxels the
    # oracle keeps — ensure the comparison is apples-to-apples
    for lv, cp in zip(plan.levels, caps):
        assert int(np.asarray(lv.valid).sum()) < cp
    feats_np = rng.uniform(-1, 1, (caps[0], 1)).astype(np.float32)
    feats_np[n:] = 0
    variables = model.init(
        jax.random.PRNGKey(3), plan, jnp.asarray(feats_np), train=False)

    # randomize everything (incl. BN stats) so layout mistakes can't hide
    def rnd(x):
        return rng.normal(0, 0.4, x.shape).astype(np.float32)

    params = jax.tree_util.tree_map(rnd, variables["params"])
    bstats = jax.tree_util.tree_map(
        lambda x: rng.uniform(0.5, 1.5, x.shape).astype(np.float32),
        variables.get("batch_stats", {}),
    )

    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, bstats)},
        plan, jnp.asarray(feats_np), train=False,
    )
    got = {
        "final": np.asarray(out["logits_known"])[:n],
        "final2": np.asarray(out["logits_ncc"])[:n],
        "final3": np.asarray(out["logits_novel"])[:n],
    }

    for order in ("first_fastest", "last_fastest"):
        sd = export_minkunet(params, bstats, me_order=order)
        ref = TO.RefOracle(sd, layers=(1,) * 8, order=order)(
            coords[:n], feats_np[:n])
        for head in ("final", "final2", "final3"):
            np.testing.assert_allclose(
                got[head], ref[head].numpy(), rtol=1e-3, atol=2e-3,
                err_msg=f"{order}/{head}",
            )

    # mixed conventions must NOT match (the permutation is load-bearing)
    sd = export_minkunet(params, bstats, me_order="first_fastest")
    ref = TO.RefOracle(sd, layers=(1,) * 8, order="last_fastest")(
        coords[:n], feats_np[:n])
    assert np.abs(got["final"] - ref["final"].numpy()).max() > 1e-2
