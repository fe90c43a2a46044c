"""Torch-checkpoint importer: reference MinkUNet state dicts -> flax params.

Maps the reference's PyTorch/MinkowskiEngine checkpoints
(`models/minkunet.py:44-132`, `models/resnet.py:90-122`, wrappers
`models/multiheadminkunet.py:309-392`; loaded by the reference via
`load_pretrained` with the `model.` prefix stripped,
`modules/exp_merge_mean_teacher.py:229-244`) onto this framework's
`MinkUNetSeg` / `MinkUNetRC` parameter trees.

Layout maps handled explicitly:
  * k^3 submanifold conv kernels: ME stores [K, Ci, Co] with kernel offsets
    enumerated FIRST-axis-fastest (x fastest; ME `RegionIterator` increments
    dimension 0 first); this repo's plans enumerate `itertools.product`
    order (z fastest, `ops/plan.py:39-44`). `offset_permutation` converts.
  * k=2 s=2 down / transpose convs: ME offsets are {0,1}^3 first-axis-
    fastest (index x + 2y + 4z); this repo's `dcode` packs bits as
    (x<<2 | y<<1 | z) (`ops/plan.py:156-160`) — a bit-reversal permutation.
  * k=1 convs (`final*`, residual `downsample.0`): ME kernel [Ci, Co] maps
    directly onto flax Dense kernels.
  * `MinkowskiBatchNorm` -> SparseBatchNorm: weight/bias -> scale/bias,
    running_mean/var -> batch_stats.

The ME offset-order convention cannot be falsified offline (MinkowskiEngine
is CUDA-only and not installed); it is therefore a parameter
(`me_order="first_fastest"`) and the permutation logic itself is
round-trip-tested (`tests/test_import_torch.py`).

Works on numpy arrays or torch CPU tensors.
"""

from __future__ import annotations

import numpy as np


def _to_np(x):
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def offset_permutation(ksize: int, me_order: str = "first_fastest") -> np.ndarray:
    """perm[ours] = me_index so that ours_kernel = me_kernel[perm].

    Our offset order is `itertools.product(r, r, r)` (z fastest)."""
    n = ksize ** 3
    perm = np.zeros(n, np.int64)
    r = range(ksize)
    for xi in r:
        for yi in r:
            for zi in r:
                o = (xi * ksize + yi) * ksize + zi
                if me_order == "first_fastest":
                    m = xi + ksize * yi + ksize * ksize * zi
                else:  # last_fastest == our order
                    m = o
                perm[o] = m
    return perm


def dcode_permutation(me_order: str = "first_fastest") -> np.ndarray:
    """perm[dcode] = me k2 index. dcode = (x<<2 | y<<1 | z)."""
    perm = np.zeros(8, np.int64)
    for x in range(2):
        for y in range(2):
            for z in range(2):
                o = (x << 2) | (y << 1) | z
                m = (x + 2 * y + 4 * z) if me_order == "first_fastest" else o
                perm[o] = m
    return perm


# ours encoder module name -> reference attribute path (under `encoder.`)
def _ref_name(name: str) -> str:
    if name == "conv0p1s1" or name.startswith("final"):
        return name
    if name.startswith("convtr"):
        j = int(name[6:-2])
        return f"convtr{j}p{2 ** (8 - j)}s2"
    if name.startswith("conv") and name.endswith("s2"):
        i = int(name[4:-2])
        return f"conv{i}p{2 ** (i - 1)}s2"
    if name.startswith("bn") or name.startswith("bntr"):
        return name
    if name.startswith("block"):
        return name
    raise KeyError(f"unmapped module {name}")


def _conv_in(sd, key, shape, me_order):
    w = _to_np(sd[key]).astype(np.float32)
    k = shape[0]
    if w.ndim == 2:  # k=1 conv
        assert tuple(w.shape) == tuple(shape), (key, w.shape, shape)
        return w
    assert tuple(w.shape) == tuple(shape), (key, w.shape, shape)
    if k == 8:
        return w[dcode_permutation(me_order)]
    ks = round(k ** (1.0 / 3.0))
    assert ks ** 3 == k, (key, k)
    return w[offset_permutation(ks, me_order)]


def _conv_out(w, me_order):
    w = np.asarray(w, np.float32)
    if w.ndim == 2:
        return w
    k = w.shape[0]
    if k == 8:
        inv = np.argsort(dcode_permutation(me_order))
    else:
        ks = round(k ** (1.0 / 3.0))
        inv = np.argsort(offset_permutation(ks, me_order))
    return w[inv]


def import_minkunet(sd: dict, params, batch_stats, prefix: str = "",
                    me_order: str = "first_fastest"):
    """Import a reference-shaped state dict into (params, batch_stats).

    `params`/`batch_stats` are templates from `model.init` (MinkUNetSeg or
    MinkUNetRC). `prefix` prepends e.g. "model." for raw Lightning dicts.
    Returns new (params, batch_stats) trees as numpy arrays (pass through
    `jax.tree_util.tree_map(jnp.asarray, ...)` to device).
    Missing heads (fresh final2/final3 in Stage-1 dicts) are left at their
    template values, mirroring the reference's strict=False load.
    """
    import copy

    params = copy.deepcopy(jax_to_np(params))
    batch_stats = copy.deepcopy(jax_to_np(batch_stats))

    def bn_in(dst_p, dst_s, ref_path):
        wkey = f"{ref_path}.bn.weight"
        if wkey not in sd:
            return False
        dst_p["scale"] = _to_np(sd[wkey]).astype(np.float32)
        dst_p["bias"] = _to_np(sd[f"{ref_path}.bn.bias"]).astype(np.float32)
        if dst_s is not None:
            dst_s["mean"] = _to_np(sd[f"{ref_path}.bn.running_mean"]).astype(np.float32)
            dst_s["var"] = _to_np(sd[f"{ref_path}.bn.running_var"]).astype(np.float32)
        return True

    def conv_in_(dst, ref_path):
        key = f"{ref_path}.kernel"
        if key not in sd:
            return False
        dst["kernel"] = _conv_in(sd, key, dst["kernel"].shape, me_order)
        if "bias" in dst and f"{ref_path}.bias" in sd:
            dst["bias"] = _to_np(sd[f"{ref_path}.bias"]).astype(np.float32)
        return True

    enc_p = params["encoder"]
    enc_s = batch_stats.get("encoder", {})
    for name, mod in enc_p.items():
        ref = prefix + "encoder." + _ref_name(name)
        if name.startswith("bn"):
            bn_in(mod, enc_s.get(name), ref)
        elif name.startswith("block"):
            for bname, blk in mod.items():  # block0, block1, ...
                bi = bname.replace("block", "")
                bref = f"{ref}.{bi}"
                bs = enc_s.get(name, {}).get(bname, {})
                conv_in_(blk["conv1"], f"{bref}.conv1")
                conv_in_(blk["conv2"], f"{bref}.conv2")
                bn_in(blk["norm1"], bs.get("norm1"), f"{bref}.norm1")
                bn_in(blk["norm2"], bs.get("norm2"), f"{bref}.norm2")
                if "proj" in blk:
                    conv_in_(blk["proj"], f"{bref}.downsample.0")
                    bn_in(blk["proj_norm"], bs.get("proj_norm"),
                          f"{bref}.downsample.1")
        else:
            conv_in_(mod, ref)

    # heads live INSIDE the reference encoder (`minkunet.py:123-128`,
    # final2/final3 attached there too, `exp_merge_mean_teacher.py:128-153`)
    for head in ("final", "final2", "final3"):
        if head in params:
            key = f"{prefix}encoder.{head}.kernel"
            if key in sd:
                params[head]["kernel"] = _to_np(sd[key]).astype(np.float32)
                bkey = f"{prefix}encoder.{head}.bias"
                if bkey in sd:
                    params[head]["bias"] = _to_np(sd[bkey]).astype(np.float32)
    return params, batch_stats


def export_minkunet(params, batch_stats, prefix: str = "",
                    me_order: str = "first_fastest") -> dict:
    """Inverse of `import_minkunet`: flax trees -> reference-shaped dict."""
    sd = {}
    params = jax_to_np(params)
    batch_stats = jax_to_np(batch_stats)

    def bn_out(src_p, src_s, ref_path):
        sd[f"{ref_path}.bn.weight"] = np.asarray(src_p["scale"], np.float32)
        sd[f"{ref_path}.bn.bias"] = np.asarray(src_p["bias"], np.float32)
        if src_s is not None:
            sd[f"{ref_path}.bn.running_mean"] = np.asarray(src_s["mean"], np.float32)
            sd[f"{ref_path}.bn.running_var"] = np.asarray(src_s["var"], np.float32)
            sd[f"{ref_path}.bn.num_batches_tracked"] = np.asarray(0, np.int64)

    def conv_out_(src, ref_path):
        sd[f"{ref_path}.kernel"] = _conv_out(src["kernel"], me_order)
        if "bias" in src:
            sd[f"{ref_path}.bias"] = np.asarray(src["bias"], np.float32)

    enc_p = params["encoder"]
    enc_s = batch_stats.get("encoder", {})
    for name, mod in enc_p.items():
        ref = prefix + "encoder." + _ref_name(name)
        if name.startswith("bn"):
            bn_out(mod, enc_s.get(name), ref)
        elif name.startswith("block"):
            for bname, blk in mod.items():
                bi = bname.replace("block", "")
                bref = f"{ref}.{bi}"
                bs = enc_s.get(name, {}).get(bname, {})
                conv_out_(blk["conv1"], f"{bref}.conv1")
                conv_out_(blk["conv2"], f"{bref}.conv2")
                bn_out(blk["norm1"], bs.get("norm1"), f"{bref}.norm1")
                bn_out(blk["norm2"], bs.get("norm2"), f"{bref}.norm2")
                if "proj" in blk:
                    conv_out_(blk["proj"], f"{bref}.downsample.0")
                    bn_out(blk["proj_norm"], bs.get("proj_norm"),
                           f"{bref}.downsample.1")
        else:
            conv_out_(mod, ref)
    for head in ("final", "final2", "final3"):
        if head in params:
            sd[f"{prefix}encoder.{head}.kernel"] = np.asarray(
                params[head]["kernel"], np.float32
            )
            sd[f"{prefix}encoder.{head}.bias"] = np.asarray(
                params[head]["bias"], np.float32
            )
    return sd


def jax_to_np(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
