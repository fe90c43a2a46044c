"""Pure-torch MinkUNet sparse-conv oracle executing reference-shaped dicts.

An independent, dictionary-lookup implementation of the reference backbone
(`/root/reference/models/minkunet.py:44-132`: stem k=5, four k2s2 downs,
four k2s2 transpose ups with skip cat, residual blocks, 1x1 heads) that
consumes a reference-layout `state_dict` directly — ME kernel tensors
[K, Ci, Co] with the kernel-offset enumeration order as an explicit
parameter. Running it against the flax model after `import_minkunet`
validates every piece of the importer's layout math (offset permutations,
k2 dcode bit order, BN mapping, topology/skip wiring) with an executable
reference; only ME's actual enumeration convention (one bit:
first- vs last-axis-fastest) remains an offline assumption.
"""

from __future__ import annotations

import itertools

import numpy as np
import torch


def offsets_odd(k: int, order: str):
    r = list(range(-(k // 2), k // 2 + 1))
    if order == "first_fastest":
        return [(x, y, z) for z in r for y in r for x in r]
    return list(itertools.product(r, r, r))  # z fastest


def offsets_k2(order: str):
    b = (0, 1)
    if order == "first_fastest":
        return [(x, y, z) for z in b for y in b for x in b]
    return list(itertools.product(b, b, b))


def _table(coords: np.ndarray) -> dict:
    return {tuple(c): i for i, c in enumerate(coords.tolist())}


def subm_conv(coords, feats, w, order, bias=None):
    """out[u] = sum_i x[u + off_i] @ W[i] (same-sign convention as the
    engine's plan queries, `ops/plan.py:76-85`)."""
    k = round(w.shape[0] ** (1.0 / 3.0))
    tab = _table(coords)
    rows = coords.tolist()
    out = feats.new_zeros(coords.shape[0], w.shape[2])
    for i, off in enumerate(offsets_odd(k, order)):
        us, vs = [], []
        for u, c in enumerate(rows):
            v = tab.get((c[0], c[1] + off[0], c[2] + off[1], c[3] + off[2]))
            if v is not None:
                us.append(u)
                vs.append(v)
        if us:
            out[torch.tensor(us)] += feats[torch.tensor(vs)] @ w[i]
    if bias is not None:
        out += bias
    return out


def _k2_groups(coords_fine, coords_coarse, order):
    """(parent_row, k2_index) per fine row."""
    idx = {o: i for i, o in enumerate(offsets_k2(order))}
    tab = _table(coords_coarse)
    parents, kidx = [], []
    for c in coords_fine.tolist():
        parents.append(tab[(c[0], c[1] >> 1, c[2] >> 1, c[3] >> 1)])
        kidx.append(idx[(c[1] & 1, c[2] & 1, c[3] & 1)])
    return torch.tensor(parents), torch.tensor(kidx)


def down_conv(coords_fine, coords_coarse, feats, w, order):
    """Strided k=2 s=2: child c contributes via offset bits c - 2*parent."""
    parents, kidx = _k2_groups(coords_fine, coords_coarse, order)
    out = feats.new_zeros(coords_coarse.shape[0], w.shape[2])
    for i in range(8):
        m = kidx == i
        if m.any():
            out.index_add_(0, parents[m], feats[m] @ w[i])
    return out


def up_conv(coords_fine, coords_coarse, feats_coarse, w, order):
    """Transpose k=2 s=2 onto the cached finer-level coords."""
    parents, kidx = _k2_groups(coords_fine, coords_coarse, order)
    out = feats_coarse.new_zeros(coords_fine.shape[0], w.shape[2])
    for i in range(8):
        m = kidx == i
        if m.any():
            out[m] = feats_coarse[parents[m]] @ w[i]
    return out


class RefOracle:
    """Eval-mode forward of a reference state dict on raw voxel coords."""

    def __init__(self, sd: dict, layers: tuple, order: str = "first_fastest"):
        self.sd = {k: torch.as_tensor(np.asarray(v), dtype=torch.float32)
                   for k, v in sd.items()}
        self.layers = layers
        self.order = order

    def _bn(self, x, path):
        sd = self.sd
        w, b = sd[f"{path}.bn.weight"], sd[f"{path}.bn.bias"]
        m, v = sd[f"{path}.bn.running_mean"], sd[f"{path}.bn.running_var"]
        return (x - m) / torch.sqrt(v + 1e-5) * w + b

    def _block_stack(self, x, coords, name, n_blocks):
        sd = self.sd
        for bi in range(n_blocks):
            p = f"encoder.{name}.{bi}"
            res = x
            h = subm_conv(coords, x, sd[f"{p}.conv1.kernel"], self.order)
            h = torch.relu(self._bn(h, f"{p}.norm1"))
            h = subm_conv(coords, h, sd[f"{p}.conv2.kernel"], self.order)
            h = self._bn(h, f"{p}.norm2")
            if f"{p}.downsample.0.kernel" in sd:
                res = self._bn(x @ sd[f"{p}.downsample.0.kernel"],
                               f"{p}.downsample.1")
            x = torch.relu(h + res)
        return x

    def __call__(self, coords: np.ndarray, feats: np.ndarray) -> dict:
        sd = self.sd
        x = torch.as_tensor(feats, dtype=torch.float32)
        lvls = [np.asarray(coords, np.int64)]
        for _ in range(4):
            c = lvls[-1].copy()
            c[:, 1:] >>= 1
            lvls.append(np.unique(c, axis=0))

        # stem k=5
        x = subm_conv(lvls[0], x, sd["encoder.conv0p1s1.kernel"], self.order)
        x = torch.relu(self._bn(x, "encoder.bn0"))
        skips = [x]
        for i in range(4):
            stride = 2 ** i
            x = down_conv(lvls[i], lvls[i + 1], x,
                          sd[f"encoder.conv{i + 1}p{stride}s2.kernel"],
                          self.order)
            x = torch.relu(self._bn(x, f"encoder.bn{i + 1}"))
            x = self._block_stack(x, lvls[i + 1], f"block{i + 1}",
                                  self.layers[i])
            skips.append(x)
        for j in range(4):
            lvl = 3 - j
            x = up_conv(lvls[lvl], lvls[lvl + 1], x,
                        sd[f"encoder.convtr{4 + j}p{2 ** (4 - j)}s2.kernel"],
                        self.order)
            x = torch.relu(self._bn(x, f"encoder.bntr{4 + j}"))
            x = torch.cat([x, skips[lvl]], dim=-1)
            x = self._block_stack(x, lvls[lvl], f"block{5 + j}",
                                  self.layers[4 + j])

        out = {"feats": x}
        for head in ("final", "final2", "final3"):
            k = f"encoder.{head}.kernel"
            if k in self.sd:
                out[head] = x @ self.sd[k] + self.sd[f"encoder.{head}.bias"]
        return out
