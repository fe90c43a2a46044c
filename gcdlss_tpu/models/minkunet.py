"""MinkUNet family on the TPU sparse-conv engine (flax).

Re-implements the reference backbone topology exactly — stem k=5, four k2s2
strided downs, four k2s2 transpose ups with skip concatenation, residual block
stacks per level, and the `final`/`final2` (NCC)/`final3` (novel) 1x1 heads —
but on fixed-capacity padded buffers driven by a per-batch `UNetPlan`.

Reference: `models/minkunet.py:44-132` (MinkUNetBaseRC topology),
`models/minkunet.py:376-592` (size zoo), `models/resnet.py:90-122`
(residual layers), `models/multiheadminkunet.py:309-392` (wrappers and the
`forward` / `forward_discover` output assembly).

Output assembly mirrors the reference's head compositions:
  * dummy logits  = [final | max(final2)]                  (K+1 columns)
  * novel logits  = [final | final3 | max(final2)]         (K+Ku+1 columns)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .layers import (SparseConv, SparseDownConv, SparseUpConv,
                     SparseBatchNorm, NormedLinear, NormedLinearT, DenseT,
                     mask_rows, mask_cols, _mask)

# name -> (block_type, layers). 'basic' expansion=1, 'bottleneck' expansion=4.
ARCHS = {
    "MinkUNet14": ("basic", (1, 1, 1, 1, 1, 1, 1, 1)),
    "MinkUNet18": ("basic", (2, 2, 2, 2, 2, 2, 2, 2)),
    "MinkUNet34": ("basic", (2, 3, 4, 6, 2, 2, 2, 2)),
    "MinkUNet50": ("bottleneck", (2, 3, 4, 6, 2, 2, 2, 2)),
    "MinkUNet101": ("bottleneck", (2, 3, 4, 23, 2, 2, 2, 2)),
}

DEFAULT_PLANES = (32, 64, 128, 256, 256, 128, 96, 96)
PLANE_VARIANTS = {
    "A14": (32, 64, 128, 256, 128, 128, 96, 96),
    "B14": (32, 64, 128, 256, 128, 128, 128, 128),
    "C14": (32, 64, 128, 256, 192, 192, 128, 128),
    "D14": (32, 64, 128, 256, 384, 384, 384, 384),
    "A18": (32, 64, 128, 256, 256, 128, 96, 96),
    "B18": (32, 64, 128, 256, 128, 128, 128, 128),
    "D18": (32, 64, 128, 256, 384, 384, 384, 384),
    "A34": (32, 64, 128, 256, 256, 128, 64, 64),
    "B34": (32, 64, 128, 256, 256, 128, 64, 32),
    "C34": (32, 64, 128, 256, 256, 128, 96, 96),
}


class BasicBlock(nn.Module):
    """conv3-bn-relu-conv3-bn + (1x1 proj if channels change), relu."""

    planes: int
    dtype: Any = jnp.float32
    layout: str = "rows"
    sp_axis: Any = None
    sp_halo: int = 0

    @nn.compact
    def __call__(self, x, nbr, valid, train: bool):
        lay = self.layout
        sp = dict(sp_axis=self.sp_axis, sp_halo=self.sp_halo)
        cax = 0 if lay == "cols" else -1
        dense = (lambda f, name: DenseT(f, use_bias=False, dtype=self.dtype,
                                        name=name)) if lay == "cols" else (
            lambda f, name: nn.Dense(f, use_bias=False, dtype=self.dtype,
                                     name=name))
        residual = x
        out = SparseConv(self.planes, kernel_volume=nbr.shape[1], layout=lay,
                         name="conv1", **sp)(x, nbr, valid)
        out = SparseBatchNorm(layout=lay, name="norm1",
                              sp_axis=self.sp_axis)(out, valid, not train)
        out = nn.relu(out)
        out = SparseConv(self.planes, kernel_volume=nbr.shape[1], layout=lay,
                         name="conv2", **sp)(out, nbr, valid)
        out = SparseBatchNorm(layout=lay, name="norm2",
                              sp_axis=self.sp_axis)(out, valid, not train)
        if x.shape[cax] != self.planes:
            residual = dense(self.planes, "proj")(x)
            residual = SparseBatchNorm(layout=lay, name="proj_norm",
                                       sp_axis=self.sp_axis)(
                residual, valid, not train)
        return _mask(nn.relu(out + residual), valid, lay)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) bottleneck residual block (expansion 4)."""

    planes: int
    dtype: Any = jnp.float32
    layout: str = "rows"
    sp_axis: Any = None
    sp_halo: int = 0
    EXPANSION = 4

    @nn.compact
    def __call__(self, x, nbr, valid, train: bool):
        lay = self.layout
        cax = 0 if lay == "cols" else -1
        dense = (lambda f, name: DenseT(f, use_bias=False, dtype=self.dtype,
                                        name=name)) if lay == "cols" else (
            lambda f, name: nn.Dense(f, use_bias=False, dtype=self.dtype,
                                     name=name))
        bn = lambda name: SparseBatchNorm(layout=lay, name=name,
                                          sp_axis=self.sp_axis)
        residual = x
        out_ch = self.planes * self.EXPANSION
        out = dense(self.planes, "conv1")(x)
        out = bn("norm1")(out, valid, not train)
        out = nn.relu(out)
        out = SparseConv(self.planes, kernel_volume=nbr.shape[1], layout=lay,
                         sp_axis=self.sp_axis, sp_halo=self.sp_halo,
                         name="conv2")(out, nbr, valid)
        out = bn("norm2")(out, valid, not train)
        out = nn.relu(out)
        out = dense(out_ch, "conv3")(out)
        out = bn("norm3")(out, valid, not train)
        if x.shape[cax] != out_ch:
            residual = dense(out_ch, "proj")(x)
            residual = bn("proj_norm")(residual, valid, not train)
        return _mask(nn.relu(out + residual), valid, lay)


def _block_cls(kind: str):
    return BasicBlock if kind == "basic" else Bottleneck


def _expansion(kind: str) -> int:
    return 1 if kind == "basic" else 4


class _ResLayer(nn.Module):
    kind: str
    planes: int
    blocks: int
    dtype: Any = jnp.float32
    remat: bool = False
    layout: str = "rows"
    sp_axis: Any = None
    sp_halo: int = 0

    @nn.compact
    def __call__(self, x, nbr, valid, train: bool):
        cls = _block_cls(self.kind)
        if self.remat:
            cls = nn.remat(cls, static_argnums=(4,))
        for i in range(self.blocks):
            x = cls(self.planes, self.dtype, self.layout,
                    self.sp_axis, self.sp_halo,
                    name=f"block{i}")(x, nbr, valid, train)
        return x


def default_layout() -> str:
    """Activation layout for new models: transposed [C, N] ("cols") where
    the fused TPU kernels run (erases the per-conv pack transposes), row
    layout elsewhere. Override with GCDLSS_LAYOUT=rows|cols."""
    import os
    mode = os.environ.get("GCDLSS_LAYOUT", "auto")
    if mode in ("rows", "cols"):
        return mode
    # auto: "cols" on TPU (T kernels hardware-validated 2026-08-17: parity
    # within bf16 tolerance vs gather_conv, fwd 4.16 vs 4.45 ms rows, pool
    # down 3.63 vs 5.33 ms at 69120/96ch), "rows" elsewhere (CPU fallback
    # transposes locally — correct but nothing to gain).
    import jax
    return "cols" if jax.default_backend() == "tpu" else "rows"


class MinkUNetBackbone(nn.Module):
    """Sparse UNet over a 5-level UNetPlan. Returns stride-1 features (block8)."""

    arch: str = "MinkUNet34"
    planes: tuple = DEFAULT_PLANES
    init_dim: int = 32
    layers_override: Any = None
    dtype: Any = jnp.float32  # activation/compute dtype (bf16 on TPU)
    remat: bool = False  # rematerialize residual stacks (memory vs FLOPs)
    layout: str = "rows"  # "cols" = transposed [C, N] activations (TPU)
    out_layout: str = "rows"  # "cols": skip the exit transpose (T heads)
    sp_axis: Any = None  # voxel-sharding mesh axis (run inside shard_map)
    # static halos per map, (stem, subm0..4, pool0..3); size them from
    # parallel.voxel_shard.required_halos and watch the sown "sp_overflow"
    # counters (non-zero -> halos too small for this batch)
    sp_halos: tuple = ()

    @nn.compact
    def __call__(self, plan, feats, train: bool):
        kind, layers = ARCHS[self.arch]
        if self.layers_override is not None:
            layers = self.layers_override
        exp = _expansion(kind)
        p = self.planes
        lay = self.layout
        cols = lay == "cols"
        cax = 0 if cols else -1
        sp = self.sp_axis
        if sp is not None:
            assert not cols, "voxel sharding uses the rows layout"
            assert len(self.sp_halos) == 10, "need (stem, subm0..4, pool0..3)"
        hs = self.sp_halos or (0,) * 10
        lv = plan.levels
        pools = plan.pools
        caps = [l.coords.shape[0] for l in lv]
        feats = feats.astype(self.dtype)
        if cols:
            # entry transpose is free in practice: the stem input is [N, 1]
            feats = feats.T

        # ---- stem (k=5, stride 1) ----
        x = SparseConv(self.init_dim, kernel_volume=plan.stem_nbr.shape[1],
                       layout=lay, sp_axis=sp, sp_halo=hs[0],
                       name="conv0p1s1")(
            feats, plan.stem_nbr, lv[0].valid
        )
        x = SparseBatchNorm(layout=lay, sp_axis=sp, name="bn0")(
            x, lv[0].valid, not train)
        out_p1 = nn.relu(x)

        # ---- encoder ----
        skips = [out_p1]
        x = out_p1
        for i in range(4):
            x = SparseDownConv(x.shape[cax], caps[i + 1], layout=lay,
                               sp_axis=sp, sp_halo=hs[6 + i],
                               name=f"conv{i + 1}s2")(
                x, pools[i], lv[i + 1].valid
            )
            x = SparseBatchNorm(layout=lay, sp_axis=sp, name=f"bn{i + 1}")(
                x, lv[i + 1].valid, not train)
            x = nn.relu(x)
            x = _ResLayer(kind, p[i], layers[i], self.dtype, self.remat, lay,
                          sp, hs[2 + i], name=f"block{i + 1}")(
                x, lv[i + 1].nbr3, lv[i + 1].valid, train
            )
            skips.append(x)

        # ---- decoder ----
        for j in range(4):
            lvl = 3 - j  # target level index (3,2,1,0)
            x = SparseUpConv(p[4 + j], layout=lay, sp_axis=sp,
                             sp_halo=hs[6 + lvl],
                             name=f"convtr{4 + j}s2")(
                x, pools[lvl], lv[lvl].valid)
            x = SparseBatchNorm(layout=lay, sp_axis=sp, name=f"bntr{4 + j}")(
                x, lv[lvl].valid, not train)
            x = nn.relu(x)
            skip = skips[lvl]
            x = jnp.concatenate([x, skip], axis=cax)
            x = _ResLayer(kind, p[4 + j], layers[4 + j], self.dtype,
                          self.remat, lay, sp, hs[1 + lvl],
                          name=f"block{5 + j}")(
                x, lv[lvl].nbr3, lv[lvl].valid, train
            )
        if cols and self.out_layout != "cols":
            # single exit transpose back to the public [N, C] contract
            x = x.T
        return x  # [cap0, planes[7]*exp] (or its transpose)


class MinkUNetSeg(nn.Module):
    """Backbone + `final` head: the Stage-1 pretrain model.

    Mirrors `MinkUNetBase` (reference `models/multiheadminkunet.py:309-340`):
    returns {'logits', 'feats'}.
    """

    num_classes: int
    arch: str = "MinkUNet34"
    planes: tuple = DEFAULT_PLANES
    dtype: Any = jnp.float32
    remat: bool = False
    head: str = "linear"  # "cosine" = MinkUNetBaseCosine (ExpCosinePretrain)
    sp_axis: Any = None  # voxel-sharding mesh axis (see parallel.voxel_shard)
    sp_halos: tuple = ()

    @nn.compact
    def __call__(self, plan, feats, train: bool = True):
        lay = "rows" if self.sp_axis is not None else default_layout()
        h = MinkUNetBackbone(self.arch, self.planes, dtype=self.dtype,
                             remat=self.remat, layout=lay, out_layout=lay,
                             sp_axis=self.sp_axis, sp_halos=self.sp_halos,
                             name="encoder")(plan, feats, train)
        h = h.astype(jnp.float32)  # heads + losses in f32
        valid = plan.levels[0].valid
        if lay == "cols":
            # heads consume [C, N] directly; logits transpose is tiny and
            # the [N, C] feats materialize only if a consumer uses them
            # (XLA dead-code-eliminates the transpose otherwise)
            if self.head == "cosine":
                logitsT = NormedLinearT(self.num_classes, name="final")(h)
            else:
                logitsT = DenseT(self.num_classes, name="final")(h)
            return {
                "logits": mask_rows(logitsT.T, valid),
                "feats": h.T,
            }
        if self.head == "cosine":
            # cosine-prototype classifier (`multiheadminkunet.py:458-488`)
            logits = NormedLinear(self.num_classes, name="final")(h)
        else:
            logits = nn.Dense(self.num_classes, name="final")(h)
        return {
            "logits": mask_rows(logits, valid),
            "feats": h,
        }


class MinkUNetRC(nn.Module):
    """Backbone + final (K) + final2 (NCC, 3) + final3 (novel, Ku) heads.

    The Stage-2 teacher/student model. `__call__` computes all head outputs in
    one pass; use `assemble_dummy_logits` / `assemble_novel_logits` to build
    the reference's `forward` / `forward_discover` logit layouts
    (`models/multiheadminkunet.py:342-392`, `models/minkunet.py:312-362`).
    """

    num_labeled: int
    num_novel: int
    ncc_heads: int = 3
    arch: str = "MinkUNet34"
    planes: tuple = DEFAULT_PLANES
    dtype: Any = jnp.float32
    remat: bool = False
    head: str = "linear"  # "cosine" = MinkUNetRCCosine (ExpMixCosineFineTuning,
    #                        `multiheadminkunet.py:490-522`, `exp.py:1758-1795`:
    #                        cosine-prototype known + NCC heads)
    sp_axis: Any = None  # voxel-sharding mesh axis (see parallel.voxel_shard)
    sp_halos: tuple = ()

    @nn.compact
    def __call__(self, plan, feats, train: bool = True):
        lay = "rows" if self.sp_axis is not None else default_layout()
        h = MinkUNetBackbone(self.arch, self.planes, dtype=self.dtype,
                             remat=self.remat, layout=lay, out_layout=lay,
                             sp_axis=self.sp_axis, sp_halos=self.sp_halos,
                             name="encoder")(plan, feats, train)
        h = h.astype(jnp.float32)
        valid = plan.levels[0].valid
        if lay == "cols":
            if self.head == "cosine":
                known = NormedLinearT(self.num_labeled, name="final")(h).T
                ncc = NormedLinearT(self.ncc_heads, name="final2")(h).T
            else:
                known = DenseT(self.num_labeled, name="final")(h).T
                ncc = DenseT(self.ncc_heads, name="final2")(h).T
            novel = DenseT(self.num_novel, name="final3")(h).T
            return {
                "feats": h.T,  # DCE'd when unused (pretrain/finetune steps)
                "logits_known": mask_rows(known, valid),
                "logits_ncc": mask_rows(ncc, valid),
                "logits_novel": mask_rows(novel, valid),
            }
        if self.head == "cosine":
            known = NormedLinear(self.num_labeled, name="final")(h)
            ncc = NormedLinear(self.ncc_heads, name="final2")(h)
        else:
            known = nn.Dense(self.num_labeled, name="final")(h)
            ncc = nn.Dense(self.ncc_heads, name="final2")(h)
        out = {
            "feats": h,
            "logits_known": mask_rows(known, valid),
            "logits_ncc": mask_rows(ncc, valid),
            "logits_novel": mask_rows(nn.Dense(self.num_novel, name="final3")(h), valid),
        }
        return out


def assemble_dummy_logits(out: dict) -> jnp.ndarray:
    """[final | max(final2)] — reference `forward_dummy` (minkunet.py:312-322)."""
    ncc_max = jnp.max(out["logits_ncc"], axis=-1, keepdims=True)
    return jnp.concatenate([out["logits_known"], ncc_max], axis=-1)


def assemble_dummy_logits_mean(out: dict) -> jnp.ndarray:
    """[final | mean(final2)] — RCAblation mean NCC pooling (reference
    `models/minkunet.py:324-334`, `multiheadminkunet.py:428-431`)."""
    ncc = jnp.mean(out["logits_ncc"], axis=-1, keepdims=True)
    return jnp.concatenate([out["logits_known"], ncc], axis=-1)


def assemble_dummy_logits_sum(out: dict) -> jnp.ndarray:
    """[final | sum(final2)] — RCAblation sum NCC pooling (reference
    `models/minkunet.py:336-346`, `multiheadminkunet.py:432-435`)."""
    ncc = jnp.sum(out["logits_ncc"], axis=-1, keepdims=True)
    return jnp.concatenate([out["logits_known"], ncc], axis=-1)


def assemble_novel_logits(out: dict) -> jnp.ndarray:
    """[final | final3 | max(final2)] — reference `forward_novel` (minkunet.py:349-362)."""
    ncc_max = jnp.max(out["logits_ncc"], axis=-1, keepdims=True)
    return jnp.concatenate([out["logits_known"], out["logits_novel"], ncc_max], axis=-1)


def assemble_dummy_logits_from_heads(feats, params_final, params_final2):
    """Dummy logits from raw head weights (for mixed features; reference
    `exp_merge_mean_teacher.py:2822-2825` reads `.kernel`/`.bias` directly)."""
    kin = feats @ params_final["kernel"] + params_final["bias"]
    kout = feats @ params_final2["kernel"] + params_final2["bias"]
    return jnp.concatenate([kin, jnp.max(kout, axis=-1, keepdims=True)], axis=-1)
