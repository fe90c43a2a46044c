"""mmdet3d-topology MinkUNet backbone + the LaserMix-baseline wrapper.

Rebuilds the reference's mmdet3d-based stack faithfully (topology, channel
schedule, block arrangement) on this package's plan-driven sparse engine:

* ``MinkUNetBackboneMM`` — reference `models/backbone.py:47-254`
  (`MinkUNetBackbone`): two-conv k3 stem at ``base_channels``; per encoder
  stage a k2s2 strided conv (channel-preserving) + ``encoder_blocks[i]``
  basic residual blocks to ``encoder_channels[i]``; per decoder stage a
  k2s2 transposed conv to ``decoder_channels[i]`` + lateral concat +
  ``decoder_blocks[i]`` blocks. Defaults mirror the reference call site
  (`models/minkunet_lasermix.py:73-76`): base 32, encoder [32,64,128,256]
  x [2,2,2,2], decoder [256,128,96,96] x [2,2,2,2], 'basic' blocks.
* ``MultiHeadMinkUnet18`` — reference `models/minkunet_lasermix.py:54-181`:
  the backbone (its `MinkUNetHead.conv_seg` is replaced by `nn.Identity`,
  `minkunet_lasermix.py:81`, and `dropout_ratio=0`, so the decode head is a
  pass-through) + `head_lab` Prototypes + `head_unlab` MultiHead
  (+ optional overclustering MultiHead), emitting the NOPS-style output
  dict {'logits_lab', 'logits_unlab', 'proj_feats_unlab', 'feats'}.

Differences from `models.minkunet.MinkUNetBackbone` (the ME topology): k3x2
stem instead of k5, channel-asymmetric residual stages directly after each
down conv (no separate bn/relu ordering change), and the mmdet3d channel
schedule. Both run on the same `UNetPlan` (the stem k3 rulebook is
`levels[0].nbr3`; the k5 `stem_nbr` is unused here).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .layers import (SparseConv, SparseDownConv, SparseUpConv,
                     SparseBatchNorm, mask_rows)
from .minkunet import BasicBlock, Bottleneck, default_layout
from .heads import Prototypes, MultiHead


class _MMResLayer(nn.Module):
    """`encoder_blocks[i]` residual blocks; first block changes channels
    (with a 1x1-projection branch, `backbone.py:156-166`)."""

    kind: str
    planes: int
    blocks: int
    dtype: Any = jnp.float32
    layout: str = "rows"

    @nn.compact
    def __call__(self, x, nbr, valid, train: bool):
        cls = BasicBlock if self.kind == "basic" else Bottleneck
        for i in range(self.blocks):
            x = cls(self.planes, self.dtype, self.layout,
                    name=f"block{i}")(x, nbr, valid, train)
        return x


class MinkUNetBackboneMM(nn.Module):
    """mmdet3d `MinkUNetBackbone` over a 5-level UNetPlan (stride-1 out)."""

    base_channels: int = 32
    encoder_channels: tuple = (32, 64, 128, 256)
    decoder_channels: tuple = (256, 128, 96, 96)
    encoder_blocks: tuple = (2, 2, 2, 2)
    decoder_blocks: tuple = (2, 2, 2, 2)
    block_type: str = "basic"
    dtype: Any = jnp.float32
    layout: str = "rows"

    @nn.compact
    def __call__(self, plan, feats, train: bool):
        lay = self.layout
        cols = lay == "cols"
        cax = 0 if cols else -1
        lv = plan.levels
        pools = plan.pools
        caps = [l.coords.shape[0] for l in lv]
        n_stages = len(self.encoder_channels)
        assert n_stages == len(self.decoder_channels) == len(pools), (
            "plan depth must match the stage count")
        # `backbone.py:143-144`: enc/dec schedules with the stem/bottleneck
        # channels prepended.
        enc = (self.base_channels,) + tuple(self.encoder_channels)
        dec = (enc[-1],) + tuple(self.decoder_channels)

        feats = feats.astype(self.dtype)
        if cols:
            feats = feats.T

        # ---- stem: two k3 submanifold convs (`backbone.py:127-139`) ----
        x = feats
        for s in range(2):
            x = SparseConv(self.base_channels,
                           kernel_volume=lv[0].nbr3.shape[1], layout=lay,
                           name=f"conv_input{s}")(x, lv[0].nbr3, lv[0].valid)
            x = SparseBatchNorm(layout=lay, name=f"bn_input{s}")(
                x, lv[0].valid, not train)
            x = nn.relu(x)

        # ---- encoder (`backbone.py:146-173`, fwd `:230-234`) ----
        laterals = [x]
        for i in range(n_stages):
            x = SparseDownConv(x.shape[cax], caps[i + 1], layout=lay,
                               name=f"enc{i}_down")(x, pools[i],
                                                    lv[i + 1].valid)
            x = SparseBatchNorm(layout=lay, name=f"enc{i}_bn")(
                x, lv[i + 1].valid, not train)
            x = nn.relu(x)
            x = _MMResLayer(self.block_type, enc[i + 1],
                            self.encoder_blocks[i], self.dtype, lay,
                            name=f"enc{i}_blocks")(
                x, lv[i + 1].nbr3, lv[i + 1].valid, train)
            laterals.append(x)
        laterals = laterals[:-1][::-1]

        # ---- decoder (`backbone.py:175-206`, fwd `:236-249`) ----
        for i in range(n_stages):
            lvl = n_stages - 1 - i  # target level (3,2,1,0)
            x = SparseUpConv(dec[i + 1], layout=lay, name=f"dec{i}_up")(
                x, pools[lvl], lv[lvl].valid)
            x = SparseBatchNorm(layout=lay, name=f"dec{i}_bn")(
                x, lv[lvl].valid, not train)
            x = nn.relu(x)
            x = jnp.concatenate([x, laterals[i]], axis=cax)
            x = _MMResLayer(self.block_type, dec[i + 1],
                            self.decoder_blocks[i], self.dtype, lay,
                            name=f"dec{i}_blocks")(
                x, lv[lvl].nbr3, lv[lvl].valid, train)

        if cols:
            x = x.T  # public [N, C] contract at the exit
        return x  # [cap0, decoder_channels[-1]]


class MultiHeadMinkUnet18(nn.Module):
    """LaserMix-baseline model (`minkunet_lasermix.py:54-181`)."""

    num_labeled: int
    num_unlabeled: int
    num_heads: int = 1
    overcluster_factor: int | None = None
    dtype: Any = jnp.float32
    base_channels: int = 32
    encoder_channels: tuple = (32, 64, 128, 256)
    decoder_channels: tuple = (256, 128, 96, 96)

    @nn.compact
    def __call__(self, plan, feats, train: bool = True):
        h = MinkUNetBackboneMM(
            base_channels=self.base_channels,
            encoder_channels=self.encoder_channels,
            decoder_channels=self.decoder_channels,
            dtype=self.dtype, layout=default_layout(),
            name="backbone")(plan, feats, train)
        h = h.astype(jnp.float32)
        valid = plan.levels[0].valid
        out = {
            "feats": h,
            "logits_lab": mask_rows(
                Prototypes(self.num_labeled, name="head_lab")(h), valid),
        }
        if self.num_heads is not None:
            out["logits_unlab"] = MultiHead(
                self.num_unlabeled, self.num_heads,
                name="head_unlab")(h) * valid[None, :, None]
            out["proj_feats_unlab"] = h
        if self.overcluster_factor is not None:
            out["logits_unlab_over"] = MultiHead(
                self.num_unlabeled * self.overcluster_factor, self.num_heads,
                name="head_unlab_over")(h) * valid[None, :, None]
            out["proj_feats_unlab_over"] = h
        return out
