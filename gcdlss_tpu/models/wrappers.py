"""Model-wrapper zoo: NOPS-style multi-head, fine-tune, SSL, cosine variants.

Functional rebuilds of the remaining reference wrappers
(`models/multiheadminkunet.py:121-629`, `models/multiheadminkunet_nops.py:80-197`):
  * MultiHeadMinkUnet     — backbone + labeled prototypes + N unlabeled heads
                            (+ overclustering heads), the NOPS discovery model;
  * MultiHeadMinkUnetFineTune — backbone + linear head over all classes;
  * MultiHeadSelfSupMinkUnet  — backbone + projection MLP for SSL pretraining
                            (SimGCD-style normalized-logit option);
  * DualMinkUnet          — two backbones sharing an input (teacher/student
                            pairs with independent weights);
  * Cosine variants       — NormedLinear heads (MinkUNetBaseCosine/RCCosine,
                            `multiheadminkunet.py:458-522`).
All operate on (plan, feats) like the core models.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .minkunet import MinkUNetBackbone, DEFAULT_PLANES
from .layers import NormedLinear, mask_rows
from .heads import Prototypes, MultiHead, ProjectionHead


class MultiHeadMinkUnet(nn.Module):
    """NOPS discovery model: prototypes for labeled classes + multi-head
    (optionally overclustered) prototypes for novel classes."""

    num_labeled: int
    num_unlabeled: int
    num_heads: int = 1
    overcluster_factor: int | None = None
    arch: str = "MinkUNet34"
    planes: tuple = DEFAULT_PLANES
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, plan, feats, train: bool = True):
        h = MinkUNetBackbone(self.arch, self.planes, dtype=self.dtype,
                             name="encoder")(plan, feats, train)
        h = h.astype(jnp.float32)
        valid = plan.levels[0].valid
        out = {
            "feats": h,
            "logits_lab": mask_rows(Prototypes(self.num_labeled, name="head_lab")(h), valid),
        }
        if self.num_heads:
            out["logits_unlab"] = MultiHead(
                self.num_unlabeled, self.num_heads, name="head_unlab"
            )(h)
        if self.overcluster_factor:
            out["logits_unlab_over"] = MultiHead(
                self.num_unlabeled * self.overcluster_factor,
                self.num_heads,
                name="head_unlab_over",
            )(h)
        return out


class MultiHeadMinkUnetFineTune(nn.Module):
    num_labeled: int
    num_classes: int
    arch: str = "MinkUNet34"
    planes: tuple = DEFAULT_PLANES

    @nn.compact
    def __call__(self, plan, feats, train: bool = True):
        h = MinkUNetBackbone(self.arch, self.planes, name="encoder")(plan, feats, train)
        valid = plan.levels[0].valid
        return {
            "feats": h,
            "logits_lab": mask_rows(
                nn.Dense(self.num_classes, name="head_lab2")(h), valid
            ),
        }


class MultiHeadSelfSupMinkUnet(nn.Module):
    """SSL wrapper: 128-dim projection target + metric-learning MLP.

    `simgcd=True` row-normalizes features before the final head
    (`multiheadminkunet.py:585-590`).
    """

    out_dim: int = 128
    simgcd: bool = False
    arch: str = "MinkUNet34"
    planes: tuple = DEFAULT_PLANES

    @nn.compact
    def __call__(self, plan, feats, train: bool = True):
        h = MinkUNetBackbone(self.arch, self.planes, name="backbone")(plan, feats, train)
        valid = plan.levels[0].valid
        proj = ProjectionHead(name="metric_learner")(h)
        hh = h
        if self.simgcd:
            hh = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
        logits = nn.Dense(self.out_dim, name="final")(hh)
        return {
            "feats": h,
            "proj_feats": proj,
            "logits": mask_rows(logits, valid),
        }


class DualMinkUnet(nn.Module):
    """Two independent backbones over one input (NOPS DualMinkUnet,
    `multiheadminkunet_nops.py:145-197`)."""

    num_labeled: int
    num_unlabeled: int
    arch: str = "MinkUNet34"
    planes: tuple = DEFAULT_PLANES

    @nn.compact
    def __call__(self, plan, feats, train: bool = True):
        valid = plan.levels[0].valid
        ha = MinkUNetBackbone(self.arch, self.planes, name="encoder_a")(plan, feats, train)
        hb = MinkUNetBackbone(self.arch, self.planes, name="encoder_b")(plan, feats, train)
        return {
            "feats_a": ha,
            "feats_b": hb,
            "logits_lab": mask_rows(Prototypes(self.num_labeled, name="head_lab")(ha), valid),
            "logits_unlab": mask_rows(
                Prototypes(self.num_unlabeled, name="head_unlab")(hb), valid
            ),
        }


class MinkUNetSegCosine(nn.Module):
    """Cosine-classifier segmentation model (MinkUNetBaseCosine)."""

    num_classes: int
    arch: str = "MinkUNet34"
    planes: tuple = DEFAULT_PLANES

    @nn.compact
    def __call__(self, plan, feats, train: bool = True):
        h = MinkUNetBackbone(self.arch, self.planes, name="encoder")(plan, feats, train)
        valid = plan.levels[0].valid
        return {
            "feats": h,
            "logits": mask_rows(NormedLinear(self.num_classes, name="final")(h), valid),
        }
