"""ORCA-legacy models: backbone + single prototype / cosine head.

Rebuilds reference `models/minkunet_orca.py` (the live classes only — more
than half of that file is commented-out dead code):

* ``MinkUnetToy18`` (`minkunet_orca.py:49-84`): MinkUNet18A encoder with the
  final layer replaced by identity, plus a linear ``Prototypes`` head over
  the 96-d features.
* ``MinkUnet34ORCA`` (`minkunet_orca.py:87-121`, class name ``MinkUnet34``
  there; suffixed here to avoid clashing with the arch name): MinkUNet34C
  encoder plus the 10x-scaled cosine ``NormedLinear`` head
  (`minkunet_orca.py:23-31`).

Both reference classes accept either one sparse tensor or a list of views
(stacking per-view outputs). Views here are just separate (plan, feats)
pairs — callers vmap/stack at the call site, so the modules take a single
(plan, feats) like every other model in this package.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .minkunet import MinkUNetBackbone, PLANE_VARIANTS
from .layers import NormedLinear, mask_rows
from .heads import Prototypes


class MinkUnetToy18(nn.Module):
    """MinkUNet18A encoder + linear Prototypes head (`minkunet_orca.py:49`)."""

    num_classes: int
    arch: str = "MinkUNet18"
    planes: tuple = PLANE_VARIANTS["A18"]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, plan, feats, train: bool = True):
        h = MinkUNetBackbone(self.arch, self.planes,
                             dtype=self.dtype, name="encoder")(
            plan, feats, train)
        h = h.astype(jnp.float32)
        valid = plan.levels[0].valid
        return {
            "logits": mask_rows(
                Prototypes(self.num_classes, name="head_lab")(h), valid),
            "feats": h,
        }


class MinkUnet34ORCA(nn.Module):
    """MinkUNet34C encoder + NormedLinear cosine head (`minkunet_orca.py:87`)."""

    num_classes: int
    arch: str = "MinkUNet34"
    planes: tuple = PLANE_VARIANTS["C34"]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, plan, feats, train: bool = True):
        h = MinkUNetBackbone(self.arch, self.planes,
                             dtype=self.dtype, name="encoder")(
            plan, feats, train)
        h = h.astype(jnp.float32)
        valid = plan.levels[0].valid
        return {
            "logits": mask_rows(
                NormedLinear(self.num_classes, name="linear")(h), valid),
            "feats": h,
        }
