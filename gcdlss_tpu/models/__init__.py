from .layers import SparseConv, SparseDownConv, SparseUpConv, SparseBatchNorm, NormedLinear
from .minkunet import (
    MinkUNetBackbone,
    MinkUNetSeg,
    MinkUNetRC,
    ARCHS,
    PLANE_VARIANTS,
    assemble_dummy_logits,
    assemble_dummy_logits_mean,
    assemble_dummy_logits_sum,
    assemble_novel_logits,
)
from .heads import Prototypes, CosinePrototypes, ProjectionHead, MultiHead, EquiangularPrototypes
from .orca import MinkUnetToy18, MinkUnet34ORCA
from .backbone_mm import MinkUNetBackboneMM, MultiHeadMinkUnet18

__all__ = [
    "SparseConv",
    "SparseDownConv",
    "SparseUpConv",
    "SparseBatchNorm",
    "NormedLinear",
    "MinkUNetBackbone",
    "MinkUNetSeg",
    "MinkUNetRC",
    "ARCHS",
    "PLANE_VARIANTS",
    "assemble_dummy_logits",
    "assemble_dummy_logits_mean",
    "assemble_dummy_logits_sum",
    "assemble_novel_logits",
    "Prototypes",
    "CosinePrototypes",
    "ProjectionHead",
    "MultiHead",
    "EquiangularPrototypes",
]
