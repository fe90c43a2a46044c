"""Experiment-module registry: reference module names -> config recipes.

Maps every runnable reference experiment class (SURVEY §2.1) onto this
framework's config system. The exported modules are first-class; the
ablation/threshold/assigner families are config switches on the same jitted
Stage-2 step.
"""

from __future__ import annotations

# name -> (stage, DiscoverConfig overrides)
MODULE_REGISTRY: dict = {
    # ---- exported (modules/__init__.py) ----
    "ExpPretrain": ("pretrain", {}),
    "ExpMergeDiscover_LaserMix_MeanTeacher_NCCAdaptive": (
        "discover", dict(threshold_mode="adaptive_logit", alpha=5)
    ),
    # ---- parents / threshold ablations (exp_merge_mean_teacher.py) ----
    "ExpMergeDiscover_LaserMix_MeanTeacher": (
        "discover", dict(threshold_mode="fixed_prob", alpha=3)
    ),
    "ExpMergeDiscover_LaserMix_MeanTeacher_HybridAdaptive": (
        "discover", dict(threshold_mode="hybrid", tau_init=-1.4, alpha=5)
    ),
    "ExpMergeDiscover_LaserMix_MeanTeacher_Oracle_threshold": (
        "discover", dict(threshold_mode="oracle_logit", alpha=5)
    ),
    "ExpMergeDiscover_LaserMix_MeanTeacher_MSP_threshold": (
        "discover", dict(threshold_mode="msp", alpha=5)
    ),
    # ---- PolarMix mean-teacher (grandparent; the reference class is dead
    #      code — `exp_merge_mean_teacher.py:672,729` use a never-created
    #      `self.model` — rebuilt from its spec: dataset-side PolarMix on
    #      labeled scans + labeled feature-pair mixing, no LaserMix) ----
    "ExpMergeDiscover_PolarMix_MeanTeacher": (
        "discover",
        dict(mix_mode="feature", threshold_mode="fixed_prob", alpha=3),
    ),
    # ---- Sinkhorn-Knopp assignment family (exp.py:3290+) ----
    "ExpMixRealMeanTeacherDiscover": (
        "discover", dict(assigner="sinkhorn", threshold_mode="fixed_prob")
    ),
    # ---- LiON energy-OOD variant ----
    "ExpMergeDiscover_LaserMix_LiON_MeanTeacher": (
        "discover", dict(threshold_mode="fixed_prob", use_lion=True, alpha=3)
    ),
    # ---- NOPS-style single-model discovery (exp.py:5050, 4452, 4680) ----
    "ExpDiscover": ("nops", {}),
    "ExpMixDiscoverJoint": (
        "nops",
        dict(joint_logits=True, use_mix_features=True, novel_coeff=0.002),
    ),
    "ExpMixDiscoverSwaV": ("nops_swav", {}),
    # ---- ExpMixDiscover (`exp.py:3587-3990`): single-model discovery on
    #      the finetune-extra chassis — centroid feature mixing (sup +
    #      unsup), fixed prob threshold 0.2, sklearn-style euclidean
    #      k-means over Ku+1 clusters dropping the one closest to the base
    #      prototypes, mean-feature queue, entropy minimization (KITTI) ----
    "ExpMixDiscover": (
        "nops",
        dict(use_mix_features=True, mix_centroid=True, unsup_mix_coeff=0.1,
             entropy_minimize=True),
    ),
    # ---- Stage 1.5 + mixing/scheduling ablation family (exp.py) ----
    "ExpFineTuning": ("finetune", {}),
    "ExpMixFineTuning": ("finetune", dict(mix_mode="pairs")),
    "ExpMixRealAugFineTuning": ("finetune", dict(mix_mode="pairs")),  # + resize_aug data
    "ExpBetaSchedulingFineTuning": (
        "finetune", dict(mix_mode="centroid", mix_schedule="linear")
    ),
    "ExpMixExtraFineTuning": (
        "finetune_extra",
        dict(mix_mode="pairs", entropy_minimize=True),
    ),
    "ExpMixRealAugExtraFineTuning": (
        "finetune_extra", dict(mix_mode="pairs", entropy_minimize=True)
    ),
    "ExpMixExtraStepSchedulingFineTuning": (
        "finetune_extra",
        dict(mix_mode="pairs", entropy_minimize=True, thr_schedule="step"),
    ),
    "ExpMixExtraPolySchedulingFineTuning": (
        "finetune_extra",
        dict(mix_mode="pairs", entropy_minimize=True, thr_schedule="poly"),
    ),
    "ExpMixExtraLinearSchedulingFineTuning": (
        "finetune_extra",
        dict(mix_mode="pairs", entropy_minimize=True, thr_schedule="linear"),
    ),
    # ---- unlabeled-scan uncertainty ranking (exp.py:2799) ----
    "ExpUncertaintyCheck": ("uncertainty", {}),
    # ---- cosine-classifier variants (exp.py:493, 1758) ----
    "ExpCosinePretrain": ("pretrain", dict(head="cosine")),
    "ExpMixCosineFineTuning": (
        "finetune", dict(mix_mode="pairs", head="cosine")
    ),
    # ---- RC-extra with stored-unlabeled-GT novel rows (exp.py:975-1112) ----
    "ExpRCExtra": (
        "finetune_extra",
        dict(extra_mode="rc_oracle", unsup_coeff=0.2, calib_coeff=0.01,
             thr_init=0.21, thr_schedule="const"),
    ),
    # ---- DBSCAN+kmeans pseudo-unknown mining (exp.py:1123-1306) ----
    "ExpClusterFineTuning": (
        "finetune_extra", dict(extra_mode="cluster", unsup_coeff=0.1)
    ),
    # ---- test-only threshold sweeps (exp.py:3000-3290) ----
    "ExpRCTest": ("finetune_test", dict(mix_mode="pairs")),
    "ExpMixExtraTest": (
        "finetune_test",
        dict(mix_mode="pairs", entropy_minimize=True, subdivide_novel=True),
    ),
}


def resolve_module(name: str):
    if name in MODULE_REGISTRY:
        return MODULE_REGISTRY[name]
    # substring dispatch like the reference CLI (`main.py:172-293`)
    if "Merge" in name or "Discover" in name:
        return ("discover", {})
    if "FineTuning" in name:
        return ("finetune", {})
    if "Pretrain" in name:
        return ("pretrain", {})
    raise NameError(f"Unknown module {name}")
