"""Unified typed configuration.

The reference scatters hyperparameters across argparse (`main.py:18-59`),
per-dataset YAML (`config/*.yaml`), and hard-coded per-dataset `__init__`
branches (`exp_merge_mean_teacher.py:1454-1488`); `config/config.yaml` exists
but is never read (SURVEY §5.6 quirk). Here everything funnels into one
dataclass tree, YAML-loadable with the same field names, with the per-dataset
coefficient defaults applied automatically.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import yaml

from .data.labels import split_table, build_label_mapping
from .data.meta import dataset_meta
from .train.common import default_caps


@dataclass
class ExperimentConfig:
    # dataset
    dataset: str = "SemanticKITTI"
    dataset_path: str = ""
    split: int = 1
    voxel_size: float = 0.05
    downsampling: int = 80000
    batch_size: int = 4
    num_workers: int = 8
    loader_backend: str = "thread"  # or "process" (forked workers, GIL-free)
    # capacities (static shapes); 0 -> derived from downsampling * batch
    voxel_cap: int = 0
    point_cap: int = 0
    # model
    arch: str = "MinkUNet34"
    # optimizer
    train_lr: float = 1e-2
    finetune_lr: float = 1e-4
    momentum_for_optim: float = 0.9
    weight_decay_for_optim: float = 1e-4
    use_scheduler: bool = False
    warmup_epochs: int = 4
    min_lr: float = 1e-5
    epochs: int = 50
    # run
    module: str = "ExpPretrain"
    experiment: str = "exp"
    log_dir: str = "logs"
    checkpoint_dir: str = "checkpoints"
    pretrained: str | None = None
    resume_checkpoint: str | None = None
    checkpoint: str | None = None
    seed: int = 1234
    debug: bool = False
    test: bool = False
    visualize: bool = False
    split_dir: str = "split_npy"

    def resolved_caps(self):
        per_scan = self.downsampling if self.downsampling > 0 else 120_000
        cap0 = self.voxel_cap or -(-(per_scan * self.batch_size) // 2048) * 2048
        return default_caps(cap0)

    def label_space(self):
        meta = dataset_meta(self.dataset)
        unknown_labels, ratio = split_table(self.dataset, self.split)
        mapping, inv, unknown_label = build_label_mapping(
            unknown_labels, meta["learning_map_inv"].keys()
        )
        num_classes = len({k for k in mapping})
        return {
            "meta": meta,
            "unknown_labels": unknown_labels,
            "labeled_ratio": ratio,
            "label_mapping": mapping,
            "label_mapping_inv": inv,
            "unknown_label": unknown_label,
            "num_classes": len(mapping),
            "num_unlabeled_classes": len(unknown_labels),
            "num_labeled_classes": len(mapping) - len(unknown_labels),
        }


def load_config(path: str | None = None, **overrides) -> ExperimentConfig:
    data: dict = {}
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    known = {f.name for f in dataclasses.fields(ExperimentConfig)}
    merged = {k: v for k, v in {**data, **overrides}.items() if k in known}
    return ExperimentConfig(**merged)
