"""Host-side experiment modules: the user-facing training loops.

These mirror the reference's exported LightningModules (`modules/__init__.py`):
  * `ExpPretrain` lives in `pretrain.py`;
  * `ExpMergeDiscoverLaserMixMeanTeacherNCCAdaptive` (Stage 2, "Ours") here —
    dual labeled/unlabeled loaders at batch_size//2 each
    (`exp_merge_mean_teacher.py:1492-1551`), per-epoch validation with the
    discovery mIoU protocol, orbax checkpointing of the full jitted state;
  * fixed-threshold and PolarMix variants are config switches
    (`threshold_mode="fixed_prob"`; `mixing="polarmix"`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.collation import collate_batch
from ..data.loader import PrefetchLoader
from ..eval.metrics import discovery_iou
from .common import (
    voxel_batch_to_device,
    point_batch_to_device,
    inv_label_lut,
)
from .discover import (
    DiscoverConfig,
    create_discover_state,
    discover_train_step,
    discover_eval_step,
)


class ExpMergeDiscoverLaserMixMeanTeacherNCCAdaptive:
    """Stage-2 generalized class discovery (mean teacher + LaserMix + NCC).

    API mirror of the reference module: construct with label mappings, call
    `fit(lab_dataset, unlab_dataset, val_dataset, epochs)`, `validate(...)`.
    """

    def __init__(
        self,
        cfg: DiscoverConfig,
        label_mapping: dict,
        label_mapping_inv: dict,
        pretrained_params=None,
        seed: int = 1234,
        logger=None,
        checkpoint_manager=None,
        label_dict: dict | None = None,
    ):
        self.cfg = cfg
        # train-label id -> class name (for per-class IoU logs,
        # `exp_merge_mean_teacher.py:2391-2393`)
        self.label_dict = label_dict or {}
        self.label_mapping = label_mapping
        self.label_mapping_inv = label_mapping_inv
        self.known_real_labels = [
            k for k, v in label_mapping.items() if v != cfg.unknown_label
        ]
        self.unknown_real_labels = [
            k for k, v in label_mapping.items() if v == cfg.unknown_label
        ]
        # extend the inverse map: novel slot i -> i-th unknown real label
        # (`exp_merge_mean_teacher.py:2260-2261`)
        extra = {
            cfg.unknown_label + i: self.unknown_real_labels[i]
            for i in range(len(self.unknown_real_labels))
        }
        self.inv_lut = jnp.asarray(
            inv_label_lut(
                label_mapping_inv,
                cfg.num_labeled_classes + cfg.num_unlabeled_classes,
                extra,
            )
        )
        self.logger = logger
        self.ckpt = checkpoint_manager
        self.state = create_discover_state(
            jax.random.PRNGKey(seed), cfg, pretrained_params
        )

    # ------------------------------------------------------------- training
    def make_loaders(self, lab_dataset, unlab_dataset, num_workers: int = 4):
        cfg = self.cfg
        unsup_cap = cfg.voxel_caps[0] - cfg.sup_voxel_cap
        lab = PrefetchLoader(
            lab_dataset, cfg.num_sup_scans, cfg.sup_voxel_cap,
            point_cap=cfg.point_cap, num_workers=num_workers, seed=11,
        )
        unlab = PrefetchLoader(
            unlab_dataset, cfg.num_sup_scans, unsup_cap,
            point_cap=cfg.point_cap, num_workers=num_workers, seed=13,
        )
        return lab, unlab

    def train_epoch(self, lab_loader, unlab_loader):
        metrics_acc = []
        for sup_batch, unsup_batch in zip(lab_loader, unlab_loader):
            m = self.train_step(sup_batch, unsup_batch)
            metrics_acc.append({k: float(np.asarray(v)) for k, v in m.items()})
        if not metrics_acc:
            return {}
        return {
            k: float(np.mean([m[k] for m in metrics_acc])) for k in metrics_acc[0]
        }

    def train_step(self, sup_batch, unsup_batch):
        self.state, metrics = discover_train_step(
            self.state,
            voxel_batch_to_device(sup_batch["voxel"]),
            point_batch_to_device(sup_batch["points"]),
            voxel_batch_to_device(unsup_batch["voxel"]),
            point_batch_to_device(unsup_batch["points"]),
            self.cfg,
        )
        return metrics

    # ------------------------------------------------------------ validation
    def validate(self, val_dataset, num_workers: int = 4, point_cap: int | None = None):
        cfg = self.cfg
        loader = PrefetchLoader(
            val_dataset, cfg.num_sup_scans * 2, cfg.voxel_caps[0],
            point_cap=point_cap or cfg.point_cap * 2, shuffle=False,
            num_workers=num_workers, drop_last=False,
        )
        conf = np.zeros((cfg.num_classes, cfg.num_classes), np.int64)
        for batch in loader:
            c = discover_eval_step(
                self.state,
                voxel_batch_to_device(batch["voxel"]),
                point_batch_to_device(batch["points"]),
                self.inv_lut,
                cfg,
            )
            conf += np.asarray(c, np.int64)
        iou, miou, miou_old, miou_new = discovery_iou(
            conf, self.known_real_labels, self.unknown_real_labels, cfg.num_classes
        )
        out = {
            "mIoU": miou,
            "mIoU_old": miou_old,
            "mIoU_new": miou_new,
            "iou": iou,
            "conf": conf,
        }
        if self.label_dict:
            for cid, name in self.label_dict.items():
                if 0 <= cid < len(iou):
                    out[f"IoU/{name}"] = float(iou[cid])
        return out

    # ------------------------------------------------------------------ test
    def test(self, val_dataset, num_workers: int = 4, visualize: bool = False,
             save_dir: str | None = None, confusion_png: str | None = None):
        """Test protocol (`exp_merge_mean_teacher.py:2412-2560`): discovery
        validation + optional PLY dumps of predictions/GT and a
        confusion-matrix PNG."""
        result = self.validate(val_dataset, num_workers)
        if visualize and save_dir:
            import os

            from ..utils.visualize import get_color, write_ply
            from ..data.collation import collate_batch
            from .common import voxel_batch_to_device, point_batch_to_device
            import numpy as np_

            os.makedirs(save_dir, exist_ok=True)
            cfg = self.cfg
            for i in range(min(len(val_dataset), 4)):
                s = val_dataset[i]
                batch = collate_batch([s], cfg.voxel_caps[0], point_cap=cfg.point_cap)
                # voxel predictions from the teacher
                import jax.numpy as jnp_

                vb = voxel_batch_to_device(batch["voxel"])
                from .discover import make_model
                from ..ops.plan import build_unet_plan
                from ..models.minkunet import assemble_novel_logits

                plan = build_unet_plan(vb["coords"], vb["valid"], cfg.voxel_caps,
                                       presorted=True)
                ok = plan.rep < vb["coords"].shape[0]
                safe = jnp_.where(ok, plan.rep, 0)
                feats0 = vb["feats"][safe] * ok[:, None].astype(vb["feats"].dtype)
                out = make_model(cfg).apply(
                    {"params": self.state.params_t,
                     "batch_stats": self.state.batch_stats_t},
                    plan, feats0, train=False,
                )
                logits = assemble_novel_logits(out)
                preds = np_.asarray(
                    self.inv_lut[jnp_.argmax(logits[:, :-1], axis=-1)]
                )
                coords = np_.asarray(plan.levels[0].coords)[:, 1:]
                valid = np_.asarray(plan.levels[0].valid)
                labels = np_.asarray(vb["labels"])[np_.asarray(safe)]
                name = os.path.join(save_dir, f"{s.scan_idx:06d}")
                write_ply(name + "-gt.ply",
                          [coords[valid].astype(np_.float32),
                           get_color(labels[valid])],
                          ["x", "y", "z", "red", "green", "blue"])
                write_ply(name + "-pd.ply",
                          [coords[valid].astype(np_.float32),
                           get_color(preds[valid])],
                          ["x", "y", "z", "red", "green", "blue"])
        if confusion_png:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(12, 12))
            ax.imshow(result["conf"], cmap="Blues")
            ax.set_xlabel("True Label")
            ax.set_ylabel("Predicted Label")
            ax.set_title("Confusion Matrix")
            fig.tight_layout()
            fig.savefig(confusion_png, dpi=120)
            plt.close(fig)
        return result

    # ------------------------------------------------------------------ fit
    def fit(self, lab_dataset, unlab_dataset, val_dataset=None, epochs: int = 1,
            num_workers: int = 4, validate_every: int = 1):
        history = []
        lab_loader, unlab_loader = self.make_loaders(
            lab_dataset, unlab_dataset, num_workers
        )
        for epoch in range(epochs):
            tm = self.train_epoch(lab_loader, unlab_loader)
            rec = {"epoch": epoch, **{f"train/{k}": v for k, v in tm.items()}}
            if val_dataset is not None and (epoch + 1) % validate_every == 0:
                vm = self.validate(val_dataset, num_workers)
                rec.update({f"valid/{k}": v for k, v in vm.items() if k not in ("iou", "conf")})
            history.append(rec)
            if self.logger is not None:
                self.logger.log_dict(
                    {k: v for k, v in rec.items() if isinstance(v, float)}, epoch
                )
            if self.ckpt is not None:
                self.ckpt.save(int(self.state.step), self.state)
        return history


# Reference-compatible aliases for the exported module names
ExpMergeDiscover_LaserMix_MeanTeacher_NCCAdaptive = (
    ExpMergeDiscoverLaserMixMeanTeacherNCCAdaptive
)
