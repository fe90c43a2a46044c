"""Stage-1 supervised pretraining (the reference's `ExpPretrain`).

One jitted train step: build plan -> MinkUNet forward -> masked CE over known
classes -> SGD(momentum, wd) with per-epoch warmup-cosine LR. Eval follows the
reference protocol (`modules/exp.py:277-334`): voxel predictions expanded to
points through the inverse map, known-voxel filtering, confusion matrix over
train-label ids, strict Hungarian at epoch end.

Note on the unknown slot: the reference's Stage-1 head has K outputs but its
'disjoint' loader keeps unknown-class points with target K
(`utils/dataset_remission.py:849-859`), which torch CE cannot train on; we
treat the unknown slot as ignore_index — the intended "supervised CE over K
known classes" behavior.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.minkunet import MinkUNetSeg
from ..losses import cross_entropy
from ..eval.metrics import confusion_update, strict_hungarian_iou
from .common import TrainState, make_sgd, plan_and_gather, inv_label_lut
from .schedule import make_lr_schedule


@dataclass(frozen=True)
class PretrainConfig:
    num_labeled_classes: int
    num_classes: int
    unknown_label: int
    voxel_caps: tuple
    arch: str = "MinkUNet34"
    planes: tuple = (32, 64, 128, 256, 256, 128, 96, 96)
    in_channels: int = 1
    dtype: str = "float32"  # activation dtype: "bfloat16" on TPU
    remat: bool = False
    head: str = "linear"  # "cosine" = ExpCosinePretrain (`exp.py:493-499`)
    lr: float = 1e-2
    momentum: float = 0.9
    weight_decay: float = 1e-4
    use_scheduler: bool = True
    warmup_epochs: int = 4
    min_lr: float = 1e-5
    epochs: int = 50
    steps_per_epoch: int = 1000


def make_model(cfg: PretrainConfig) -> MinkUNetSeg:
    return MinkUNetSeg(
        num_classes=cfg.num_labeled_classes, arch=cfg.arch, planes=cfg.planes,
        dtype=jnp.dtype(cfg.dtype), remat=cfg.remat, head=cfg.head,
    )


def create_pretrain_state(rng: jax.Array, cfg: PretrainConfig) -> TrainState:
    model = make_model(cfg)
    # params/opt-state shapes are capacity-independent: init with a tiny plan
    # (keeps the init program small — full-capacity init costs a second huge
    # XLA compile for nothing)
    cap0 = min(cfg.voxel_caps[0], 4096)
    caps = tuple(min(c, 4096) for c in cfg.voxel_caps)
    dummy_coords = np.zeros((cap0, 4), np.int32)
    dummy_coords[:, 1] = np.arange(cap0) % 97
    dummy_coords[:, 2] = np.arange(cap0) // 97
    dummy_valid = np.ones((cap0,), bool)
    from ..ops.plan import build_unet_plan

    tx = make_sgd(cfg, make_lr_schedule(cfg))

    # everything inside one jit: eager plan-building/init would dispatch
    # hundreds of ops one-by-one (pathological over a remote-TPU tunnel)
    @jax.jit
    def _init(rng, coords, valid):
        plan = build_unet_plan(coords, valid, caps, presorted=True)
        feats = jnp.zeros((cap0, cfg.in_channels), jnp.float32)
        variables = model.init(rng, plan, feats, train=False)
        return TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    return _init(rng, jnp.asarray(dummy_coords), jnp.asarray(dummy_valid))


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def pretrain_train_step(state: TrainState, batch: dict, cfg: PretrainConfig):
    model = make_model(cfg)
    tx = make_sgd(cfg, make_lr_schedule(cfg))
    plan, feats0, _, mapped0 = plan_and_gather(batch, cfg.voxel_caps)
    # unknown slot has no logit in Stage 1 -> ignore those targets
    targets = jnp.where(mapped0 == cfg.unknown_label, -1, mapped0)
    valid0 = plan.levels[0].valid

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            plan,
            feats0,
            train=True,
            mutable=["batch_stats"],
        )
        loss = cross_entropy(out["logits"], targets, valid0)
        return loss, mut

    (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    new_state = TrainState(
        params=params,
        batch_stats=mut["batch_stats"],
        opt_state=opt_state,
        step=state.step + 1,
    )
    from ..ops.plan import plan_capacity_overflow

    return new_state, {"loss": loss,
                       "plan_overflow": plan_capacity_overflow(plan)}


@partial(jax.jit, static_argnames=("cfg",))
def pretrain_eval_step(state: TrainState, batch: dict, points: dict,
                       inv_lut: jax.Array, cfg: PretrainConfig):
    """Returns (confusion increment [D,D], masked val loss, count)."""
    model = make_model(cfg)
    plan, feats0, _, mapped0 = plan_and_gather(batch, cfg.voxel_caps)
    valid0 = plan.levels[0].valid
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        plan,
        feats0,
        train=False,
    )
    logits = out["logits"]
    mask_lab = (mapped0 != cfg.unknown_label) & (mapped0 >= 0) & valid0
    loss = cross_entropy(logits, jnp.where(mask_lab, mapped0, -1), valid0)

    voxel_pred = jnp.argmax(logits, axis=-1)
    voxel_pred_raw = inv_lut[voxel_pred]  # -> train-label ids
    # expand to points through inverse map; original batch rows -> plan rows
    cap0 = batch["coords"].shape[0]
    row_of_input = plan.inverse  # input row -> plan row (cap0 if dropped)
    vrow = points["voxel_row"].reshape(-1)
    ok = vrow < cap0
    plan_row = jnp.where(ok, row_of_input[jnp.where(ok, vrow, 0)], cap0)
    ok = ok & (plan_row < cap0)
    safe_row = jnp.where(ok, plan_row, 0)
    point_pred = jnp.where(ok, voxel_pred_raw[safe_row], -1)
    point_known = jnp.where(ok, mask_lab[safe_row], False)
    point_labels = points["labels"].reshape(-1)
    pvalid = points["valid"].reshape(-1) & point_known
    conf = confusion_update(point_pred, point_labels, cfg.num_classes, pvalid)
    return conf, loss


class ExpPretrain:
    """Host-side orchestration for Stage-1 (dataset, epochs, eval, checkpoint).

    Mirrors the `ExpPretrain` LightningModule surface (`modules/exp.py:71-361`)
    with an explicit functional core.
    """

    def __init__(self, cfg: PretrainConfig, label_mapping: dict,
                 label_mapping_inv: dict, seed: int = 1234):
        self.cfg = cfg
        self.label_mapping = label_mapping
        self.label_mapping_inv = label_mapping_inv
        self.known_real_labels = [
            k for k, v in label_mapping.items() if v != cfg.unknown_label
        ]
        self.unknown_real_labels = [
            k for k, v in label_mapping.items() if v == cfg.unknown_label
        ]
        self.inv_lut = jnp.asarray(
            inv_label_lut(label_mapping_inv, cfg.num_labeled_classes)
        )
        self.state = create_pretrain_state(jax.random.PRNGKey(seed), cfg)

    def train_epoch(self, loader):
        losses = []
        for batch in loader:
            from .common import voxel_batch_to_device

            vb = voxel_batch_to_device(batch["voxel"])
            self.state, metrics = pretrain_train_step(self.state, vb, self.cfg)
            losses.append(metrics["loss"])
        return float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

    def validate(self, loader):
        from .common import voxel_batch_to_device, point_batch_to_device

        conf = np.zeros((self.cfg.num_classes, self.cfg.num_classes), np.int64)
        losses = []
        for batch in loader:
            vb = voxel_batch_to_device(batch["voxel"])
            pb = point_batch_to_device(batch["points"])
            c, loss = pretrain_eval_step(self.state, vb, pb, self.inv_lut, self.cfg)
            conf += np.asarray(c, np.int64)
            losses.append(float(loss))
        iou, include = strict_hungarian_iou(conf, self.cfg.num_classes)
        miou = float(iou.mean())
        miou_old = float(iou[self.known_real_labels].mean())
        return {
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "mIoU": miou,
            "mIoU_old": miou_old,
            "iou": iou,
            "conf": conf,
        }
