"""Stage-1.5 fine-tuning: attach + train the NCC head (`ExpFineTuning`).

Rebuild of `modules/exp.py:505-687`: MinkUNetRC dummy logits (K known +
max-NCC column), CE with uniform class weights (== unweighted mean) +
calibration loss towards the unknown slot (coefficient 0.05 KITTI / 0.15
nuScenes), SGD at `finetune_lr` over the warm-started encoder, REAL-aug
labeled data ('finetuning' dataset type).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..models.minkunet import MinkUNetRC, assemble_dummy_logits
from ..losses import cross_entropy, calibration_loss
from .common import TrainState, make_sgd, plan_and_gather
from .schedule import make_lr_schedule


@dataclass(frozen=True)
class FineTuneConfig:
    num_labeled_classes: int
    num_classes: int
    unknown_label: int
    voxel_caps: tuple
    arch: str = "MinkUNet34"
    planes: tuple = (32, 64, 128, 256, 256, 128, 96, 96)
    in_channels: int = 1
    dtype: str = "float32"
    remat: bool = False
    ncc_heads: int = 3
    calib_coeff: float = 0.05  # 0.15 for nuScenes (`exp.py:542-546`)
    lr: float = 1e-4  # finetune_lr
    momentum: float = 0.9
    weight_decay: float = 1e-4
    use_scheduler: bool = True
    warmup_epochs: int = 4
    min_lr: float = 1e-5
    epochs: int = 50
    steps_per_epoch: int = 1000


def make_model(cfg: FineTuneConfig) -> MinkUNetRC:
    return MinkUNetRC(
        num_labeled=cfg.num_labeled_classes,
        num_novel=1,  # final3 unused at this stage but present for shape parity
        ncc_heads=cfg.ncc_heads,
        arch=cfg.arch,
        planes=cfg.planes,
        dtype=jnp.dtype(cfg.dtype),
        remat=cfg.remat,
    )


def create_finetune_state(rng, cfg: FineTuneConfig,
                          pretrained_params=None) -> TrainState:
    import numpy as np
    from ..ops.plan import build_unet_plan

    model = make_model(cfg)
    cap0 = min(cfg.voxel_caps[0], 4096)
    caps = tuple(min(c, 4096) for c in cfg.voxel_caps)
    coords = np.zeros((cap0, 4), np.int32)
    coords[:, 1] = np.arange(cap0) % 89
    coords[:, 2] = np.arange(cap0) // 89
    tx = make_sgd(cfg, make_lr_schedule(cfg))

    @jax.jit
    def _init(rng, coords):
        plan = build_unet_plan(coords, jnp.ones((cap0,), bool), caps)
        feats = jnp.zeros((cap0, cfg.in_channels), jnp.float32)
        variables = model.init(rng, plan, feats, train=False)
        params = variables["params"]
        if pretrained_params is not None:
            params = dict(params)
            for key in ("encoder", "final"):
                if key in pretrained_params:
                    params[key] = pretrained_params[key]
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    return _init(rng, jnp.asarray(coords))


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def finetune_train_step(state: TrainState, batch: dict, cfg: FineTuneConfig):
    model = make_model(cfg)
    tx = make_sgd(cfg, make_lr_schedule(cfg))
    plan, feats0, _, mapped0 = plan_and_gather(batch, cfg.voxel_caps)
    valid0 = plan.levels[0].valid
    targets = jnp.where(valid0, mapped0, -1)

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            plan, feats0, train=True, mutable=["batch_stats"],
        )
        logits = assemble_dummy_logits(out)  # [N, K+1]
        seg = cross_entropy(logits, targets, valid0)
        calib = cfg.calib_coeff * calibration_loss(
            logits, targets, cfg.unknown_label, valid0
        )
        return seg + calib, (mut, {"seg": seg, "calib": calib})

    (loss, (mut, parts)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    new_state = TrainState(
        params=params, batch_stats=mut["batch_stats"],
        opt_state=opt_state, step=state.step + 1,
    )
    return new_state, {"loss": loss, **parts}
