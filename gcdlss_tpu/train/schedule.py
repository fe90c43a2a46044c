"""Learning-rate schedules.

`warmup_cosine_lr` is the closed form of the lightning-bolts
LinearWarmupCosineAnnealingLR the reference steps once per epoch
(`utils/scheduler.py:105-119`, wired at `modules/exp.py:163-172`): linear from
`warmup_start_lr` to `base_lr` over `warmup_epochs` (epoch 0 starts at
warmup_start_lr), then cosine to `eta_min` at `max_epochs`.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_lr(
    epoch,
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
):
    epoch = jnp.asarray(epoch, jnp.float32)
    denom = max(warmup_epochs - 1, 1)
    warm = warmup_start_lr + epoch * (base_lr - warmup_start_lr) / denom
    span = max(max_epochs - warmup_epochs, 1)
    cos = eta_min + 0.5 * (base_lr - eta_min) * (
        1.0 + jnp.cos(jnp.pi * (epoch - warmup_epochs) / span)
    )
    return jnp.where(epoch < warmup_epochs, warm, cos)


def make_lr_schedule(cfg):
    """step -> lr, stepping per *epoch* like the reference (PL default)."""

    def schedule(step):
        epoch = step // max(cfg.steps_per_epoch, 1)
        if not cfg.use_scheduler:
            return jnp.asarray(cfg.lr, jnp.float32)
        return warmup_cosine_lr(
            epoch,
            cfg.lr,
            cfg.warmup_epochs,
            cfg.epochs,
            warmup_start_lr=cfg.min_lr,
            eta_min=cfg.min_lr,
        )

    return schedule
