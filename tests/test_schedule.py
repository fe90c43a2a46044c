"""Warmup-cosine schedule golden test vs the torch implementation the
reference copies from lightning-bolts (utils/scheduler.py closed form)."""

import pytest
import math

import numpy as np

from gcdlss_tpu.train.schedule import warmup_cosine_lr

pytestmark = pytest.mark.smoke


def _torch_closed_form(epoch, base_lr, warmup_epochs, max_epochs,
                       warmup_start_lr, eta_min):
    if epoch < warmup_epochs:
        return warmup_start_lr + epoch * (base_lr - warmup_start_lr) / (
            warmup_epochs - 1
        )
    return eta_min + 0.5 * (base_lr - eta_min) * (
        1 + math.cos(math.pi * (epoch - warmup_epochs) / (max_epochs - warmup_epochs))
    )


def test_warmup_cosine_matches_reference_closed_form():
    base, wu, mx, ws, em = 1e-2, 4, 50, 1e-5, 1e-5
    for e in range(0, 50):
        ours = float(warmup_cosine_lr(e, base, wu, mx, ws, em))
        ref = _torch_closed_form(e, base, wu, mx, ws, em)
        assert abs(ours - ref) < 1e-7, e  # f32 cos
    # epoch 0 starts at warmup_start_lr; warmup end hits base lr
    assert abs(float(warmup_cosine_lr(0, base, wu, mx, ws, em)) - ws) < 1e-12
    assert abs(float(warmup_cosine_lr(wu, base, wu, mx, ws, em)) - base) < 1e-7
