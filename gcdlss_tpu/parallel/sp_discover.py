"""Voxel-sharded (SP) Stage-2 discovery step.

Runs the three expensive backbone passes of the discovery step — teacher
forward, student forward, student mixed forward (~75% of the measured
step, BENCH.md mega7 profile) — inside `jax.shard_map` over an `sp` mesh
axis with ring halo exchange (`parallel.voxel_shard`), while every loss,
mining, k-means, Hungarian, queue, and EMA term stays the single tested
implementation in `train.discover._discover_step_impl`: those operate on
the shard_map outputs at jit level, where XLA GSPMD partitions them and
inserts the (cheap, [N]-row-scalar) collectives.

This extends the sequence-parallel mode beyond Stage-1: one scan's voxel
set spans chips in the flagship discovery workload the reference runs
only data-parallel (`/root/reference/main.py:163`, SURVEY §2.5).

Halo sizing: the combined sup+unsup plan is batch-shaped like Stage-1
(size from `sp_step.backbone_halos` on a representative plan). The
LaserMix plan is built IN-step (depends on teacher pseudo-labels and the
step rng), so `probe_mix_plan` runs one un-jitted step with a capturing
hook to obtain a representative mixed plan for sizing; the per-layer
`sp_overflow` counters (surfaced in the step metrics) must read 0 — a
too-small halo is detected, never silently wrong.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..train.discover import (
    DiscoverConfig,
    DiscoverState,
    _discover_step_impl,
    make_model,
)
from .sp_step import plan_pspec


def probe_mix_plan(cfg: DiscoverConfig, state: DiscoverState,
                   sup_vb: dict, sup_pb: dict,
                   unsup_vb: dict, unsup_pb: dict):
    """Capture the in-step LaserMix plan by running ONE un-jitted step with
    a recording hook (eager, so the traced value is concrete). Use it with
    `sp_step.backbone_halos` to size the mixed-forward halos; the halos'
    margin plus the step's sp_overflow metric cover step-to-step variation.
    """
    captured = []
    model = make_model(cfg)

    class _Captured(Exception):
        pass

    def apply(params, batch_stats, plan, feats, kind):
        if kind == "mix":
            # mix_plan is computed eagerly before the student grad trace, so
            # it is concrete here; abort to skip the (slow, eager) grad pass
            captured.append(plan)
            raise _Captured
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            plan, feats, train=True, mutable=["batch_stats"],
        )
        return out, mut["batch_stats"], jnp.zeros((), jnp.int32)

    try:
        _discover_step_impl(
            state, sup_vb, sup_pb, unsup_vb, unsup_pb, cfg, apply)
    except _Captured:
        pass
    assert captured, "mix_mode must be 'lasermix' to probe the mixed plan"
    return captured[0]


def make_sp_discover_step(cfg: DiscoverConfig, mesh: Mesh, halos: tuple,
                          mix_halos: tuple, axis: str = "sp"):
    """Jitted discovery step with the backbone voxel-sharded over `axis`.

    `halos` sizes the combined sup+unsup plan's 10 backbone windows,
    `mix_halos` the in-step LaserMix plan's (see `probe_mix_plan`). Every
    cap in cfg.voxel_caps and cfg.mix_voxel_caps must divide by the mesh
    size. Returns step(state, sup_vb, sup_pb, unsup_vb, unsup_pb) ->
    (state, metrics); metrics["sp_overflow"] must read 0.
    """
    models = {
        "main": make_model(cfg, sp_axis=axis, sp_halos=tuple(halos)),
        "mix": make_model(cfg, sp_axis=axis, sp_halos=tuple(mix_halos)),
    }
    row_specs = {
        "feats": P(axis), "logits_known": P(axis),
        "logits_ncc": P(axis), "logits_novel": P(axis),
    }

    def apply_model(params, batch_stats, plan, feats, kind):
        model = models[kind]

        def local(params, batch_stats, plan_l, feats_l):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                plan_l, feats_l, train=True,
                mutable=["batch_stats", "sp_overflow"],
            )
            ovf = sum(
                jnp.sum(v) for v in
                jax.tree_util.tree_leaves(mut.get("sp_overflow", {}))
            )
            return out, mut["batch_stats"], jax.lax.psum(
                jnp.asarray(ovf, jnp.int32), axis)

        # check_vma=False: unlike sp_step (grads taken INSIDE shard_map),
        # here jax.value_and_grad differentiates THROUGH the shard_map, and
        # the replication checker cannot infer vma for the auto-added
        # residual outputs of the linearized forward. Our own P() outputs
        # (batch_stats, overflow) are explicitly psummed over `axis`.
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), plan_pspec(plan, axis), P(axis)),
            out_specs=(row_specs, P(), P()),
            check_vma=False,
        )(params, batch_stats, plan, feats)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: DiscoverState, sup_vb: dict, sup_pb: dict,
             unsup_vb: dict, unsup_pb: dict):
        return _discover_step_impl(
            state, sup_vb, sup_pb, unsup_vb, unsup_pb, cfg, apply_model)

    return step
