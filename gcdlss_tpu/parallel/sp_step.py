"""Voxel-sharded (SP) Stage-1 training step.

Composes the halo-exchange conv primitives (`parallel.voxel_shard`) into a
full MinkUNet train step under `jax.shard_map`: the per-batch plan is built
once (global row indices), its arrays are stored sharded over the `sp`
mesh axis, and each shard runs the backbone on its row block, exchanging
only boundary slabs over ICI. Loss and grads follow the classic SPMD
pattern — per-shard value_and_grad of the local loss terms, explicit
psums for the scalar loss, the replicated-parameter grads, and the
window-overflow counter (which must stay 0; see `backbone_halos`).

This is the sequence-parallel analog the reference cannot express (its
DDP replicates every scan per GPU, `main.py:163`, SURVEY §2.5): here one
scan's voxel set can span chips, scaling the per-scan memory/compute
ceiling with the mesh instead of the chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.minkunet import MinkUNetSeg
from ..ops.plan import build_unet_plan
from ..train.common import TrainState, make_sgd, plan_and_gather
from ..train.schedule import make_lr_schedule
from . import voxel_shard as vs


def backbone_halos(plan, n_shards: int, margin: float = 1.5,
                   floor: int = 8) -> tuple:
    """Size the 10 static backbone halos (stem, subm0..4, pool0..3) from a
    representative plan's measured requirements. Host-side: pulls device
    values. `margin`/`floor` absorb batch-to-batch variation — the step's
    `sp_overflow` metric reports any batch that still exceeds them."""
    req = jax.jit(partial(vs.required_halos, n_shards=n_shards))(plan)
    order = (["stem"]
             + [f"subm{l}" for l in range(len(plan.levels))]
             + [f"pool{l}" for l in range(len(plan.pools))])
    return tuple(
        max(floor, int(np.ceil(int(req[k]) * margin))) for k in order)


def plan_pspec(plan, axis: str = "sp"):
    """PartitionSpec tree for a UNetPlan: every row-indexed array sharded
    on its leading axis, scalars (counts) replicated."""
    return jax.tree_util.tree_map(
        lambda x: P() if jnp.ndim(x) == 0 else P(axis), plan)


def make_sp_pretrain_step(cfg, mesh: Mesh, halos: tuple, axis: str = "sp"):
    """Jitted Stage-1 train step with the backbone voxel-sharded over
    `axis`. Mirrors `train.pretrain.pretrain_train_step` exactly (masked
    CE, SGD+schedule, BN running stats) — the DP-vs-SP parity test holds
    them equal. Returns step(state, batch) -> (state, metrics)."""
    model = MinkUNetSeg(
        num_classes=cfg.num_labeled_classes, arch=cfg.arch, planes=cfg.planes,
        dtype=jnp.dtype(cfg.dtype), remat=cfg.remat, head=cfg.head,
        sp_axis=axis, sp_halos=tuple(halos),
    )
    tx = make_sgd(cfg, make_lr_schedule(cfg))

    def local_grads(params, batch_stats, plan, feats0, targets):
        valid0 = plan.levels[0].valid

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                plan, feats0, train=True,
                mutable=["batch_stats", "sp_overflow"],
            )
            mask = (targets != -1) & valid0
            safe = jnp.where(mask, targets, 0)
            logp = jax.nn.log_softmax(out["logits"].astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
            m = mask.astype(jnp.float32)
            # globally-consistent masked mean: psum the sums, not the means
            loss = jax.lax.psum(jnp.sum(nll * m), axis) / jnp.maximum(
                jax.lax.psum(jnp.sum(m), axis), 1.0)
            ovf = sum(
                jnp.sum(v) for v in
                jax.tree_util.tree_leaves(mut.get("sp_overflow", {}))
            )
            return loss, (mut["batch_stats"], jnp.asarray(ovf, jnp.int32))

        (loss, (bs, ovf)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.lax.psum(grads, axis)  # each shard holds a partial
        return loss, grads, bs, jax.lax.psum(ovf, axis)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict):
        plan, feats0, _, mapped0 = plan_and_gather(batch, cfg.voxel_caps)
        targets = jnp.where(mapped0 == cfg.unknown_label, -1, mapped0)
        pspec = plan_pspec(plan, axis)
        loss, grads, bs, ovf = jax.shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(P(), P(), pspec, P(axis), P(axis)),
            out_specs=(P(), P(), P(), P()),
        )(state.params, state.batch_stats, plan, feats0, targets)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        new_state = TrainState(params=params, batch_stats=bs,
                               opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "sp_overflow": ovf}

    return step


def make_dp_sp_pretrain_step(cfg, mesh: Mesh, halos: tuple,
                             dp_axis: str = "dp", sp_axis: str = "sp"):
    """Stage-1 step on a composed (dp, sp) mesh: batch groups over `dp_axis`
    (one group per dp row, leading axis G == dp size), each group's voxel
    rows over `sp_axis`. Convs halo-exchange within their group's sp ring
    only; BN moments, the masked-CE mean, and grads psum over BOTH axes —
    so the step equals a single-device run on the groups' concatenated
    batch (disjoint batch indices make the union plan the exact block
    concatenation of the per-group plans; tested bit-level).

    batch arrays carry a leading group dim: coords [G, cap, 4], etc.
    Returns step(state, batch) -> (state, metrics)."""
    both = (dp_axis, sp_axis)
    model = MinkUNetSeg(
        num_classes=cfg.num_labeled_classes, arch=cfg.arch, planes=cfg.planes,
        dtype=jnp.dtype(cfg.dtype), remat=cfg.remat, head=cfg.head,
        sp_axis=both, sp_halos=tuple(halos),
    )
    tx = make_sgd(cfg, make_lr_schedule(cfg))

    def local_grads(params, batch_stats, plan, feats0, targets):
        # local leading group dim is G/dp == 1: peel it
        plan = jax.tree_util.tree_map(lambda a: a[0], plan)
        feats0, targets = feats0[0], targets[0]
        valid0 = plan.levels[0].valid

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                plan, feats0, train=True,
                mutable=["batch_stats", "sp_overflow"],
            )
            mask = (targets != -1) & valid0
            safe = jnp.where(mask, targets, 0)
            logp = jax.nn.log_softmax(out["logits"].astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
            m = mask.astype(jnp.float32)
            loss = jax.lax.psum(jnp.sum(nll * m), both) / jnp.maximum(
                jax.lax.psum(jnp.sum(m), both), 1.0)
            ovf = sum(
                jnp.sum(v) for v in
                jax.tree_util.tree_leaves(mut.get("sp_overflow", {}))
            )
            return loss, (mut["batch_stats"], jnp.asarray(ovf, jnp.int32))

        (loss, (bs, ovf)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, jax.lax.psum(grads, both), bs, jax.lax.psum(ovf, both)

    def grouped_pspec(x):
        return P(dp_axis) if jnp.ndim(x) == 1 else P(dp_axis, sp_axis)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict):
        g = batch["coords"].shape[0]
        assert g == mesh.shape[dp_axis], "one batch group per dp row"
        plan, feats0, _, mapped0 = jax.vmap(
            lambda b: plan_and_gather(b, cfg.voxel_caps))(batch)
        targets = jnp.where(mapped0 == cfg.unknown_label, -1, mapped0)
        pspec = jax.tree_util.tree_map(grouped_pspec, plan)
        loss, grads, bs, ovf = jax.shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(P(), P(), pspec,
                      P(dp_axis, sp_axis), P(dp_axis, sp_axis)),
            out_specs=(P(), P(), P(), P()),
        )(state.params, state.batch_stats, plan, feats0, targets)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        new_state = TrainState(params=params, batch_stats=bs,
                               opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "sp_overflow": ovf}

    return step
