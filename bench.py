"""Benchmark: Stage-2 discovery scans/sec/chip (the BASELINE.json north-star
config). `GCDLSS_BENCH=stage1` runs the Stage-1 pretrain-step bench instead.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md). `vs_baseline` is
measured against a documented analytical estimate of the PyTorch reference on
an H100: MinkowskiEngine MinkUNet34 fwd+bwd on a ~100k-voxel SemanticKITTI
scan runs ~90-150 ms/scan on A100/H100-class GPUs (gather-GEMM-scatter at
~40% MXU-equivalent efficiency plus kernel-map construction); we take the
optimistic end, 10 scans/sec/chip. The BASELINE.json north star is 5x that.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# persistent XLA compilation cache: the big sparse-UNet programs take minutes
# to compile on this rig; cache hits make reruns instant
import os as _os
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"),
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


H100_REFERENCE_SCANS_PER_SEC = 10.0

# Stage-2 work normalization (BENCH.md "Work normalization"): per counted
# scan, the Stage-2 step runs ~2.4x the Stage-1 backbone work (teacher fwd +
# student fwd/bwd on the combined cloud + a second student fwd/bwd on the
# equally-sized mixed cloud, plus two plan builds, in-step re-voxelization,
# mining, k-means, Hungarian). A PyTorch reference at the 10/s Stage-1
# estimate would therefore land at ~10/2.4 = 4.17 scans/s on Stage-2;
# `vs_baseline_worknorm` uses that denominator so the artifact carries the
# normalization BENCH.md argues in prose.
STAGE2_WORK_FACTOR = 2.4
H100_STAGE2_SCANS_PER_SEC = H100_REFERENCE_SCANS_PER_SEC / STAGE2_WORK_FACTOR

POINTS_PER_SCAN = 80_000
BATCH = int(_os.environ.get("GCDLSS_BENCH_BATCH", "1"))
VOXEL_SIZE = 0.05


def synth_scan_points(rng, n):
    """Geometrically simulated spinning-LiDAR scan: 64 beams x azimuth steps
    with ground + wall intersections. Near-sensor rings land multiple returns
    per 0.05 m voxel, giving the realistic ~55-70% unique-voxel ratio of real
    KITTI scans (the quantize/unique path must be benched at true dedupe)."""
    beams = 64
    per_beam = n // beams
    elev = np.deg2rad(np.linspace(-24.0, 2.0, beams))  # HDL-64-ish
    az = rng.uniform(0, 2 * np.pi, (beams, per_beam))
    e = np.broadcast_to(elev[:, None], (beams, per_beam))
    h = 1.73  # sensor height
    # range to ground plane (capped at 80 m); upward beams hit "walls"
    rng_ground = np.where(np.sin(e) < -1e-3, h / np.maximum(-np.sin(e), 1e-3), 80.0)
    wall_r = rng.uniform(4, 60, (beams, per_beam))
    hits_wall = rng.random((beams, per_beam)) < 0.35
    r = np.minimum(rng_ground, np.where(hits_wall, wall_r, np.inf))
    r = np.minimum(r, 80.0)
    x = (r * np.cos(e) * np.cos(az)).reshape(-1)
    y = (r * np.cos(e) * np.sin(az)).reshape(-1)
    z = (h + r * np.sin(e)).reshape(-1)
    pts = np.stack([x, y, z], 1)[: n]
    if pts.shape[0] < n:
        pts = np.concatenate([pts, pts[: n - pts.shape[0]]])
    return (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from gcdlss_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    # Stage-2 (the north-star metric) is the headline; stage1 and the
    # Cylinder3D-backbone Stage-2 (BASELINE config #4) opt-in.
    mode = _os.environ.get("GCDLSS_BENCH", "stage2")
    if mode == "cylinder":
        return stage2_main(arch="Cylinder3D")
    if mode != "stage1":
        return stage2_main()

    from gcdlss_tpu.ops.voxelize import sparse_quantize
    from gcdlss_tpu.ops.plan import build_unet_plan
    from gcdlss_tpu.train.common import default_caps
    from gcdlss_tpu.train.pretrain import (
        PretrainConfig,
        create_pretrain_state,
        make_model,
    )
    from gcdlss_tpu.losses import cross_entropy
    from gcdlss_tpu.train.common import make_sgd
    from gcdlss_tpu.train.schedule import make_lr_schedule

    cap0 = 69120 * BATCH  # voxel slots for BATCH x 80k points at ~83% unique
    caps = default_caps(cap0)
    cfg = PretrainConfig(
        num_labeled_classes=17,
        num_classes=19,
        unknown_label=17,
        voxel_caps=caps,
        arch="MinkUNet34",
        dtype="bfloat16",
        remat=False,
        steps_per_epoch=1000,
    )

    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [synth_scan_points(rng, POINTS_PER_SCAN) for _ in range(BATCH)]
    )
    bidx = np.repeat(np.arange(BATCH, dtype=np.int32), POINTS_PER_SCAN)
    labels = rng.integers(0, 17, BATCH * POINTS_PER_SCAN).astype(np.int32)

    state = create_pretrain_state(jax.random.PRNGKey(0), cfg)
    model = make_model(cfg)
    tx = make_sgd(cfg, make_lr_schedule(cfg))

    @jax.jit
    def step(state, pts, bidx, labels):
        vox = sparse_quantize(
            pts, bidx, jnp.ones(pts.shape[0], bool), VOXEL_SIZE, cap0
        )
        plan = build_unet_plan(vox["coords"], vox["valid"], caps, presorted=True)
        npts = pts.shape[0]
        rep_ok = vox["rep"] < npts
        # features: constant remission=0.5 stand-in; labels via representative
        ok = plan.rep < cap0
        safe_v = jnp.where(ok, plan.rep, 0)
        rep_pt = jnp.where(ok, vox["rep"][safe_v], npts)
        ok2 = rep_pt < npts
        feats0 = jnp.full((cap0, 1), 0.5, jnp.float32) * ok2[:, None]
        labels0 = jnp.where(ok2, labels[jnp.where(ok2, rep_pt, 0)], -1)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                plan, feats0, train=True, mutable=["batch_stats"],
            )
            return cross_entropy(out["logits"], labels0, plan.levels[0].valid), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(
            params=params, batch_stats=mut["batch_stats"],
            opt_state=opt_state, step=state.step + 1,
        )
        return new_state, loss

    jp = jnp.asarray(pts)
    jb = jnp.asarray(bidx)
    jl = jnp.asarray(labels)

    # compile
    state, loss = step(state, jp, jb, jl)
    jax.block_until_ready(loss)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, jp, jb, jl)
    # NB: jax.block_until_ready does NOT synchronize through this rig's
    # remote-TPU tunnel; a host fetch of the (state-dependent) loss does.
    _ = float(loss)
    dt = (time.perf_counter() - t0) / iters

    scans_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "stage1_scans_per_sec_per_chip",
                "value": round(scans_per_sec, 3),
                "unit": "scans/sec/chip (80k pts, voxelize+plan+MinkUNet34 fwd/bwd)",
                "vs_baseline": round(scans_per_sec / H100_REFERENCE_SCANS_PER_SEC, 3),
            }
        )
    )


def stage2_main(arch: str = "MinkUNet34"):
    """North-star config: the full Stage-2 discovery step at KITTI scale
    (2 labeled + 2 unlabeled scans). Run with GCDLSS_BENCH=stage2;
    GCDLSS_BENCH=cylinder runs the same step on the Cylinder3D backbone
    (BASELINE config #4; the reference's own Cylinder3D discovery wrapper
    is dead code, `/root/reference/models/cylinder3d.py:84-85`).

    Scope note (BASELINE.json "voxelize + MinkUNet fwd/bwd"): the bench
    includes every DEVICE-side stage of the training step — both plan
    builds, the in-step LaserMix re-voxelization, all forwards/backwards,
    mining/k-means/Hungarian/queue/EMA. The per-scan HOST quantize (~6 ms,
    overlappable with device compute by the PrefetchLoader) happens once
    outside the loop, exactly like the reference's dataloader-side
    `sparse_quantize` which its step timings also exclude."""
    import jax
    import jax.numpy as jnp

    from gcdlss_tpu.train.common import default_caps
    from gcdlss_tpu.train.discover import (
        DiscoverConfig, create_discover_state, discover_train_step,
    )

    P = POINTS_PER_SCAN
    # total scans per step (split evenly sup/unsup); default 4 = the
    # north-star 2+2 config and emits byte-identical programs to it
    nscans = int(_os.environ.get("GCDLSS_BENCH_S2_SCANS", "4"))
    assert nscans % 2 == 0 and nscans >= 2
    half = 69120 * (nscans // 2)
    cap0 = half * 2
    cfg = DiscoverConfig(
        num_labeled_classes=17, num_unlabeled_classes=2, num_classes=19,
        unknown_label=17, voxel_caps=default_caps(cap0), sup_voxel_cap=half,
        mix_voxel_caps=default_caps(cap0), num_sup_scans=nscans // 2,
        point_cap=P,
        voxel_size=VOXEL_SIZE, arch=arch, dtype="bfloat16",
        cand_cap=4096, queue_slots=20, queue_per_slot=1024, kmeans_iters=15,
        steps_per_epoch=1000,
        # queue width must match the Cylinder3D feature dim (4x base
        # channels; see discover.make_discover_config)
        **({"feat_dim": 128} if arch == "Cylinder3D" else {}),
    )
    rng = np.random.default_rng(0)

    def mk_side(nsc, vcap):
        pts = np.concatenate([synth_scan_points(rng, P) for _ in range(nsc)])
        bidx = np.repeat(np.arange(nsc), P)
        q = np.floor(pts / VOXEL_SIZE).astype(np.int32)
        vox_coords = []
        inv_all = np.full((nsc, P), vcap, np.int32)
        off = 0
        for b in range(nsc):
            qq = q[bidx == b]
            key = ((qq[:, 0].astype(np.int64) + 8192) << 28) |                   ((qq[:, 1].astype(np.int64) + 8192) << 14) |                   (qq[:, 2].astype(np.int64) + 8192)
            u, ui, inv = np.unique(key, return_index=True, return_inverse=True)
            take = min(len(u), vcap - off)
            vox_coords.append(
                np.concatenate([np.full((take, 1), b, np.int32), qq[ui[:take]]], 1)
            )
            inv_all[b] = np.where(inv < take, off + inv, vcap)
            off += take
        vc = np.concatenate(vox_coords)
        m = len(vc)
        coords_pad = np.zeros((vcap, 4), np.int32)
        coords_pad[:m] = vc
        valid = np.zeros(vcap, bool)
        valid[:m] = True
        vb = {
            "coords": jnp.asarray(coords_pad),
            "feats": jnp.asarray(rng.uniform(0, 1, (vcap, 1)).astype(np.float32)),
            "labels": jnp.asarray(np.where(valid, rng.integers(0, 18, vcap), -1).astype(np.int32)),
            "mapped_labels": jnp.asarray(np.where(valid, rng.integers(0, 18, vcap), -1).astype(np.int32)),
            "valid": jnp.asarray(valid),
        }
        pb = {
            "xyz": jnp.asarray(pts.reshape(nsc, P, 3)),
            "feats": jnp.asarray(rng.uniform(0, 1, (nsc, P, 1)).astype(np.float32)),
            "labels": jnp.asarray(rng.integers(0, 18, (nsc, P)).astype(np.int32)),
            "mapped_labels": jnp.asarray(rng.integers(0, 18, (nsc, P)).astype(np.int32)),
            "valid": jnp.ones((nsc, P), bool),
            "voxel_row": jnp.asarray(inv_all),
        }
        return vb, pb

    sup_vb, sup_pb = mk_side(nscans // 2, half)
    unsup_vb, unsup_pb = mk_side(nscans // 2, cap0 - half)
    state = create_discover_state(jax.random.PRNGKey(0), cfg)
    state, m = discover_train_step(state, sup_vb, sup_pb, unsup_vb, unsup_pb, cfg)
    jax.block_until_ready(m["loss"])
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = discover_train_step(state, sup_vb, sup_pb, unsup_vb, unsup_pb, cfg)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    prefix = "cylinder_" if arch == "Cylinder3D" else ""
    print(
        json.dumps(
            {
                "metric": f"{prefix}stage2_scans_per_sec_per_chip",
                "value": round(nscans / dt, 3),
                "unit": (f"scans/sec/chip (Stage-2 discovery step on {arch}, "
                         f"{nscans // 2} sup + {nscans // 2} unsup x 80k pts)"),
                "vs_baseline": round(
                    nscans / dt / H100_REFERENCE_SCANS_PER_SEC, 3),
                # same measurement against the Stage-2-equivalent H100 rate
                # (10/s Stage-1 estimate / 2.4x work factor — see module
                # docstring constants)
                "vs_baseline_worknorm": round(
                    nscans / dt / H100_STAGE2_SCANS_PER_SEC, 3),
                "worknorm_denominator_scans_per_sec": round(
                    H100_STAGE2_SCANS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
