"""Synthetic SemanticKITTI-format mini-scans for tests and benchmarks.

The reference ships no test fixtures and expects the real SemanticKITTI
download; this generator writes procedurally-generated scans in the exact
on-disk format (`sequences/<seq>/velodyne/*.bin` float32 Nx4,
`sequences/<seq>/labels/*.label` int32 sem|inst<<16) so the full host
pipeline — reader, learning map, REAL aug, quantization, splits — can be
exercised hermetically.
"""

from __future__ import annotations

import os

import numpy as np

# raw ids used by the generator: ground-ish classes + instance classes
_GROUND = [40, 44, 48, 70, 72]  # road, parking, sidewalk, vegetation, terrain
_INSTANCE = [10, 11, 15, 18, 20, 30, 31]  # car..bicyclist
_STATIC = [50, 51, 71, 80, 81]  # building, fence, trunk, pole, traffic-sign


def synthetic_scan(rng: np.random.Generator, num_points: int = 4000):
    """One scan: ground plane + a few boxes (instances) + poles/walls."""
    n_ground = num_points // 2
    xy = rng.uniform(-40, 40, size=(n_ground, 2))
    z = rng.normal(-1.6, 0.05, size=(n_ground, 1))
    ground = np.hstack([xy, z]).astype(np.float32)
    g_labels = rng.choice(_GROUND, size=n_ground)
    g_inst = np.zeros(n_ground, np.int32)

    pts = [ground]
    labels = [g_labels]
    insts = [g_inst]
    remaining = num_points - n_ground
    inst_id = 1
    while remaining > 0:
        m = min(remaining, int(rng.integers(150, 600)))
        kind = rng.random()
        center = rng.uniform(-35, 35, size=2)
        if kind < 0.6:  # box instance (car/truck/...)
            dims = rng.uniform([1.0, 0.5, 0.4], [4.5, 2.0, 1.8])
            local = rng.uniform(-0.5, 0.5, size=(m, 3)) * dims
            p = local + np.array([center[0], center[1], -1.3 + dims[2] / 2])
            lab = int(rng.choice(_INSTANCE))
            iid = inst_id
            inst_id += 1
        else:  # vertical structure
            h = rng.uniform(1.0, 5.0)
            p = np.column_stack(
                [
                    center[0] + rng.normal(0, 0.15, m),
                    center[1] + rng.normal(0, 0.15, m),
                    rng.uniform(-1.6, -1.6 + h, m),
                ]
            )
            lab = int(rng.choice(_STATIC))
            iid = 0
        pts.append(p.astype(np.float32))
        labels.append(np.full(m, lab))
        insts.append(np.full(m, iid, np.int32))
        remaining -= m

    xyz = np.concatenate(pts)
    sem = np.concatenate(labels).astype(np.int32)
    inst = np.concatenate(insts).astype(np.int32)
    remission = rng.uniform(0, 1, size=(xyz.shape[0], 1)).astype(np.float32)
    return xyz, remission, sem, inst


def write_synthetic_kitti(
    root: str,
    sequences=("00",),
    scans_per_seq: int = 4,
    num_points: int = 4000,
    seed: int = 0,
    valid_seq: str = "08",
    valid_scans: int = 2,
):
    """Write a synthetic dataset tree; returns the root path."""
    rng = np.random.default_rng(seed)
    seq_plan = [(s, scans_per_seq) for s in sequences] + [(valid_seq, valid_scans)]
    for seq, n in seq_plan:
        vdir = os.path.join(root, "sequences", seq, "velodyne")
        ldir = os.path.join(root, "sequences", seq, "labels")
        os.makedirs(vdir, exist_ok=True)
        os.makedirs(ldir, exist_ok=True)
        for i in range(n):
            xyz, rem, sem, inst = synthetic_scan(rng, num_points)
            scan = np.hstack([xyz, rem]).astype(np.float32)
            scan.tofile(os.path.join(vdir, f"{i:06d}.bin"))
            packed = (sem.astype(np.int32) | (inst.astype(np.int32) << 16)).astype(
                np.int32
            )
            packed.tofile(os.path.join(ldir, f"{i:06d}.label"))
    return root
