"""Device mesh + data-parallel sharding helpers.

The reference's only parallelism is PL DDP over NCCL (`main.py:163`,
SURVEY §2.5). The TPU-native equivalent is single-controller JAX: a 1-D
`Mesh` over the ICI with params replicated and batches sharded; `jit`
propagates the shardings SPMD-style and inserts `psum`/`all_gather`
collectives — including the all-gathers that make the Stage-2 candidate
set / k-means / queue *globally consistent* (the reference's per-rank DDP
state silently diverges).

Sharding layout:
  * voxel buffers   — sharded along the voxel-capacity axis;
  * point buffers   — sharded along the scan axis;
  * params/state    — replicated (grad allreduce is automatic).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_voxel_batch(vb: dict, mesh: Mesh, axis: str = "data") -> dict:
    s = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, s) for k, v in vb.items()}


def shard_point_batch(pb: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Shard [S, P, ...] point buffers: along the scan axis when it divides
    the mesh, else along the point axis (scans per step is often < devices),
    else replicate (jit re-shards internally; an indivisible point axis
    would otherwise raise an opaque device_put error)."""
    n = mesh.devices.size
    nscans = next(iter(pb.values())).shape[0]
    npoints = next(iter(pb.values())).shape[1]
    if nscans % n == 0:
        spec = P(axis)
    elif npoints % n == 0:
        spec = P(None, axis)
    else:
        spec = P()
    s = NamedSharding(mesh, spec)
    return {k: jax.device_put(v, s) for k, v in pb.items()}


def pad_cap_for_mesh(cap: int, n_devices: int) -> int:
    """Round a capacity up so sharded axes divide evenly."""
    return -(-cap // n_devices) * n_devices
