"""Reliable TPU timing under the axon remote tunnel.

`jax.block_until_ready` does NOT synchronize on this backend (an 8192 matmul
"times" at 7000 TFLOPs with it). The device still executes enqueued programs
in order, so: enqueue n executions, then force ONE device->host fetch of the
last output; total elapsed ~= n * exec + fetch latency. Use n large enough
that the fetch latency amortizes, and subtract the measured null-dispatch
baseline if sub-ms precision is needed.
"""
import time

import numpy as np
import jax


def device_time(f, *args, n=20, warmup=2):
    """Mean per-execution wall time of f(*args), tunnel-safe."""
    for _ in range(warmup):
        o = f(*args)
    _sync(o)
    t0 = time.time()
    for _ in range(n):
        o = f(*args)
    _sync(o)
    return (time.time() - t0) / n


def _sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[:1]))
