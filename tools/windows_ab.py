"""A/B: does XLA CSE deduplicate plan_windows across two fused convs on
the SAME rulebook inside one jit program?

The discover step runs teacher fwd + student fwd (+ the grad recompute)
over the same plan; if the per-call `plan_windows(nbr)` subgraphs are
CSE'd, lifting window planning into `build_unet_plan` buys nothing —
if they are NOT, it's ~2x the window-planning cost per step hiding
inside the "student fwd+bwd" phase.

Times three jitted programs at the same [N, C] shape:
  one   — a single fused conv
  same  — two fused convs, same nbr, different inputs
  diff  — two fused convs, two distinct nbr arrays
If CSE works: same - one << diff - one (the delta is pure conv time).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from gcdlss_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from gcdlss_tpu.ops.fused_conv import fused_subm_conv
from tpu_timing import device_time

N = int(os.environ.get("N", "69120"))
C = int(os.environ.get("C", "96"))
K = 27

rng = np.random.default_rng(0)
# ring-model neighbor structure (see tools/kernel_variants_bench.py note):
# contiguous batch rows with local neighbors, ~realistic fill
nbr = np.full((N, K), -1, np.int32)
for kk in range(K):
    off = int(rng.integers(-40, 40))
    rows = np.arange(N) + off
    ok = (rows >= 0) & (rows < N) & (rng.random(N) < 0.4)
    nbr[:, kk] = np.where(ok, rows, -1)
nbr2 = np.roll(nbr, 7, axis=0)

x1 = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
x2 = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
w = jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32) * 0.05)
nbr_d = jnp.asarray(nbr)
nbr2_d = jnp.asarray(nbr2)


@jax.jit
def one(x1, nbr, w):
    return fused_subm_conv(x1, nbr, w)


@jax.jit
def same(x1, x2, nbr, w):
    return fused_subm_conv(x1, nbr, w) + fused_subm_conv(x2, nbr, w)


@jax.jit
def diff(x1, x2, nbr, nbr2, w):
    return fused_subm_conv(x1, nbr, w) + fused_subm_conv(x2, nbr2, w)


for label, f, args in (
    ("one ", one, (x1, nbr_d, w)),
    ("same", same, (x1, x2, nbr_d, w)),
    ("diff", diff, (x1, x2, nbr_d, nbr2_d, w)),
):
    _ = jax.block_until_ready(f(*args))
    dt = device_time(f, *args, n=16)
    print(f"{label}: {dt*1e3:.2f} ms", flush=True)
