"""One-shot fused-conv timing at the ambient GCDLSS_FUSED_BLOCK/WINDOW.

Run via tools/geom_sweep.sh — the geometry constants are read at module
import, so each (B, W) combo needs a fresh process. Prints one line:
  geom B=<B> W=<W>: fwd <ms> ms, fwd+bwd <ms> ms  (N=<n>, C=<c>)
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

import gcdlss_tpu.ops.fused_conv as fc
from tpu_timing import device_time

N = int(os.environ.get("N", "264960"))  # ~bench L0, BLOCK-divisible
C = int(os.environ.get("C", "96"))
K = 27

rng = np.random.default_rng(0)
# ring-model books (contiguous batch rows, ~L0-realistic fill; see
# tools/kernel_variants_bench.py for why random-batch books mislead)
nbr = np.full((N, K), -1, np.int32)
for kk in range(K):
    # span kept within the smallest swept window (W=1024) so no combo
    # falls onto the far/poison path
    off = int(rng.integers(-300, 300))
    rows = np.arange(N) + off
    ok = (rows >= 0) & (rows < N) & (rng.random(N) < 0.13)
    nbr[:, kk] = np.where(ok, rows, -1)
nbr[:, K // 2] = np.arange(N)  # center always present

x = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
w = jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32) * 0.05)
nbr_d = jnp.asarray(nbr)

fwd = jax.jit(lambda x, nbr, w: fc.fused_subm_conv(x, nbr, w))
gfn = jax.jit(jax.value_and_grad(
    lambda x, nbr, w: jnp.sum(jnp.tanh(fc.fused_subm_conv(x, nbr, w))),
    argnums=(0, 2)))

_ = jax.block_until_ready(fwd(x, nbr_d, w))
dt_f = device_time(fwd, x, nbr_d, w, n=16)
_ = jax.block_until_ready(gfn(x, nbr_d, w)[0])
dt_g = device_time(lambda *a: gfn(*a)[0], x, nbr_d, w, n=16)
vw = fc._var_windows(fc.WINDOW, fc.SUBWIN)
print(f"geom B={fc.BLOCK} W={fc.WINDOW} SW={fc.SUBWIN} vw={vw}: "
      f"fwd {dt_f*1e3:.2f} ms, fwd+bwd {dt_g*1e3:.2f} ms (N={N}, C={C})",
      flush=True)
