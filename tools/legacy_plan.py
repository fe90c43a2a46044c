"""Pre-ragged window planning, kept for the inline diagnostic kernels.

The production `ops/fused_conv.plan_windows` now emits a packed per-chunk
ss ((128-aligned base | ntile) per (block, offset, 128-lane chunk)); the
round-2 diagnostic tools (`kernel_variants_bench`, `kernel_bisect_bench`,
`fori_diag_bench`) carry inline copies of the round-2 kernel that expect
one plain 128-aligned base per (block, offset). This module preserves that
legacy planning so those diagnostics stay self-consistent.
"""
import jax
import jax.numpy as jnp

from gcdlss_tpu.ops import fused_conv as fc


def plan_windows_legacy(nbr, block=None, window=None, subwin=None):
    block = block or fc.BLOCK
    window = window or fc.WINDOW
    subwin = subwin or fc.SUBWIN
    n, k = nbr.shape
    nb = n // block
    k8 = fc._round_up(k, 8)
    nbrT = jnp.full((n, k8), -1, jnp.int32)
    nbrT = jax.lax.dynamic_update_slice(nbrT, nbr, (0, 0))
    nbrT = nbrT.reshape(nb, block, k8).transpose(0, 2, 1)
    big = jnp.where(nbrT >= 0, nbrT, jnp.int32(1 << 30))
    mins = jnp.min(big, axis=2)
    anymin = jnp.min(mins, axis=1)
    ws = jnp.clip(jnp.where(anymin >= (1 << 30), 0, anymin),
                  0, max(n - window, 0)).astype(jnp.int32) & ~jnp.int32(127)
    ss = (jnp.clip(jnp.where(mins >= (1 << 30), 0, mins - ws[:, None]),
                   0, window - subwin).astype(jnp.int32) & ~jnp.int32(127))
    rel = nbrT - (ws[:, None, None] + ss[:, :, None])
    near = (nbrT >= 0) & (rel >= 0) & (rel < subwin)
    relT = jnp.where(near, rel, -1).astype(jnp.int32).reshape(nb * k8, block)
    far_count = jnp.sum(((nbrT >= 0) & ~near).astype(jnp.int32))
    return ws, ss, relT, far_count
