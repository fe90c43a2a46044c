"""In-graph Hungarian assignment for tiny matrices.

The Stage-2 step needs a per-step Hungarian match between novel-head argmax
predictions and k-means cluster labels (`exp_merge_mean_teacher.py:2991-3008`)
— a Ku x Ku problem with Ku <= 4. The reference round-trips to scipy on the
host every step; on TPU we instead enumerate all Ku! <= 24 permutations and
take the max-trace one — a handful of vectorized gathers, fully inside jit.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("maximize",))
def _assign(cost, perms, maximize: bool):
    # perms: [P, K]; score of perm p = sum_i cost[perm[i], i]
    k = cost.shape[0]
    cols = jnp.arange(k)
    scores = jnp.sum(cost[perms, cols[None, :]], axis=1)  # [P]
    best = jnp.argmax(scores) if maximize else jnp.argmin(scores)
    return perms[best]


_PERM_CACHE: dict = {}


def _perms(k: int) -> np.ndarray:
    # cache plain numpy — caching device arrays created inside a jit trace
    # would leak tracers across retraces
    if k not in _PERM_CACHE:
        _PERM_CACHE[k] = np.array(list(itertools.permutations(range(k))), np.int32)
    return _PERM_CACHE[k]


def hungarian_small(cost: jax.Array, maximize: bool = True) -> jax.Array:
    """Optimal assignment for a [K, K] cost (K <= 6).

    Returns row_of_col [K]: column j is assigned row row_of_col[j], i.e. the
    permutation maximizing (or minimizing) sum_j cost[row_of_col[j], j].
    """
    k = cost.shape[0]
    assert k <= 6, "brute-force hungarian is for tiny matrices"
    return _assign(cost, jnp.asarray(_perms(k)), maximize)
