import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gcdlss_tpu.ops.conv import gather_conv
from gcdlss_tpu.ops.pallas_gather import (
    windowed_gather_conv,
    windowed_gather_conv_ref,
    window_stats,
)


def _setup(n=512, k=9, c=8, co=16, spread=100, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(n, c)).astype(np.float32)
    # near-diagonal neighbors with a few far outliers and missing entries
    nbr = np.arange(n)[:, None] + rng.integers(-spread, spread, (n, k))
    nbr[rng.random((n, k)) < 0.1] = -1
    far = rng.random((n, k)) < 0.02
    nbr[far] = rng.integers(0, n, far.sum())
    nbr = np.clip(nbr, -1, n - 1).astype(np.int32)
    w = (rng.normal(size=(k, c, co)) * 0.1).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w)


def test_windowed_ref_decomposition_exact():
    feats, nbr, w = _setup()
    expected = gather_conv(feats, nbr, w, precision="highest")
    got = windowed_gather_conv_ref(feats, nbr, w, block=64, halo=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)
    fs = float(window_stats(nbr, block=64, halo=128))
    assert 0.0 <= fs < 0.2


def test_windowed_pallas_interpret_matches():
    feats, nbr, w = _setup()
    expected = gather_conv(feats, nbr, w, precision="highest")
    got = windowed_gather_conv(feats, nbr, w, block=64, halo=128,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-3, atol=1e-3)
