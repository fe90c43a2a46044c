"""Auxiliary heads: prototypes, cosine prototypes, projection MLP, multi-head,
equiangular prototypes.

Functional rebuilds of reference `models/multiheadminkunet.py:9-119`
(Prototypes / CosinePrototypes / ProjectionHead / MultiHead) and
`models/multiheadminkunet_nops.py:8-43` (EP equiangular head). These operate
on dense [N, C] feature buffers (the sparse tensors' feature columns) so they
compose with any backbone output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class Prototypes(nn.Module):
    """Linear prototype head (1x1 conv, no bias)."""

    num_prototypes: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.num_prototypes, use_bias=False, name="prototypes")(x)


class CosinePrototypes(nn.Module):
    """10 * cos-similarity prototype head."""

    num_prototypes: int
    scale: float = 10.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(key, shape, minval=-1.0, maxval=1.0),
            (self.num_prototypes, x.shape[-1]),
        )
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        wn = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        return self.scale * (xn @ wn.T)


class ProjectionHead(nn.Module):
    """MLP 96 -> 128 -> 256 -> 256 with ReLU, xavier-uniform init."""

    dims: tuple = (128, 256, 256)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(), name=f"fc{i}")(x)
            if i + 1 < len(self.dims):
                x = nn.relu(x)
        return x


class MultiHead(nn.Module):
    """num_heads independent prototype heads; returns stacked logits [H, N, P]."""

    num_prototypes: int
    num_heads: int
    cosine: bool = False

    @nn.compact
    def __call__(self, x):
        outs = []
        for h in range(self.num_heads):
            head = (
                CosinePrototypes(self.num_prototypes, name=f"head{h}")
                if self.cosine
                else Prototypes(self.num_prototypes, name=f"head{h}")
            )
            outs.append(head(x))
        return jnp.stack(outs, axis=0)


def _equiangular_matrix(feat_in: int, num_prototypes: int, seed: int = 0) -> np.ndarray:
    """Fixed simplex-equiangular prototype matrix via QR orthogonalization."""
    rng = np.random.default_rng(seed)
    a = rng.random((feat_in, num_prototypes))
    p, _ = np.linalg.qr(a)
    i = np.eye(num_prototypes)
    one = np.ones((num_prototypes, num_prototypes))
    m = np.sqrt(num_prototypes / (num_prototypes - 1)) * (
        p @ (i - one / num_prototypes)
    )
    return m.astype(np.float32)


class EquiangularPrototypes(nn.Module):
    """Learned embedding to dim/2 + fixed equiangular simplex prototypes."""

    num_prototypes: int
    seed: int = 0

    @nn.compact
    def __call__(self, x):
        half = x.shape[-1] // 2
        h = nn.relu(nn.Dense(half, use_bias=False, name="embedding")(x))
        m = jnp.asarray(_equiangular_matrix(half, self.num_prototypes, self.seed))
        hn = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
        mn = m / jnp.maximum(jnp.linalg.norm(m, axis=0, keepdims=True), 1e-12)
        return hn @ mn
