"""Sparse neural-net layers on padded voxel buffers (flax).

Functional equivalents of `MinkowskiConvolution`, `MinkowskiConvolutionTranspose`,
`MinkowskiBatchNorm`, `MinkowskiReLU` and the `NormedLinear` cosine head
(reference `models/minkunet.py:34-42,62-132`).  Every layer takes explicit plan
arrays (neighbor maps / pool maps from `gcdlss_tpu.ops.plan`) and a validity
mask; invalid rows are kept at zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.conv import gather_conv, down_conv, up_conv, masked_batch_norm_stats
from ..ops import fused_conv as _fused


def _kaiming_conv_init(k: int):
    """He-normal for sparse conv kernels [K, Ci, Co], fan_out = K*Co.

    Mirrors `ME.utils.kaiming_normal_(kernel, mode=fan_out, nonlinearity=relu)`
    applied to Minkowski kernels (reference `models/resnet.py:81-88`).
    """

    def init(key, shape, dtype=jnp.float32):
        kk, ci, co = shape
        std = (2.0 / (kk * co)) ** 0.5
        return std * jax.random.normal(key, shape, dtype)

    return init


def mask_rows(x: jax.Array, valid: jax.Array) -> jax.Array:
    return x * valid[:, None].astype(x.dtype)


class SparseConv(nn.Module):
    """Submanifold sparse convolution (kernel offsets given by the nbr map)."""

    features: int
    kernel_volume: int = 27
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, nbr, valid):
        ci = x.shape[-1]
        w = self.param(
            "kernel",
            _kaiming_conv_init(self.kernel_volume),
            (self.kernel_volume, ci, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        if _fused.enabled_on() and _fused.supported(x.shape[0], ci, nbr.shape[1]):
            out = _fused.fused_subm_conv(x, nbr, w, b)
        else:
            out = gather_conv(x, nbr, w, b, symmetric_adjoint=True)
        return mask_rows(out, valid)


class SparseDownConv(nn.Module):
    """Strided k=2 s=2 sparse conv onto the next (coarser) level."""

    features: int
    cap_out: int

    @nn.compact
    def __call__(self, x, pool, out_valid):
        ci = x.shape[-1]
        w = self.param("kernel", _kaiming_conv_init(8), (8, ci, self.features))
        out = down_conv(x, pool.parent, pool.dcode, w, self.cap_out)
        return mask_rows(out, out_valid)


class SparseUpConv(nn.Module):
    """Transpose k=2 s=2 sparse conv back onto the finer level's coords."""

    features: int

    @nn.compact
    def __call__(self, x_coarse, pool, out_valid):
        ci = x_coarse.shape[-1]
        w = self.param("kernel", _kaiming_conv_init(8), (8, ci, self.features))
        out = up_conv(x_coarse, pool.parent, pool.dcode, w)
        return mask_rows(out, out_valid)


class SparseBatchNorm(nn.Module):
    """BatchNorm over valid voxels (torch semantics: momentum 0.1, eps 1e-5).

    Normalizes with biased batch variance; running_var stores the unbiased
    estimate, matching `torch.nn.BatchNorm1d` inside `MinkowskiBatchNorm`.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, valid, use_running_average: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var, cnt = masked_batch_norm_stats(x.astype(jnp.float32), valid)
            unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var + self.eps)
        out = (x - mean) * (inv * scale) + bias
        return mask_rows(out.astype(x.dtype), valid)


class NormedLinear(nn.Module):
    """Cosine classifier: 10 * normalize(x) @ normalize(W, axis=0).

    Reference `models/minkunet.py:34-42`.
    """

    features: int
    scale: float = 10.0

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        w = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(key, shape, minval=-1.0, maxval=1.0),
            (ci, self.features),
        )
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        wn = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        return self.scale * (xn @ wn)
