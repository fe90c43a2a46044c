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
from ..parallel import voxel_shard as _vs


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


def mask_cols(x: jax.Array, valid: jax.Array) -> jax.Array:
    return x * valid[None, :].astype(x.dtype)


def _mask(x, valid, layout):
    return mask_cols(x, valid) if layout == "cols" else mask_rows(x, valid)


class DenseT(nn.Module):
    """nn.Dense for the transposed [C, N] activation layout.

    Param names/shapes identical to `nn.Dense` (kernel [ci, co], bias [co])
    so checkpoints are layout-independent."""

    features: int
    use_bias: bool = True
    dtype: jax.typing.DTypeLike | None = None

    @nn.compact
    def __call__(self, x):
        ci = x.shape[0]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (ci, self.features))
        dt = self.dtype or x.dtype
        y = jax.lax.dot_general(
            kernel.astype(dt), x.astype(dt), (((0,), (0,)), ((), ())))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)[:, None]
        return y


class SparseConv(nn.Module):
    """Submanifold sparse convolution (kernel offsets given by the nbr map).

    layout="cols" consumes/produces [C, N] (transposed-activation mode): the
    fused kernel then packs/unpacks elementwise with zero relayout; the XLA
    fallback transposes locally (small levels only, where that is cheap)."""

    features: int
    kernel_volume: int = 27
    use_bias: bool = False
    layout: str = "rows"
    sp_axis: object = None  # "sp" or ("dp", "sp"); rows ride the LAST axis
    sp_halo: int = 0

    @nn.compact
    def __call__(self, x, nbr, valid):
        cols = self.layout == "cols"
        ci = x.shape[0] if cols else x.shape[-1]
        n = x.shape[1] if cols else x.shape[0]
        w = self.param(
            "kernel",
            _kaiming_conv_init(self.kernel_volume),
            (self.kernel_volume, ci, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        if self.sp_axis is not None:
            assert not cols, "voxel sharding runs the rows-layout XLA path"
            out, ovf = _vs.sp_gather_conv(
                x, nbr, w, b, halo=self.sp_halo,
                axis_name=_vs.conv_axis(self.sp_axis))
            self.sow("sp_overflow", "conv", ovf)
            return mask_rows(out, valid)
        fused_ok = _fused.enabled_on() and _fused.supported(n, ci, nbr.shape[1])
        if cols:
            if fused_ok:
                out = _fused.fused_subm_conv_T(x, nbr, w, b)
            else:
                out = gather_conv(x.T, nbr, w, b, symmetric_adjoint=True).T
            return mask_cols(out, valid)
        if fused_ok:
            out = _fused.fused_subm_conv(x, nbr, w, b)
        else:
            out = gather_conv(x, nbr, w, b, symmetric_adjoint=True)
        return mask_rows(out, valid)


class SparseDownConv(nn.Module):
    """Strided k=2 s=2 sparse conv onto the next (coarser) level."""

    features: int
    cap_out: int
    layout: str = "rows"
    sp_axis: object = None
    sp_halo: int = 0

    @nn.compact
    def __call__(self, x, pool, out_valid):
        cols = self.layout == "cols"
        ci = x.shape[0] if cols else x.shape[-1]
        w = self.param("kernel", _kaiming_conv_init(8), (8, ci, self.features))
        if self.sp_axis is not None:
            assert not cols, "voxel sharding runs the rows-layout XLA path"
            out, ovf = _vs.sp_down_conv(
                x, pool.parent, pool.dcode, w, self.cap_out,
                halo=self.sp_halo, axis_name=_vs.conv_axis(self.sp_axis))
            self.sow("sp_overflow", "down", ovf)
            return mask_rows(out.astype(x.dtype), out_valid)
        if cols:
            if (_fused.enabled_on() and pool.children is not None
                    and _fused.pool_supported(x.shape[1], self.cap_out, ci)):
                out = _fused.fused_pool_conv_T(x, pool.children, pool.upmap, w)
            else:
                out = down_conv(
                    x.T, pool.parent, pool.dcode, w, self.cap_out).T
            return mask_cols(out, out_valid)
        out = down_conv(x, pool.parent, pool.dcode, w, self.cap_out)
        return mask_rows(out, out_valid)


class SparseUpConv(nn.Module):
    """Transpose k=2 s=2 sparse conv back onto the finer level's coords."""

    features: int
    layout: str = "rows"
    sp_axis: object = None
    sp_halo: int = 0

    @nn.compact
    def __call__(self, x_coarse, pool, out_valid):
        cols = self.layout == "cols"
        ci = x_coarse.shape[0] if cols else x_coarse.shape[-1]
        w = self.param("kernel", _kaiming_conv_init(8), (8, ci, self.features))
        if self.sp_axis is not None:
            assert not cols, "voxel sharding runs the rows-layout XLA path"
            out, ovf = _vs.sp_up_conv(
                x_coarse, pool.parent, pool.dcode, w,
                halo=self.sp_halo, axis_name=_vs.conv_axis(self.sp_axis))
            self.sow("sp_overflow", "up", ovf)
            return mask_rows(out.astype(x_coarse.dtype), out_valid)
        if cols:
            if (_fused.enabled_on() and pool.children is not None
                    and _fused.pool_supported(
                        x_coarse.shape[1], pool.upmap.shape[0], ci)):
                out = _fused.fused_pool_conv_T(
                    x_coarse, pool.upmap, pool.children, w)
            else:
                out = up_conv(x_coarse.T, pool.parent, pool.dcode, w).T
            return mask_cols(out, out_valid)
        out = up_conv(x_coarse, pool.parent, pool.dcode, w)
        return mask_rows(out, out_valid)


class SparseBatchNorm(nn.Module):
    """BatchNorm over valid voxels (torch semantics: momentum 0.1, eps 1e-5).

    Normalizes with biased batch variance; running_var stores the unbiased
    estimate, matching `torch.nn.BatchNorm1d` inside `MinkowskiBatchNorm`.
    Param/stat shapes are layout-independent ([C]).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    layout: str = "rows"
    sp_axis: object = None  # axis (or axes tuple) to psum batch stats over

    @nn.compact
    def __call__(self, x, valid, use_running_average: bool):
        cols = self.layout == "cols"
        c = x.shape[0] if cols else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if self.sp_axis is not None:
                assert not cols
                mean, var, cnt = _vs.sp_bn_stats(x, valid, self.sp_axis)
            elif cols:
                xf = x.astype(jnp.float32)
                m = valid[None, :].astype(jnp.float32)
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=1) / cnt
                var = jnp.sum((xf - mean[:, None]) ** 2 * m, axis=1) / cnt
            else:
                mean, var, cnt = masked_batch_norm_stats(
                    x.astype(jnp.float32), valid)
            unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
            if not self.is_initializing():
                mo = self.momentum
                ra_mean.value = (1 - mo) * ra_mean.value + mo * mean
                ra_var.value = (1 - mo) * ra_var.value + mo * unbiased
        inv = jax.lax.rsqrt(var + self.eps)
        if cols:
            out = (x - mean[:, None]) * (inv * scale)[:, None] + bias[:, None]
            return mask_cols(out.astype(x.dtype), valid)
        out = (x - mean) * (inv * scale) + bias
        return mask_rows(out.astype(x.dtype), valid)


class NormedLinearT(nn.Module):
    """`NormedLinear` for the transposed [C, N] layout (same params)."""

    features: int
    scale: float = 10.0

    @nn.compact
    def __call__(self, x):
        ci = x.shape[0]
        w = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(key, shape, minval=-1.0, maxval=1.0),
            (ci, self.features),
        )
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=0, keepdims=True), 1e-12)
        wn = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        return self.scale * jax.lax.dot_general(
            wn, xn, (((0,), (0,)), ((), ())))  # [features, N]


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
