"""Torch-layout flax linen primitives — the lycoris_tpu perf path.

These layers store weights in torch layout ((out, in, *k), channels-first
activations) so that:
- adapter modules apply with ZERO layout conversion at runtime (flax-native
  Dense/Conv need kernel transposes + NHWC<->NCHW moves per call);
- checkpoints round-trip to/from PyTorch state dicts without key or layout
  munging.

Each class exposes ``lycoris_layer_info`` which the graph builder
(:func:`lycoris_tpu.graph.adapter_for_linen`) uses to treat it as a native
torch-layout layer. Class names intentionally mirror torch
(Linear/Conv2d/...) so reference presets that target "Linear"/"Conv2d" work
unchanged.

On TPU, channels-first convs lower to the same XLA convolutions as NHWC ones
(XLA picks its own internal layout for the MXU), so this costs nothing at
runtime while saving the adapter-side transposes.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..functional import general
from ..modules.base import LayerInfo


def _kaiming_init(shape, dtype):
    def init(key):
        return general.kaiming_uniform(key, shape, dtype=dtype)

    return init


class Linear(nn.Module):
    """y = x @ W.T + b, W stored (out, in) — torch nn.Linear parity.

    ``head_split=(heads, head_dim)`` (attention q/k/v projections): the
    output is produced directly in the head-major ``(..., H, T, D)`` layout
    via one einsum — the weight layout, checkpoint keys, and adapter math
    are unchanged (adapters see a plain (out, in) linear; the graph adapter
    converts activations at the layer boundary)."""

    features: int
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32
    head_split: tuple | None = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("weight", lambda k: general.kaiming_uniform(k, (self.features, in_dim), dtype=self.param_dtype))
        b = None
        if self.use_bias:
            bound = 1 / math.sqrt(in_dim)
            b = self.param(
                "bias",
                lambda k: jax.random.uniform(k, (self.features,), self.param_dtype, -bound, bound),
            )
        dtype = self.dtype or x.dtype
        xd = x.astype(dtype)
        wd = w.astype(dtype)
        bd = None if b is None else b.astype(dtype)
        if self.head_split is not None:
            return general.linear_head_split(xd, wd, bd, *self.head_split)
        return general.linear(xd, wd, bd)

    def lycoris_layer_info(self, params):
        w = params["weight"]
        return LayerInfo.linear(w.shape[0], w.shape[1], "bias" in params)


class _ConvNd(nn.Module):
    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    dilation: Any = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None
    param_dtype: Any = jnp.float32

    _nd: int = 0

    def _ksize(self):
        k = self.kernel_size
        return (k,) * self._nd if isinstance(k, int) else tuple(k)

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[1]
        k = self._ksize()
        w_shape = (self.features, in_dim // self.groups, *k)
        w = self.param("weight", lambda key: general.kaiming_uniform(key, w_shape, dtype=self.param_dtype))
        b = None
        if self.use_bias:
            fan_in = (in_dim // self.groups) * math.prod(k)
            bound = 1 / math.sqrt(fan_in)
            b = self.param(
                "bias",
                lambda key: jax.random.uniform(key, (self.features,), self.param_dtype, -bound, bound),
            )
        dtype = self.dtype or x.dtype
        return general.convnd(
            x.astype(dtype),
            w.astype(dtype),
            None if b is None else b.astype(dtype),
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )

    def lycoris_layer_info(self, params):
        w = params["weight"]
        nd = w.ndim - 2
        return LayerInfo.conv(
            nd,
            w.shape[0],
            w.shape[1] * self.groups,
            w.shape[2:],
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            bias="bias" in params,
        )


class Conv1d(_ConvNd):
    _nd: int = 1


class Conv2d(_ConvNd):
    _nd: int = 2


class Conv3d(_ConvNd):
    _nd: int = 3


class LayerNorm(nn.Module):
    """torch nn.LayerNorm parity (trailing-dim normalization)."""

    dim: int
    eps: float = 1e-5
    use_bias: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k: jnp.ones((self.dim,), self.param_dtype))
        b = self.param("bias", lambda k: jnp.zeros((self.dim,), self.param_dtype)) if self.use_bias else None
        return general.layer_norm(
            x, (self.dim,), w.astype(x.dtype), None if b is None else b.astype(x.dtype), self.eps
        )

    def lycoris_layer_info(self, params):
        return LayerInfo.layer_norm(params["weight"].shape[0], self.eps, "bias" in params)


class RMSNorm(nn.Module):
    """torch nn.RMSNorm / Llama-style ``_norm`` parity (trailing-dim RMS
    normalization, no mean subtraction, no bias by default).

    The reference's Norm algo duck-types these (lycoris/modules/norms.py:37-44)
    and routes the trained delta through ``org_norm(x) * delta_w``
    (norms.py:148-157) — mirrored by ``LayerInfo.rms_norm``'s op."""

    dim: int
    eps: float = 1e-6
    use_bias: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k: jnp.ones((self.dim,), self.param_dtype))
        b = self.param("bias", lambda k: jnp.zeros((self.dim,), self.param_dtype)) if self.use_bias else None
        return general.rms_norm(
            x, (self.dim,), w.astype(x.dtype), None if b is None else b.astype(x.dtype), self.eps
        )

    def lycoris_layer_info(self, params):
        return LayerInfo.rms_norm(params["weight"].shape[0], self.eps, "bias" in params)


class GroupNorm(nn.Module):
    """torch nn.GroupNorm parity (channels-first).

    ``act="silu"`` folds the UNet's norm→silu chain into the layer so the
    fused kernels (ops/group_norm_v2.py, ``LYCORIS_TPU_GN=fused2``) execute
    it in-kernel; on the jnp/dots paths it is applied separately (identical
    numerics). The folded act is recorded in the LayerInfo so NormModule
    keeps reference delta semantics (act on the summed pre-activation)."""

    num_groups: int
    num_channels: int
    eps: float = 1e-5
    use_bias: bool = True
    act: str | None = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k: jnp.ones((self.num_channels,), self.param_dtype))
        b = (
            self.param("bias", lambda k: jnp.zeros((self.num_channels,), self.param_dtype))
            if self.use_bias
            else None
        )
        return general.group_norm_act(
            x, self.num_groups, w.astype(x.dtype), None if b is None else b.astype(x.dtype),
            self.eps, act=self.act,
        )

    def lycoris_layer_info(self, params):
        return LayerInfo.group_norm(
            self.num_groups, self.num_channels, self.eps, "bias" in params, act=self.act
        )
