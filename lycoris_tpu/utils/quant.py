"""Quantized-base support (QLyCORIS) — TPU-native.

Reference: lycoris/utils/quant.py:1-88 + modules/base.py:162-177 — bnb/quanto
linears are auto-detected and the adapter is forced into bypass mode so ΔW
never touches the quantized weight.

TPU equivalent: int8 weight-only quantized Linear/Conv (per-output-channel
scales; the dequant multiply fuses into the XLA matmul epilogue, and jnp.int8
weights halve HBM traffic vs bf16). Adapter math stays bf16/fp32 on the
bypass path. Detection: any layer whose class name is in
:data:`QUANT_CLASSES` (or exposing ``lycoris_quant = True``) gets
``bypass_mode`` forced on by the wrapper, mirroring the reference's
``QuantLinears`` isinstance check.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..logging import logger

QUANT_CLASSES = {
    "Int8Linear",
    "QuantLinear",
    "Linear8bitLt",
    "LinearFP4",
    "LinearNF4",
    "QLinear",
    "WeightOnlyQuantLinear",
}


@functools.cache
def log_bypass():
    return logger.warning(
        "Quantized base layer detected, adapter forced into bypass mode "
        "(ΔW never touches the quantized weight)."
    )


def quantize_int8(w: jax.Array, axis: int = 1):
    """Per-output-channel symmetric int8 quantization of a torch-layout weight."""
    w = jnp.asarray(w)
    reduce_axes = tuple(i for i in range(w.ndim) if i != 0)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_int8(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


class Int8Linear(nn.Module):
    """Weight-only int8 Linear (torch layout) — the QLyCORIS base layer.

    Stores ``weight_q`` (int8) + per-row ``scale``; the dequant multiply is
    a matmul-epilogue fusion for XLA. Use :func:`quantize_linear_params` to
    convert an existing fp Linear's params.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    lycoris_quant: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        wq = self.param("weight_q", lambda k: jnp.zeros((self.features, in_dim), jnp.int8))
        scale = self.param("scale", lambda k: jnp.ones((self.features, 1), jnp.float32))
        b = self.param("bias", lambda k: jnp.zeros((self.features,), jnp.float32)) if self.use_bias else None
        w = dequantize_int8(wq, scale, self.dtype)
        y = jnp.matmul(x.astype(self.dtype), w.T)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y

    def lycoris_layer_info(self, params):
        from ..modules.base import LayerInfo

        wq = params["weight_q"]
        return LayerInfo.linear(wq.shape[0], wq.shape[1], "bias" in params)


def quantize_linear_params(params: dict) -> dict:
    """fp Linear params {'weight','bias'} -> Int8Linear params."""
    q, scale = quantize_int8(params["weight"])
    out = {"weight_q": q, "scale": scale}
    if "bias" in params:
        out["bias"] = jnp.asarray(params["bias"], jnp.float32)
    return out


def is_quant_class(class_name: str) -> bool:
    return class_name in QUANT_CLASSES
