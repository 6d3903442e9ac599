"""Flux-style DiT blocks in flax linen.

Class names mirror the Flux family (``DoubleStreamBlock``,
``SingleStreamBlock``) so the reference presets that target DiT models
(config.py: full / full-lin / attn-mlp lists) apply unchanged — and mirrors
the reference's use of a tiny Flux config as the wrapper-test fixture
(test/wrapper.py:395-862).

This is a functional DiT: AdaLN-modulated double-stream (image + text)
blocks followed by single-stream blocks, rotary-free (positions are the
caller's concern), channels-last tokens throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from . import layers as L
from .unet import timestep_embedding


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    hidden_size: int = 3072
    num_heads: int = 24
    mlp_ratio: float = 4.0
    depth_double: int = 19
    depth_single: int = 38
    in_channels: int = 64
    context_dim: int = 4096
    qk_norm: bool = True  # Flux applies per-head RMSNorm to q/k (qk-norm)
    dtype: Any = jnp.float32


def flux_config(dtype=jnp.bfloat16) -> DiTConfig:
    return DiTConfig(dtype=dtype)


def tiny_dit_config(dtype=jnp.float32) -> DiTConfig:
    return DiTConfig(
        hidden_size=32, num_heads=2, depth_double=2, depth_single=2,
        in_channels=8, context_dim=16, dtype=dtype,
    )


class Modulation(nn.Module):
    dim: int
    n: int  # number of (shift, scale, gate) triples

    @nn.compact
    def __call__(self, vec):
        out = L.Linear(self.dim * 3 * self.n, name="lin")(jax.nn.silu(vec))
        return jnp.split(out[:, None, :], 3 * self.n, axis=-1)


def _attention(q, k, v, num_heads):
    from ..ops.attention import dot_product_attention as dpa

    b, t, c = q.shape
    hd = c // num_heads
    o = dpa(
        q.reshape(b, t, num_heads, hd),
        k.reshape(b, t, num_heads, hd),
        v.reshape(b, t, num_heads, hd),
    )
    return o.reshape(b, t, c)


class QKNorm(nn.Module):
    """Per-head RMSNorm on q/k (Flux qk-norm). Names mirror Flux
    (``norm.query_norm`` / ``norm.key_norm``) so presets and the Norm algo
    (reference norms.py:37-44 duck-typing) see the expected dotted paths."""

    head_dim: int

    @nn.compact
    def __call__(self, q, k):
        q = L.RMSNorm(self.head_dim, name="query_norm")(q)
        k = L.RMSNorm(self.head_dim, name="key_norm")(k)
        return q, k


class QKV(nn.Module):
    dim: int
    num_heads: int = 0  # >0 enables Flux per-head qk RMSNorm

    @nn.compact
    def __call__(self, x):
        qkv = L.Linear(self.dim * 3, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.num_heads:
            hd = self.dim // self.num_heads
            b, t, _ = q.shape
            q4 = q.reshape(b, t, self.num_heads, hd)
            k4 = k.reshape(b, t, self.num_heads, hd)
            q4, k4 = QKNorm(hd, name="norm")(q4, k4)
            q, k = q4.reshape(b, t, self.dim), k4.reshape(b, t, self.dim)
        return q, k, v


class DoubleStreamBlock(nn.Module):
    """Separate image/text streams with joint attention (Flux layout)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, img, txt, vec):
        c = self.cfg
        d = c.hidden_size
        i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2 = Modulation(d, 2, name="img_mod")(vec)
        t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2 = Modulation(d, 2, name="txt_mod")(vec)

        img_n = L.LayerNorm(d, use_bias=False, name="img_norm1")(img) * (1 + i_scale1) + i_shift1
        txt_n = L.LayerNorm(d, use_bias=False, name="txt_norm1")(txt) * (1 + t_scale1) + t_shift1
        nh = c.num_heads if c.qk_norm else 0
        iq, ik, iv = QKV(d, num_heads=nh, name="img_attn")(img_n)
        tq, tk, tv = QKV(d, num_heads=nh, name="txt_attn")(txt_n)
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        o = _attention(q, k, v, c.num_heads)
        t_len = txt.shape[1]
        txt_o, img_o = o[:, :t_len], o[:, t_len:]
        img = img + i_gate1 * L.Linear(d, name="img_attn_proj")(img_o)
        txt = txt + t_gate1 * L.Linear(d, name="txt_attn_proj")(txt_o)

        mlp = int(d * c.mlp_ratio)
        img_n2 = L.LayerNorm(d, use_bias=False, name="img_norm2")(img) * (1 + i_scale2) + i_shift2
        img = img + i_gate2 * L.Linear(d, name="img_mlp_2")(
            jax.nn.gelu(L.Linear(mlp, name="img_mlp_0")(img_n2), approximate=True)
        )
        txt_n2 = L.LayerNorm(d, use_bias=False, name="txt_norm2")(txt) * (1 + t_scale2) + t_shift2
        txt = txt + t_gate2 * L.Linear(d, name="txt_mlp_2")(
            jax.nn.gelu(L.Linear(mlp, name="txt_mlp_0")(txt_n2), approximate=True)
        )
        return img, txt


class SingleStreamBlock(nn.Module):
    """Fused single-stream block (attention + mlp in one residual)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, vec):
        c = self.cfg
        d = c.hidden_size
        mlp = int(d * c.mlp_ratio)
        shift, scale, gate = Modulation(d, 1, name="modulation")(vec)
        x_n = L.LayerNorm(d, use_bias=False, name="pre_norm")(x) * (1 + scale) + shift
        qkv_mlp = L.Linear(d * 3 + mlp, name="linear1")(x_n)
        qkv, mlp_h = jnp.split(qkv_mlp, [d * 3], axis=-1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if c.qk_norm:
            b, t, _ = q.shape
            hd = d // c.num_heads
            q4 = q.reshape(b, t, c.num_heads, hd)
            k4 = k.reshape(b, t, c.num_heads, hd)
            q4, k4 = QKNorm(hd, name="norm")(q4, k4)
            q, k = q4.reshape(b, t, d), k4.reshape(b, t, d)
        attn = _attention(q, k, v, c.num_heads)
        out = L.Linear(d, name="linear2")(
            jnp.concatenate([attn, jax.nn.gelu(mlp_h, approximate=True)], axis=-1)
        )
        return x + gate * out


class FluxTransformer2D(nn.Module):
    """Minimal Flux-style transformer over (img tokens, txt tokens, t)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, img, txt, timesteps):
        c = self.cfg
        d = c.hidden_size
        img = L.Linear(d, name="img_in")(img)
        txt = L.Linear(d, name="txt_in")(txt)
        vec = timestep_embedding(timesteps, 256).astype(c.dtype)
        vec = L.Linear(d, name="time_in_1")(vec)
        vec = L.Linear(d, name="time_in_2")(jax.nn.silu(vec))

        for i in range(c.depth_double):
            img, txt = DoubleStreamBlock(c, name=f"double_blocks_{i}")(img, txt, vec)
        x = jnp.concatenate([txt, img], axis=1)
        for i in range(c.depth_single):
            x = SingleStreamBlock(c, name=f"single_blocks_{i}")(x, vec)
        x = x[:, txt.shape[1]:]
        shift, scale, _ = Modulation(d, 1, name="final_mod")(vec)
        x = L.LayerNorm(d, use_bias=False, name="final_norm")(x) * (1 + scale) + shift
        return L.Linear(c.in_channels, name="final_proj")(x)
