"""CLIP-style text encoder in flax linen — TE target for the kohya path.

Class names mirror transformers (``CLIPAttention``, ``CLIPMLP``) and
submodule names mirror transformers' CLIPTextModel layout
(``text_model.encoder.layers.N.self_attn.q_proj`` …) so the reference
text-encoder presets (config.py text_encoder_target_module) and kohya
``lora_te`` key grammar apply unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from . import layers as L


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    dtype: Any = jnp.float32


def clip_l_config(dtype=jnp.float32) -> CLIPConfig:
    return CLIPConfig(dtype=dtype)


def clip_g_config(dtype=jnp.float32) -> CLIPConfig:
    return CLIPConfig(
        hidden_size=1280, intermediate_size=5120, num_layers=32, num_heads=20, dtype=dtype
    )


def tiny_clip_config(dtype=jnp.float32) -> CLIPConfig:
    return CLIPConfig(
        vocab_size=1000, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, max_positions=16, dtype=dtype,
    )


class CLIPAttention(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, x, mask=None):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        q = L.Linear(c.hidden_size, name="q_proj")(x)
        k = L.Linear(c.hidden_size, name="k_proj")(x)
        v = L.Linear(c.hidden_size, name="v_proj")(x)
        b, t, _ = x.shape
        q = q.reshape(b, t, c.num_heads, head_dim)
        k = k.reshape(b, t, c.num_heads, head_dim)
        v = v.reshape(b, t, c.num_heads, head_dim)
        o = jax.nn.dot_product_attention(q, k, v, is_causal=True)
        o = o.reshape(b, t, c.hidden_size)
        return L.Linear(c.hidden_size, name="out_proj")(o)


class CLIPMLP(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, x):
        h = L.Linear(self.cfg.intermediate_size, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=True)
        return L.Linear(self.cfg.hidden_size, name="fc2")(h)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, x):
        x = x + CLIPAttention(self.cfg, name="self_attn")(
            L.LayerNorm(self.cfg.hidden_size, name="layer_norm1")(x)
        )
        x = x + CLIPMLP(self.cfg, name="mlp")(
            L.LayerNorm(self.cfg.hidden_size, name="layer_norm2")(x)
        )
        return x


class CLIPTextModel(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, input_ids):
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            lambda k: jnp.zeros((c.max_positions, c.hidden_size), c.dtype),
        )
        x = tok + pos[None, : input_ids.shape[1]]
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c, name=f"text_model_encoder_layers_{i}")(x)
        return L.LayerNorm(c.hidden_size, name="final_layer_norm")(x)
