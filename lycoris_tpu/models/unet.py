"""SD1.5 / SDXL-style UNet in flax linen — the flagship fine-tune target.

Class names intentionally mirror diffusers (``Transformer2DModel``,
``ResnetBlock2D``, ``Downsample2D``, ``Upsample2D``, ``CrossAttention``) so
every reference preset (config.py:1-196) targets this model unchanged.
Weights are torch layout / channels-first via lycoris_tpu.models.layers, so
adapters attach with zero layout conversion and checkpoints round-trip to
PyTorch naming.

Configs:
- ``sd15_config()``: block_out_channels (320,640,1280,1280), depth-1
  transformers, context 768 — the reference benchmark model
  (docs/Guidelines.md:54-84 trains SD1.x).
- ``sdxl_config()``: (320,640,1280), transformer depths (0,2,10), context
  2048 — the BASELINE config-#4 target.
- ``tiny_unet_config()``: a scaled-down fixture for tests.

Attention uses ``jax.nn.dot_product_attention`` which lowers to the fused
TPU flash-attention kernel when available.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from . import layers as L


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_depth: tuple = (1, 1, 1, 0)  # per down-block; 0 = no attention
    mid_transformer_depth: int = 1
    context_dim: int = 768
    num_heads: int = 8
    head_dim: int | None = None  # diffusers attention_head_dim: when set,
    # heads = channels // head_dim per level (SDXL: 64 → 10/20 heads; the
    # fixed-8-heads alternative gives head_dim 160 at the 1280 level, which
    # exceeds the flash kernel's D ≤ 128 and forces XLA attention with
    # materialized T² logits exactly where SDXL attends most)
    norm_groups: int = 32
    time_embed_dim: int | None = None  # default 4*ch0
    addition_embed_dim: int | None = None  # SDXL: 2816 add_embedding in dim
    remat: Any = False  # False | "transformer" | True (also resnets)
    dtype: Any = jnp.float32

    @property
    def temb_dim(self):
        return self.time_embed_dim or self.block_out_channels[0] * 4


def sd15_config(dtype=jnp.float32, remat=False) -> UNetConfig:
    return UNetConfig(dtype=dtype, remat=remat)


def sdxl_config(dtype=jnp.float32, remat=False) -> UNetConfig:
    return UNetConfig(
        remat=remat,
        block_out_channels=(320, 640, 1280),
        layers_per_block=2,
        transformer_depth=(0, 2, 10),
        mid_transformer_depth=10,
        context_dim=2048,
        head_dim=64,  # diffusers SDXL attention_head_dim (10/20 heads)
        addition_embed_dim=2816,
        dtype=dtype,
    )


def tiny_unet_config(dtype=jnp.float32) -> UNetConfig:
    return UNetConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        transformer_depth=(1, 1),
        mid_transformer_depth=1,
        context_dim=32,
        num_heads=2,
        norm_groups=8,
        dtype=dtype,
    )


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding parity)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedding(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, temb):
        temb = L.Linear(self.cfg.temb_dim, name="linear_1")(temb)
        temb = jax.nn.silu(temb)
        return L.Linear(self.cfg.temb_dim, name="linear_2")(temb)


class CrossAttention(nn.Module):
    """diffusers-style attention: to_q/to_k/to_v (no bias) + to_out.0."""

    query_dim: int
    context_dim: int | None = None
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.query_dim
        head_dim = inner // self.num_heads
        hs = (self.num_heads, head_dim)
        # head_split: projections emit (B, H, T, D) directly — the transpose
        # is fused into the matmul instead of materializing a relayout copy
        from jax.ad_checkpoint import checkpoint_name

        # "qkv_out": the remat="attn_ff_qkv" tier saves the projection
        # outputs so the checkpoint replay skips the to_q/to_k/to_v matmuls
        # (3 of the 12 C²T matmuls the attn_ff replay still recomputes;
        # cross-attn k/v are T_ctx-sized, nearly free to save)
        q = checkpoint_name(
            L.Linear(inner, use_bias=False, name="to_q", head_split=hs)(x), "qkv_out")
        k = checkpoint_name(
            L.Linear(inner, use_bias=False, name="to_k", head_split=hs)(context), "qkv_out")
        v = checkpoint_name(
            L.Linear(inner, use_bias=False, name="to_v", head_split=hs)(context), "qkv_out")
        b, tq = x.shape[0], x.shape[1]
        from ..ops.attention import dot_product_attention as dpa

        # dpa checkpoint-names its output "attn_out" (and, on the custom
        # flash path, the softmax stats "attn_lse") for the remat="attn_out"
        # policy: saving both lets the checkpoint replay skip the flash fwd
        # kernel entirely (ops/flash.py flash_attention_remat)
        o = dpa(q, k, v, layout="BHTD")  # (B, T, H, D)
        o = o.reshape(b, tq, inner)
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(
            L.Linear(inner, name="to_out_0")(o), "attn_proj_out"
        )


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        # GEGLU (diffusers net.0.proj + net.2); custom-vjp gate product — the
        # naive split's backward concat materializes as pad+maximum fusions
        # (19 ms/step on SDXL b4, functional.general.geglu_mul docstring)
        from ..functional.general import geglu_mul

        h = L.Linear(inner * 2, name="net_0_proj")(x)
        h = geglu_mul(h)
        from jax.ad_checkpoint import checkpoint_name

        # "geglu_out" (4C·T — the block's biggest saveable): replay skips the
        # gelu+multiply recompute and net_2's dW reads the saved tensor
        h = checkpoint_name(h, "geglu_out")
        return checkpoint_name(L.Linear(self.dim, name="net_2")(h), "ff_out")


class BasicTransformerBlock(nn.Module):
    dim: int
    context_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        from jax.ad_checkpoint import checkpoint_name

        def norm(name, x):
            return checkpoint_name(L.LayerNorm(self.dim, name=name)(x), "norm_out")

        x = x + CrossAttention(self.dim, None, self.num_heads, self.dtype, name="attn1")(
            norm("norm1", x)
        )
        x = x + CrossAttention(self.dim, self.context_dim, self.num_heads, self.dtype, name="attn2")(
            norm("norm2", x), context
        )
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            norm("norm3", x)
        )
        return x


class Transformer2DModel(nn.Module):
    channels: int
    depth: int
    context_dim: int
    num_heads: int
    norm_groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # x: (B, C, H, W)
        b, c, h, w = x.shape
        residual = x
        x = L.GroupNorm(self.norm_groups, c, eps=1e-6, name="norm")(x)
        x = L.Conv2d(self.channels, kernel_size=1, name="proj_in")(x)
        x = x.reshape(b, self.channels, h * w).transpose(0, 2, 1)  # (B, HW, C)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.channels,
                self.context_dim,
                self.num_heads,
                self.dtype,
                name=f"transformer_blocks_{i}",
            )(x, context)
        x = x.transpose(0, 2, 1).reshape(b, self.channels, h, w)
        x = L.Conv2d(self.channels, kernel_size=1, name="proj_out")(x)
        return x + residual


class ResnetBlock2D(nn.Module):
    out_channels: int
    norm_groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[1]
        h = L.GroupNorm(self.norm_groups, in_ch, eps=1e-5, act="silu", name="norm1")(x)
        h = L.Conv2d(self.out_channels, kernel_size=3, padding=1, name="conv1")(h)
        t = L.Linear(self.out_channels, name="time_emb_proj")(jax.nn.silu(temb))
        h = h + t[:, :, None, None]
        h = L.GroupNorm(self.norm_groups, self.out_channels, eps=1e-5, act="silu", name="norm2")(h)
        h = L.Conv2d(self.out_channels, kernel_size=3, padding=1, name="conv2")(h)
        if in_ch != self.out_channels:
            x = L.Conv2d(self.out_channels, kernel_size=1, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return L.Conv2d(self.channels, kernel_size=3, stride=2, padding=1, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, c, h, w = x.shape
        x = jax.image.resize(x, (b, c, h * 2, w * 2), method="nearest")
        return L.Conv2d(self.channels, kernel_size=3, padding=1, name="conv")(x)


class UNet2DConditionModel(nn.Module):
    """Channels-first conditional UNet (diffusers topology)."""

    cfg: UNetConfig

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, added_cond=None):
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(timesteps, ch0).astype(cfg.dtype)
        temb = TimestepEmbedding(cfg, name="time_embedding")(temb)
        if cfg.addition_embed_dim is not None and added_cond is not None:
            temb = temb + TimestepEmbedding(cfg, name="add_embedding")(added_cond.astype(cfg.dtype))
        temb = temb.astype(cfg.dtype)

        ctx = encoder_hidden_states

        def heads(ch):
            # diffusers attention_head_dim semantics when cfg.head_dim set
            return ch // cfg.head_dim if cfg.head_dim else cfg.num_heads

        # rematerialization: trade recompute for activation HBM
        # (jax.checkpoint via nn.remat; SURVEY "HBM bandwidth" guidance).
        # Named-save tiers (each ~C·T·2 bytes per name per block, vs skipping
        # that op's recompute in the replay):
        #   "attn_out":  attention output + softmax lse — the replayed flash
        #                fwd kernel becomes dead code (ops/flash.py graft)
        #   "attn_ff":   + ff net_2 and attention to_out outputs — the replay
        #                also skips those matmuls (~6 of the 18 C²T matmul
        #                FLOPs per block)
        #   "attn_ff_norm": + the three LayerNorm outputs — the replay skips
        #                norm stats+normalize (VPU/HBM-bound) too
        Resnet = nn.remat(ResnetBlock2D) if cfg.remat is True else ResnetBlock2D
        _TIERS = {
            "attn_out": ("attn_out", "attn_lse"),
            "attn_ff": ("attn_out", "attn_lse", "ff_out", "attn_proj_out"),
            "attn_ff_norm": (
                "attn_out", "attn_lse", "ff_out", "attn_proj_out", "norm_out"
            ),
            "attn_ff_geglu": (
                "attn_out", "attn_lse", "ff_out", "attn_proj_out", "geglu_out"
            ),
            "attn_ff_norm_geglu": (
                "attn_out", "attn_lse", "ff_out", "attn_proj_out", "norm_out",
                "geglu_out",
            ),
            # + q/k/v projection outputs: the replay skips to_q/to_k/to_v
            # (self-attn q,k,v are 3·C·T each; cross-attn q is C·T and its
            # k/v are context-sized, nearly free)
            "attn_ff_qkv": (
                "attn_out", "attn_lse", "ff_out", "attn_proj_out", "qkv_out"
            ),
            "attn_ff_qkv_norm": (
                "attn_out", "attn_lse", "ff_out", "attn_proj_out", "qkv_out",
                "norm_out",
            ),
        }
        if cfg.remat in _TIERS:
            Transformer = nn.remat(
                Transformer2DModel,
                policy=jax.checkpoint_policies.save_only_these_names(
                    *_TIERS[cfg.remat]
                ),
            )
        elif cfg.remat:
            Transformer = nn.remat(Transformer2DModel)
        else:
            Transformer = Transformer2DModel
        h = L.Conv2d(ch0, kernel_size=3, padding=1, name="conv_in")(sample)
        skips = [h]

        # down
        for bi, ch in enumerate(cfg.block_out_channels):
            depth = cfg.transformer_depth[bi]
            for li in range(cfg.layers_per_block):
                h = Resnet(ch, cfg.norm_groups, cfg.dtype, name=f"down_blocks_{bi}_resnets_{li}")(h, temb)
                if depth > 0:
                    h = Transformer(
                        ch, depth, cfg.context_dim, heads(ch), cfg.norm_groups, cfg.dtype,
                        name=f"down_blocks_{bi}_attentions_{li}",
                    )(h, ctx)
                skips.append(h)
            if bi < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, cfg.dtype, name=f"down_blocks_{bi}_downsamplers_0")(h)
                skips.append(h)

        # mid
        mid_ch = cfg.block_out_channels[-1]
        h = Resnet(mid_ch, cfg.norm_groups, cfg.dtype, name="mid_block_resnets_0")(h, temb)
        if cfg.mid_transformer_depth > 0:
            h = Transformer(
                mid_ch, cfg.mid_transformer_depth, cfg.context_dim, heads(mid_ch),
                cfg.norm_groups, cfg.dtype, name="mid_block_attentions_0",
            )(h, ctx)
        h = Resnet(mid_ch, cfg.norm_groups, cfg.dtype, name="mid_block_resnets_1")(h, temb)

        # up
        for bi, ch in reversed(list(enumerate(cfg.block_out_channels))):
            depth = cfg.transformer_depth[bi]
            ui = len(cfg.block_out_channels) - 1 - bi
            for li in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=1)
                h = Resnet(ch, cfg.norm_groups, cfg.dtype, name=f"up_blocks_{ui}_resnets_{li}")(h, temb)
                if depth > 0:
                    h = Transformer(
                        ch, depth, cfg.context_dim, heads(ch), cfg.norm_groups, cfg.dtype,
                        name=f"up_blocks_{ui}_attentions_{li}",
                    )(h, ctx)
            if bi > 0:
                h = Upsample2D(ch, cfg.dtype, name=f"up_blocks_{ui}_upsamplers_0")(h)

        h = L.GroupNorm(cfg.norm_groups, cfg.block_out_channels[0], act="silu", name="conv_norm_out")(h)
        return L.Conv2d(cfg.out_channels, kernel_size=3, padding=1, name="conv_out")(h)
