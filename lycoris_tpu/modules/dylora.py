"""DyLoRA adapter module — TPU-native.

Parity contract with reference lycoris/modules/dylora.py (DyLoraModule):
- LoRA split into ``block_count = lora_dim/block_size`` row/col blocks; each
  training step samples a block count ``b`` and rebuilds the weight from
  blocks 0..b, with gradients flowing ONLY to block b (dylora.py:52-110).
- ``custom_state_dict`` concatenates blocks into standard ``lora_up/lora_down``
  keys (dylora.py:84-95); DyLoRA declares no ``weight_list`` so saved files
  round-trip as LoCon (kept for file compat; SURVEY §7).
- the effective scale for block count b is alpha/(b+1) (dylora.py:97-110).

TPU-native change: the reference's host-side ``random.randint`` + dynamic
concatenation become a traced block index with static shapes — the full
(lora_dim)-sized factors are masked per step, and ``stop_gradient`` restricts
updates to the sampled block (same math, jit-safe; SURVEY hard-part #6).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..functional.general import kaiming_uniform, op_precision
from .base import LayerInfo, LycorisBaseModule, _as_float


class DyLoraModule(LycorisBaseModule):
    name = "dylora"
    support_module = frozenset({"linear", "conv1d", "conv2d", "conv3d"})
    # no weight_list: like the reference, saved files are detected as LoCon.
    weight_list = []
    weight_list_det = []

    def __init__(
        self,
        lora_name,
        layer: LayerInfo,
        multiplier=1.0,
        lora_dim=4,
        alpha=1,
        dropout=0.0,
        rank_dropout=0.0,
        module_dropout=0.0,
        block_size=4,
        rank_dropout_scale=False,
        bypass_mode=None,
        rng=None,
        org_weight=None,
        dtype=jnp.float32,
        **kwargs,
    ):
        super().__init__(
            lora_name,
            layer,
            multiplier,
            dropout,
            rank_dropout,
            module_dropout,
            rank_dropout_scale,
            bypass_mode,
        )
        if self.not_supported:
            raise ValueError(f"{self.module_type} is not supported in DyLoRA algo.")
        assert lora_dim % block_size == 0, "lora_dim must be a multiple of block_size"
        self.block_count = lora_dim // block_size
        self.block_size = block_size
        self.lora_dim = lora_dim

        out_dim = self.shape[0]
        in_flat = math.prod(self.shape[1:])
        rng = jax.random.key(0) if rng is None else rng
        kd, _ = jax.random.split(rng)
        # per-block kaiming on the down rows (reference inits each block
        # (block_size, in_flat) independently — same distribution as one
        # (lora_dim, in_flat) kaiming since fan_in is identical)
        self.params["lora_down.weight"] = kaiming_uniform(kd, (lora_dim, in_flat), dtype=dtype)
        self.params["lora_up.weight"] = jnp.zeros((out_dim, lora_dim), dtype=dtype)

        alpha = _as_float(alpha)
        alpha = lora_dim if alpha == 0.0 else alpha
        self.scale = alpha / lora_dim
        self.params["alpha"] = jnp.asarray(alpha, dtype=jnp.float32)
        self.trainable |= {"lora_down.weight", "lora_up.weight"}

    @classmethod
    def make_module_from_state_dict(cls, lora_name, layer, *weights):
        raise NotImplementedError  # DyLoRA files load as LoCon (reference behavior)

    def custom_state_dict(self, params=None):
        src = self.params if params is None else params
        return {
            "alpha": src["alpha"],
            "lora_up.weight": src["lora_up.weight"],
            "lora_down.weight": src["lora_down.weight"].reshape(
                self.lora_dim, -1, *self.shape[2:]
            ),
        }

    def load_state_dict(self, sd):
        # reference quirk: DyLoRA's load_state_dict is a no-op (dylora.py:81-82)
        return

    def _masked_factors(self, params, b):
        """Blocks 0..b active; only block b gets gradients; rest zeroed."""
        down = self._p(params, "lora_down.weight")
        up = self._p(params, "lora_up.weight")
        blk = jnp.arange(self.lora_dim) // self.block_size
        active = (blk <= b).astype(down.dtype)
        grad_blk = (blk == b).astype(down.dtype)
        frozen_blk = active - grad_blk
        down_eff = down * grad_blk[:, None] + jax.lax.stop_gradient(down) * frozen_blk[:, None]
        up_eff = up * grad_blk[None, :] + jax.lax.stop_gradient(up) * frozen_blk[None, :]
        return down_eff, up_eff

    def get_weight(self, params=None, b=None):
        if b is None:
            b = self.block_count - 1
        down, up = self._masked_factors(params, b)
        gamma = self._p(params, "alpha") / (b + 1)
        return down, up, gamma

    def get_diff_weight(self, params=None, multiplier=1.0, rng=None, train=False, rank=None):
        if rank is not None:
            b = math.ceil(rank / self.block_size)
        elif train and rng is not None:
            b = jax.random.randint(
                jax.random.fold_in(rng, 0x64796C6F), (), 0, self.block_count
            )
        else:
            b = self.block_count - 1
        down, up, gamma = self.get_weight(params, b)
        w = jnp.matmul(
            up, down * (gamma * multiplier), precision=op_precision(up, down)
        )
        return w.reshape(self.shape), None

    def get_merged_weight(self, org_weight, org_bias=None, params=None, multiplier=1.0):
        dw, _ = self.get_diff_weight(params, multiplier)
        return org_weight + dw.reshape(org_weight.shape), org_bias

    def bypass_forward_diff(self, x, params=None, scale=1.0, org_forward=None, rng=None, train=False):
        if train and rng is not None:
            b = jax.random.randint(
                jax.random.fold_in(rng, 0x64796C6F), (), 0, self.block_count
            )
        else:
            b = self.block_count - 1
        down, up, gamma = self.get_weight(params, b)
        down = down.reshape(self.lora_dim, -1, *self.shape[2:])
        up = up.reshape(-1, self.lora_dim, *(1 for _ in self.shape[2:]))
        return self._chain(x, down, up, gamma * scale)

    def _chain(self, x, down, up, gamma):
        from ..functional.general import convnd, linear

        if self.layer.is_conv:
            kw = self.layer.kw
            mid = convnd(x, down.astype(x.dtype), stride=kw.get("stride", 1), padding=kw.get("padding", 0))
            out = convnd(mid, up.astype(x.dtype))
        else:
            mid = linear(x, down.astype(x.dtype))
            out = linear(mid, up.astype(x.dtype))
        return out * gamma

    def forward(
        self,
        x,
        org_weight=None,
        org_bias=None,
        params=None,
        multiplier=None,
        train=False,
        rng=None,
        org_forward=None,
    ):
        multiplier = self.multiplier if multiplier is None else multiplier
        if org_forward is None:
            org_forward = self._default_org_forward(org_weight, org_bias)
        if self.bypass_mode:
            out = self.bypass_forward(
                x, params=params, scale=multiplier, org_forward=org_forward, rng=rng, train=train
            )
            return self._module_dropout_mix(rng, train, org_forward(x), out)
        base = org_forward(x)
        dw = self.get_diff_weight(params, multiplier, rng=rng, train=train)[0]
        delta = self.op(x, dw.astype(x.dtype))
        return self._module_dropout_mix(rng, train, base, base + delta)
