"""(IA)^3 adapter module — TPU-native.

Parity contract with reference lycoris/modules/ia3.py (IA3Module):
- single learned scale vector on out dim (or in dim when train_on_input),
  zero-init, merged W' = W·(1 + w·mult) (ia3.py:51-75, 91-102).
- keys ``weight, on_input`` (det: ``on_input``).

Fix vs reference (SURVEY §7 do-not-copy): the reference's
``make_module_from_state_dict`` only accepts ``weight`` while weight_list
has two entries, so loading crashes (ia3.py:77-85). Here it accepts both and
restores ``train_on_input`` from the saved buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import LayerInfo, LycorisBaseModule


class IA3Module(LycorisBaseModule):
    name = "ia3"
    support_module = frozenset({"linear", "conv1d", "conv2d", "conv3d"})
    weight_list = ["weight", "on_input"]
    weight_list_det = ["on_input"]

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
        train_on_input=False,
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
            False,
            bypass_mode,
        )
        if self.not_supported:
            raise ValueError(f"{self.module_type} is not supported in IA^3 algo.")

        out_dim, in_dim, *k = self.shape
        train_dim = in_dim if train_on_input else out_dim
        if self.layer.is_conv:
            w_shape = (1, train_dim, *(1 for _ in k))
        else:
            w_shape = (train_dim,)
        self.params["weight"] = jnp.zeros(w_shape, dtype=dtype)
        self.params["on_input"] = jnp.asarray(int(train_on_input))
        self.train_input = train_on_input
        self.trainable.add("weight")

    @classmethod
    def make_module_from_state_dict(cls, lora_name, layer, weight, on_input=None):
        train_on_input = bool(int(np.asarray(on_input))) if on_input is not None else False
        module = cls(lora_name, layer, 1, train_on_input=train_on_input)
        module.params["weight"] = jnp.asarray(weight).reshape(module.params["weight"].shape)
        return module

    def make_weight(self, org_weight, params=None, multiplier=1.0, diff=False):
        weight = self._p(params, "weight") * multiplier + (0 if diff else 1)
        if self.train_input:
            w = weight.reshape(1, -1, *[1] * (org_weight.ndim - 2)) if org_weight.ndim > 2 else weight
            return org_weight * w
        w = weight.reshape(-1, *[1] * (org_weight.ndim - 1))
        return org_weight * w

    def get_diff_weight(self, params=None, multiplier=1.0, org_weight=None, rng=None, train=False):
        return self.make_weight(org_weight, params, multiplier, diff=True), None

    def get_merged_weight(self, org_weight, org_bias=None, params=None, multiplier=1.0):
        return self.make_weight(org_weight, params, multiplier, diff=False), org_bias

    def custom_state_dict(self, params=None):
        src = self.params if params is None else params
        return {"weight": src["weight"], "on_input": src["on_input"]}

    def _bypass(self, x, params, scale, org_forward, diff):
        # activation-path math in activation dtype (bf16 in-train)
        weight = (self._p(params, "weight") * scale + (0 if diff else 1)).astype(x.dtype)
        if self.train_input:
            w = weight.reshape(*weight.shape) if not self.layer.is_conv else weight
            x = x * (w if self.layer.is_conv else weight)
        out = org_forward(x)
        if not self.train_input:
            w = weight if self.layer.is_conv else weight
            out = out * w
        return out

    def bypass_forward_diff(self, x, params=None, scale=1.0, org_forward=None, rng=None, train=False):
        return self._bypass(x, params, scale, org_forward, diff=True)

    def bypass_forward(self, x, params=None, scale=1.0, org_forward=None, rng=None, train=False):
        return self._bypass(x, params, scale, org_forward, diff=False)

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
            out = self.bypass_forward(x, params=params, scale=multiplier, org_forward=org_forward)
            return self._module_dropout_mix(rng, train, org_forward(x), out)
        base = org_forward(x)
        merged = self.get_merged_weight(org_weight, params=params, multiplier=multiplier)[0]
        delta = self.op(x, (merged - org_weight).astype(x.dtype))
        return self._module_dropout_mix(rng, train, base, base + delta)
