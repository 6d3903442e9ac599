"""Norm-layer tuning module — TPU-native.

Parity contract with reference lycoris/modules/norms.py (NormModule):
- trains ``w_norm``/``b_norm`` additive deltas on LayerNorm/GroupNorm
  (norms.py:37-56); delta-pattern forward (norms.py:125-157).
- duck-typed ``_norm`` modules (RMSNorm-likes: DiT qk-norm, T5/Llama norms)
  are accepted via ``module_type == "rmsnorm"`` — the reference accepts any
  module with ``weight`` + ``_norm`` (norms.py:37-44) and routes the delta
  through ``org_norm(x) * delta_w`` (norms.py:148-157), which is exactly
  what ``LayerInfo.op`` computes for rmsnorm layers.
- keys ``w_norm, b_norm`` (det ``w_norm``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import LayerInfo, LycorisBaseModule


class NormModule(LycorisBaseModule):
    name = "norm"
    support_module = frozenset({"layernorm", "groupnorm", "rmsnorm"})
    weight_list = ["w_norm", "b_norm"]
    weight_list_det = ["w_norm"]

    def __init__(
        self,
        lora_name,
        layer: LayerInfo,
        multiplier=1.0,
        rank_dropout=0.0,
        module_dropout=0.0,
        rank_dropout_scale=False,
        rng=None,
        org_weight=None,
        dtype=jnp.float32,
        **kwargs,
    ):
        super().__init__(
            lora_name,
            layer,
            multiplier=multiplier,
            rank_dropout=rank_dropout,
            module_dropout=module_dropout,
            rank_dropout_scale=rank_dropout_scale,
        )
        if self.not_supported:
            return
        dim = self.dim
        self.params["w_norm"] = jnp.zeros((dim,), dtype=dtype)
        self.trainable.add("w_norm")
        if layer.has_bias:
            self.params["b_norm"] = jnp.zeros((dim,), dtype=dtype)
            self.trainable.add("b_norm")

    @classmethod
    def make_module_from_state_dict(cls, lora_name, layer, w_norm, b_norm):
        module = cls(lora_name, layer, 1)
        module.params["w_norm"] = jnp.asarray(w_norm)
        if b_norm is not None:
            module.params["b_norm"] = jnp.asarray(b_norm)
            module.trainable.add("b_norm")
        return module

    def get_diff_weight(self, params=None, multiplier=1.0, rng=None, train=False):
        w = self._p(params, "w_norm") * multiplier
        b = self._p(params, "b_norm")
        if b is not None:
            b = b * multiplier
        return w, b

    def get_merged_weight(self, org_weight, org_bias=None, params=None, multiplier=1.0):
        dw, db = self.get_diff_weight(params, multiplier)
        merged_b = None
        if org_bias is not None:
            merged_b = org_bias + (db if db is not None else 0)
        elif db is not None:
            merged_b = db
        return org_weight + dw.reshape(org_weight.shape), merged_b

    def custom_state_dict(self, params=None):
        src = self.params if params is None else params
        dest = {"w_norm": src["w_norm"]}
        if "b_norm" in src:
            dest["b_norm"] = src["b_norm"]
        return dest

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
        if self.not_supported:
            return org_forward(x)
        dw, db = self.get_diff_weight(params, multiplier)
        db_x = None if db is None else db.astype(x.dtype)
        if self.layer.act is not None and org_weight is not None:
            # act folded into the layer (models/layers.py GroupNorm(act=...)):
            # adapted output is act(gn_{w+dw}(x)); gn is linear in (γ, β)
            # given the stats, so sum the act-less halves and re-apply act
            base = org_forward(x)  # full layer output (act included)
            pre = self.layer.op(
                x, org_weight.astype(x.dtype),
                None if org_bias is None else org_bias.astype(x.dtype),
                with_act=False,
            ) + self.layer.op(x, dw.astype(x.dtype), db_x, with_act=False)
            full = jax.nn.silu(pre) if self.layer.act == "silu" else pre
            return self._module_dropout_mix(rng, train, base, full)
        base = org_forward(x)
        delta = self.op(x, dw.astype(x.dtype), db_x)
        return self._module_dropout_mix(rng, train, base, base + delta)
