"""Full (native fine-tune as an adapter) module — TPU-native.

Parity contract with reference lycoris/modules/full.py (FullModule):
- keys ``diff, diff_b`` (det ``diff``); the saved tensors are weight/bias
  deltas (full.py:128-132), and loading converts diff→absolute
  (full.py:134-148).
- the torch version *steals* the org module's weight attribute on apply_to
  (full.py:108-120). In the functional design there is nothing to steal:
  ``weight`` holds the absolute trained weight, initialized to org+0, and the
  org weight is an input to every method — same math, no mutation.
- bypass mode unsupported (full.py:57-70).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import LayerInfo, LycorisBaseModule, rank_dropout_mask


class FullModule(LycorisBaseModule):
    name = "full"
    support_module = frozenset({"linear", "conv1d", "conv2d", "conv3d"})
    weight_list = ["diff", "diff_b"]
    weight_list_det = ["diff"]

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
        rank_dropout_scale=False,
        bypass_mode=None,
        rng=None,
        org_weight=None,
        org_bias=None,
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
            False,
        )
        if bypass_mode:
            raise ValueError("bypass mode is not supported in Full algo.")
        if self.not_supported:
            raise ValueError(f"{self.module_type} is not supported in Full algo.")

        # "diff" storage: zero-init deltas; absolute weight = org + diff.
        self.params["diff"] = jnp.zeros(self.shape, dtype=dtype)
        self.trainable.add("diff")
        self.has_bias = self.layer.has_bias
        if self.has_bias:
            self.params["diff_b"] = jnp.zeros((self.shape[0],), dtype=dtype)
            self.trainable.add("diff_b")

    @classmethod
    def make_module_from_state_dict(cls, lora_name, layer, diff, diff_b):
        fake_layer = layer
        module = cls(lora_name, fake_layer, 1)
        module.params["diff"] = jnp.asarray(diff)
        if diff_b is not None:
            module.params["diff_b"] = jnp.asarray(diff_b)
            module.has_bias = True
            module.trainable.add("diff_b")
        return module

    def get_diff_weight(self, params=None, multiplier=1.0, rng=None, train=False):
        dw = self._p(params, "diff") * multiplier
        db = self._p(params, "diff_b")
        if db is not None:
            db = db * multiplier
        return dw, db

    def get_merged_weight(self, org_weight, org_bias=None, params=None, multiplier=1.0):
        dw, db = self.get_diff_weight(params, multiplier)
        merged_b = org_bias
        if db is not None:
            merged_b = (org_bias if org_bias is not None else 0) + db
        return org_weight + dw, merged_b

    def custom_state_dict(self, params=None):
        src = self.params if params is None else params
        dest = {"diff": src["diff"]}
        if "diff_b" in src:
            dest["diff_b"] = src["diff_b"]
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
        base = org_forward(x)
        dw, db = self.get_diff_weight(params, multiplier)
        if train and self.rank_dropout and rng is not None:
            drop = rank_dropout_mask(
                jax.random.fold_in(rng, 0x72616E6B),
                self.dim,
                self.rank_dropout,
                self.rank_dropout_scale,
                dw.dtype,
            ).reshape(-1, *[1] * (dw.ndim - 1))
            dw = dw * drop
            if db is not None:
                db = db * drop.reshape(-1)
        delta = self.op(x, dw.astype(x.dtype), None if db is None else db.astype(x.dtype))
        return self._module_dropout_mix(rng, train, base, base + delta)
