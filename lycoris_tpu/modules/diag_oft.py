"""Diag-OFT adapter module — TPU-native.

Parity contract with reference lycoris/modules/diag_oft.py (DiagOFTModule):
- ``block_size, block_num = factorization(out_dim, lora_dim)``
  (diag_oft.py:68); zero-init ``oft_blocks`` [num, b, b], optional trainable
  ``rescale``; ``constraint = constraint·out_dim`` with raw constraint stored
  in the ``alpha`` buffer (diag_oft.py:71-79).
- Cayley get_r (diag_oft.py:118-129), make_weight rotates org-weight output
  blocks, identity at init (diag_oft.py:131-146).
- ``algo_check`` requires ``oft_blocks.ndim == 3`` (diag_oft.py:88-94).
- keys ``oft_blocks, rescale, alpha``.

Fix vs reference (SURVEY §7): the reference `_bypass_forward` references
``out`` before assignment when diff=True (diag_oft.py:190-192); ours computes
the delta correctly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..functional.general import factorization, op_precision
from .base import LayerInfo, LycorisBaseModule, _as_float


class DiagOFTModule(LycorisBaseModule):
    name = "diag-oft"
    support_module = frozenset({"linear", "conv1d", "conv2d", "conv3d"})
    weight_list = ["oft_blocks", "rescale", "alpha"]
    weight_list_det = ["oft_blocks"]

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
        constraint=0,
        rescaled=False,
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
            raise ValueError(f"{self.module_type} is not supported in Diag-OFT algo.")
        out_dim = self.dim
        self.block_size, self.block_num = factorization(out_dim, lora_dim)
        self.rescaled = rescaled
        self.constraint = float(constraint) * out_dim
        self.params["alpha"] = jnp.asarray(float(constraint), dtype=jnp.float32)
        self.params["oft_blocks"] = jnp.zeros(
            (self.block_num, self.block_size, self.block_size), dtype=dtype
        )
        self.trainable.add("oft_blocks")
        if rescaled:
            self.params["rescale"] = jnp.ones(
                (out_dim, *(1 for _ in self.shape[1:])), dtype=dtype
            )
            self.trainable.add("rescale")

    @classmethod
    def algo_check(cls, state_dict, lora_name):
        key = f"{lora_name}.oft_blocks"
        return key in state_dict and np.asarray(state_dict[key]).ndim == 3

    @classmethod
    def make_module_from_state_dict(cls, lora_name, layer, oft_blocks, rescale, alpha):
        n, s, _ = oft_blocks.shape
        module = cls(
            lora_name,
            layer,
            1,
            lora_dim=s,
            constraint=_as_float(alpha),
            rescaled=rescale is not None,
        )
        module.params["oft_blocks"] = jnp.asarray(oft_blocks)
        if rescale is not None:
            module.params["rescale"] = jnp.asarray(rescale).reshape(
                module.params["rescale"].shape
            )
        return module

    def get_r(self, params=None):
        from ..functional.diag_oft import get_r

        return get_r(
            self._p(params, "oft_blocks"),
            jnp.eye(self.block_size, dtype=self._p(params, "oft_blocks").dtype),
            self.constraint if self.constraint > 0 else None,
        )

    def make_weight(self, org_weight, params=None, scale=1.0, diff=False, rng=None, train=False):
        r = self.get_r(params)
        I = jnp.eye(self.block_size, dtype=r.dtype)
        shape = org_weight.shape[1:]
        org = org_weight.astype(r.dtype).reshape(self.block_num, self.block_size, *shape)
        rot = r * scale - scale * I + (0 if diff else I)
        if train and self.rank_dropout and rng is not None:
            from .base import dropout as traced_dropout

            rot = traced_dropout(jax.random.fold_in(rng, 0x72616E6B), r * scale, self.rank_dropout) - scale * I + (
                0 if diff else I
            )
        weight = jnp.einsum(
            "knm,kn...->km...", rot, org, precision=op_precision(rot, org)
        ).reshape(-1, *shape)
        if self.rescaled:
            rescale = self._p(params, "rescale")
            weight = rescale * weight
            if diff:
                weight = weight + (rescale - 1) * org.reshape(-1, *shape)
        return weight.astype(org_weight.dtype)

    def get_diff_weight(self, params=None, multiplier=1.0, org_weight=None, rng=None, train=False):
        return self.make_weight(org_weight, params, scale=multiplier, diff=True), None

    def get_merged_weight(self, org_weight, org_bias=None, params=None, multiplier=1.0):
        return self.make_weight(org_weight, params, scale=multiplier, diff=False), org_bias

    def custom_state_dict(self, params=None):
        src = self.params if params is None else params
        dest = {"oft_blocks": src["oft_blocks"], "alpha": src["alpha"]}
        if self.rescaled:
            dest["rescale"] = src["rescale"]
        return dest

    def apply_max_norm(self, max_norm, params=None):
        src = dict(self.params if params is None else params)
        orig_norm = jnp.linalg.norm(src["oft_blocks"].reshape(-1))
        norm = jnp.clip(orig_norm, max_norm / 2)
        desired = jnp.clip(norm, max=max_norm)
        ratio = desired / norm
        scaled = norm != desired
        src["oft_blocks"] = src["oft_blocks"] * jnp.where(scaled, ratio, 1.0)
        return src, scaled, orig_norm * ratio

    def _bypass(self, x, params, scale, org_forward, diff):
        from ..functional.diag_oft import bypass_forward_diff as f_bypass

        org_out = org_forward(x)
        delta = f_bypass(
            org_out,
            self._p(params, "oft_blocks"),
            self._p(params, "rescale") if self.rescaled else None,
            constraint=self.constraint if self.constraint > 0 else None,
            need_transpose=self.layer.is_conv,
        )
        # the Cayley/rotation math runs in f32 (numerics); the result joins
        # the activation path in the activation dtype
        out = org_out + (delta * scale).astype(org_out.dtype)
        if diff:
            return (delta * scale).astype(org_out.dtype)
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
        new_weight = self.make_weight(org_weight, params, scale=multiplier, rng=rng, train=train)
        delta = self.op(x, (new_weight - org_weight).astype(x.dtype))
        return self._module_dropout_mix(rng, train, base, base + delta)
