"""GLoRA adapter module — TPU-native.

Parity contract with reference lycoris/modules/glora.py (GLoRAModule):
- f(x) = WX + W·A(X) + B(X); A = a1·a2 and B = b1·b2 low-rank pairs
  (+ tucker ``bm`` core for convs) (glora.py:47-107).
- keys ``a1.weight, a2.weight, b1.weight, b2.weight, bm.weight, alpha``
  (det ``a1.weight``).
- merged ΔW = (B + W·A)·scale (glora.py:181-198); bypass
  ``org_forward(x + A(x)·scale) + B(x)·scale`` (glora.py:210-238).
- init: a1/b1 kaiming, a2/b2 zero unless use_scalar (glora.py:126-134).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..functional.general import (
    kaiming_uniform,
    op_precision,
    tucker_weight_from_conv,
)
from .base import (
    LayerInfo,
    LycorisBaseModule,
    _as_float,
    dropout as traced_dropout,
    rank_dropout_mask,
)


class GLoRAModule(LycorisBaseModule):
    name = "glora"
    support_module = frozenset({"linear", "conv1d", "conv2d", "conv3d"})
    weight_list = [
        "a1.weight",
        "a2.weight",
        "b1.weight",
        "b2.weight",
        "bm.weight",
        "alpha",
    ]
    weight_list_det = ["a1.weight"]

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
        use_tucker=False,
        use_scalar=False,
        rank_dropout_scale=False,
        bypass_mode=None,
        rs_lora=False,
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
            raise ValueError(f"{self.module_type} is not supported in GLoRA algo.")
        self.lora_dim = lora_dim
        self.tucker = False
        self.rs_lora = rs_lora
        self.use_scalar = use_scalar

        out_dim, in_dim, *k_size = self.shape
        rng = jax.random.key(0) if rng is None else rng
        ka1, ka2, kb1, kb2, kbm = jax.random.split(rng, 5)

        if self.layer.is_conv:
            ones = tuple(1 for _ in k_size)
            # A: in→in bottleneck, always 1x1 (glora.py:83-85)
            a2_shape = (lora_dim, in_dim, *ones)
            a1_shape = (in_dim, lora_dim, *ones)
            # reference quirk: use_tucker is ANDed with all(k==1) (glora.py:80)
            use_tucker = use_tucker and all(i == 1 for i in k_size)
            if use_tucker and any(i != 1 for i in k_size):
                b2_shape = (lora_dim, in_dim, *ones)
                bm_shape = (lora_dim, lora_dim, *k_size)
                self.tucker = True
            else:
                b2_shape = (lora_dim, in_dim, *k_size)
            b1_shape = (out_dim, lora_dim, *ones)
        else:
            a2_shape = (lora_dim, in_dim)
            a1_shape = (in_dim, lora_dim)
            b2_shape = (lora_dim, in_dim)
            b1_shape = (out_dim, lora_dim)

        self.params["a1.weight"] = kaiming_uniform(ka1, a1_shape, dtype=dtype)
        self.params["b1.weight"] = kaiming_uniform(kb1, b1_shape, dtype=dtype)
        if use_scalar:
            self.params["a2.weight"] = kaiming_uniform(ka2, a2_shape, dtype=dtype)
            self.params["b2.weight"] = kaiming_uniform(kb2, b2_shape, dtype=dtype)
        else:
            self.params["a2.weight"] = jnp.zeros(a2_shape, dtype=dtype)
            self.params["b2.weight"] = jnp.zeros(b2_shape, dtype=dtype)
        if self.tucker:
            self.params["bm.weight"] = kaiming_uniform(kbm, bm_shape, dtype=dtype)
            self.trainable.add("bm.weight")

        alpha = _as_float(alpha)
        alpha = lora_dim if alpha == 0.0 else alpha
        r_factor = math.sqrt(lora_dim) if rs_lora else lora_dim
        self.scale = alpha / r_factor
        self.params["alpha"] = jnp.asarray(alpha, dtype=jnp.float32)
        self.params["scalar"] = jnp.asarray(0.0 if use_scalar else 1.0, dtype=dtype)
        self.trainable |= {"a1.weight", "a2.weight", "b1.weight", "b2.weight"}
        if use_scalar:
            self.trainable.add("scalar")

    @classmethod
    def make_module_from_state_dict(cls, lora_name, layer, a1, a2, b1, b2, bm, alpha):
        module = cls(lora_name, layer, 1, a2.shape[0], alpha, use_tucker=bm is not None)
        for key, val in [
            ("a1.weight", a1),
            ("a2.weight", a2),
            ("b1.weight", b1),
            ("b2.weight", b2),
            ("bm.weight", bm),
        ]:
            if val is not None:
                module.params[key] = jnp.asarray(val).reshape(module.params[key].shape)
        return module

    def make_weight(self, org_weight, params=None):
        wa1 = self._p(params, "a1.weight")
        wa2 = self._p(params, "a2.weight")
        wa1 = wa1.reshape(wa1.shape[0], -1)
        wa2 = wa2.reshape(wa2.shape[0], -1)
        if self.tucker:
            wb = tucker_weight_from_conv(
                self._p(params, "b1.weight"),
                self._p(params, "b2.weight"),
                self._p(params, "bm.weight"),
            )
        else:
            wb1 = self._p(params, "b1.weight")
            wb2 = self._p(params, "b2.weight")
            wb = jnp.matmul(
                wb1.reshape(wb1.shape[0], -1),
                wb2.reshape(wb2.shape[0], -1),
                precision=op_precision(wb1, wb2),
            ).reshape(org_weight.shape)
        if org_weight.ndim > 2:
            prec = op_precision(org_weight, wa1)
            w_wa1 = jnp.einsum("oi...,ij->oj...", org_weight, wa1, precision=prec)
            w_wa2 = jnp.einsum("oi...,ij->oj...", w_wa1, wa2, precision=prec)
        else:
            prec = op_precision(org_weight, wa1)
            w_wa2 = jnp.matmul(
                jnp.matmul(org_weight, wa1, precision=prec), wa2, precision=prec
            )
        return (wb + w_wa2) * self.scale * self._p(params, "scalar")

    def get_diff_weight(self, params=None, multiplier=1.0, org_weight=None, rng=None, train=False):
        return self.make_weight(org_weight, params) * multiplier, None

    def get_merged_weight(self, org_weight, org_bias=None, params=None, multiplier=1.0):
        dw, _ = self.get_diff_weight(params, multiplier, org_weight)
        return org_weight + dw, org_bias

    def custom_state_dict(self, params=None):
        src = self.params if params is None else params
        dest = {
            "alpha": src["alpha"],
            "a1.weight": src["a1.weight"],
            "a2.weight": src["a2.weight"] * src["scalar"],
            "b1.weight": src["b1.weight"],
            "b2.weight": src["b2.weight"] * src["scalar"],
        }
        if self.tucker:
            dest["bm.weight"] = src["bm.weight"]
        return dest

    def _plain_op(self, x, w):
        from ..functional.general import convnd, linear

        if self.layer.is_conv:
            return convnd(x, w)
        return linear(x, w)

    def _down_op(self, x, w):
        from ..functional.general import convnd, linear

        if not self.layer.is_conv:
            return linear(x, w)
        kw = self.layer.kw
        if w.shape[2:] == tuple(1 for _ in w.shape[2:]):
            return convnd(x, w)
        return convnd(x, w, stride=kw.get("stride", 1), padding=kw.get("padding", 0))

    def _bypass(self, x, params, scale, org_forward, diff, rng=None, train=False):
        # deviation from reference (glora.py:210-238): the reference scales the
        # A/B paths by self.scale TWICE (mids and outputs) and ignores scalar,
        # making bypass inconsistent with the rebuild path whenever alpha≠rank.
        # We apply the effective scale (α/r · scalar · multiplier) exactly once
        # so bypass ≡ rebuild (module-level diff-vs-bypass parity gate).
        s = self.scale * self._p(params, "scalar") * scale
        # activation-path math in activation dtype (bf16 in-train); lax.conv
        # rejects mixed operand dtypes outright
        ax_mid = self._plain_op(x, self._p(params, "a2.weight").astype(x.dtype))
        bx_mid = self._down_op(x, self._p(params, "b2.weight").astype(x.dtype))

        if self.rank_dropout and train and rng is not None:
            da = rank_dropout_mask(
                jax.random.fold_in(rng, 0x61), self.lora_dim, self.rank_dropout,
                self.rank_dropout_scale, ax_mid.dtype,
            )
            db = rank_dropout_mask(
                jax.random.fold_in(rng, 0x62), self.lora_dim, self.rank_dropout,
                self.rank_dropout_scale, bx_mid.dtype,
            )
            if self.layer.is_conv:
                da = da.reshape(1, -1, *[1] * (ax_mid.ndim - 2))
                db = db.reshape(1, -1, *[1] * (bx_mid.ndim - 2))
            else:
                da = da.reshape(*[1] * (ax_mid.ndim - 1), -1)
                db = db.reshape(*[1] * (bx_mid.ndim - 1), -1)
            ax_mid = ax_mid * da
            bx_mid = bx_mid * db

        a_out = (self._plain_op(ax_mid, self._p(params, "a1.weight").astype(x.dtype)) * s).astype(x.dtype)
        if self.tucker:
            bx_mid = self._down_op(bx_mid, self._p(params, "bm.weight").astype(x.dtype))
        b_out = (self._plain_op(bx_mid, self._p(params, "b1.weight").astype(x.dtype)) * s).astype(x.dtype)
        if self.dropout and train and rng is not None:
            a_out = traced_dropout(jax.random.fold_in(rng, 0x64611), a_out, self.dropout)
            b_out = traced_dropout(jax.random.fold_in(rng, 0x64622), b_out, self.dropout)
        return org_forward((0 if diff else x) + a_out) + b_out

    def bypass_forward_diff(self, x, params=None, scale=1.0, org_forward=None, rng=None, train=False):
        return self._bypass(x, params, scale, org_forward, diff=True, rng=rng, train=train)

    def bypass_forward(self, x, params=None, scale=1.0, org_forward=None, rng=None, train=False):
        return self._bypass(x, params, scale, org_forward, diff=False, rng=rng, train=train)

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
        dw = self.get_diff_weight(params, multiplier, org_weight)[0]
        delta = self.op(x, dw.astype(x.dtype))
        return self._module_dropout_mix(rng, train, base, base + delta)
