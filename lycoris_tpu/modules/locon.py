"""LoCon/LoRA adapter module — TPU-native.

Parity contract with reference lycoris/modules/locon.py (LoConModule):
- param keys ``lora_down.weight / lora_up.weight / lora_mid.weight / alpha /
  dora_scale`` (locon.py:29-36); detection key ``lora_up.weight``.
- init: kaiming(a=√5) down, zero up (kaiming when use_scalar), kaiming mid,
  scalar 0-init trainable when use_scalar else constant 1 buffer
  (locon.py:150-161).
- scale = alpha / r_factor (rs_lora → √rank), alpha buffer stores
  alpha·(rank/r_factor) (locon.py:138-148).
- make_weight with rank_dropout row-mask (locon.py:198-219), merge semantics
  with DoRA interpolation (locon.py:221-260), custom_state_dict folds scalar
  into lora_up.weight (locon.py:262-271), max-norm scales scalar
  (locon.py:273-284), bypass path with activation rank dropout
  (locon.py:286-307).

All compute is pure in ``(params, x, org_weight, rng)`` so the patched model
remains one jit-traceable function.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..functional.general import (
    kaiming_uniform,
    op_precision,
    rebuild_tucker,
)
from .base import (
    LayerInfo,
    LycorisBaseModule,
    apply_weight_decompose,
    dropout as traced_dropout,
    infer_wd_on_out,
    init_dora_scale,
    rank_dropout_mask,
)


class LoConModule(LycorisBaseModule):
    name = "locon"
    support_module = frozenset({"linear", "conv1d", "conv2d", "conv3d"})
    weight_list = [
        "lora_up.weight",
        "lora_down.weight",
        "lora_mid.weight",
        "alpha",
        "dora_scale",
    ]
    weight_list_det = ["lora_up.weight"]

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
        weight_decompose=False,
        wd_on_out=True,
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
            raise ValueError(f"{self.module_type} is not supported in LoRA/LoCon algo.")
        self.lora_dim = lora_dim
        self.tucker = False
        self.rs_lora = rs_lora
        self.use_scalar = use_scalar
        self.wd = weight_decompose
        self.wd_on_out = wd_on_out

        rng = jax.random.key(0) if rng is None else rng
        k_down, k_up, k_mid = jax.random.split(rng, 3)

        out_dim, in_dim, *k_size = self.shape
        if self.layer.is_conv:
            use_tucker = use_tucker and any(i != 1 for i in k_size)
            if use_tucker:
                down_shape = (lora_dim, in_dim, *(1 for _ in k_size))
                self.params["lora_mid.weight"] = kaiming_uniform(
                    k_mid, (lora_dim, lora_dim, *k_size), dtype=dtype
                )
                self.tucker = True
            else:
                down_shape = (lora_dim, in_dim, *k_size)
            up_shape = (out_dim, lora_dim, *(1 for _ in k_size))
        else:
            down_shape = (lora_dim, in_dim)
            up_shape = (out_dim, lora_dim)

        self.params["lora_down.weight"] = kaiming_uniform(k_down, down_shape, dtype=dtype)
        self.params["lora_up.weight"] = (
            kaiming_uniform(k_up, up_shape, dtype=dtype)
            if use_scalar
            else jnp.zeros(up_shape, dtype=dtype)
        )

        if self.wd:
            if org_weight is None:
                org_weight = jnp.zeros(self.shape, dtype=dtype)
            self.params["dora_scale"] = init_dora_scale(org_weight, wd_on_out)
            self.trainable.add("dora_scale")

        from .base import _as_float

        alpha = _as_float(alpha)
        alpha = lora_dim if alpha == 0.0 else alpha
        r_factor = math.sqrt(lora_dim) if rs_lora else lora_dim
        self.scale = alpha / r_factor
        self.params["alpha"] = jnp.asarray(alpha * (lora_dim / r_factor), dtype=jnp.float32)
        self.params["scalar"] = jnp.asarray(0.0 if use_scalar else 1.0, dtype=dtype)

        self.trainable |= {"lora_down.weight", "lora_up.weight"}
        if self.tucker:
            self.trainable.add("lora_mid.weight")
        if use_scalar:
            self.trainable.add("scalar")

    @classmethod
    def make_module_from_state_dict(cls, lora_name, layer, up, down, mid, alpha, dora_scale):
        module = cls(
            lora_name,
            layer,
            1,
            down.shape[0],
            alpha,
            use_tucker=mid is not None,
            weight_decompose=dora_scale is not None,
            wd_on_out=infer_wd_on_out(dora_scale, layer.shape[0]),
        )
        module.params["lora_up.weight"] = jnp.asarray(up).reshape(
            module.params["lora_up.weight"].shape
        )
        module.params["lora_down.weight"] = jnp.asarray(down).reshape(
            module.params["lora_down.weight"].shape
        )
        if mid is not None:
            module.params["lora_mid.weight"] = jnp.asarray(mid)
        if dora_scale is not None:
            module.params["dora_scale"] = jnp.asarray(dora_scale).reshape(
                module.params["dora_scale"].shape
            )
        return module

    # -- weight reconstruction -------------------------------------------
    def make_weight(self, params=None, rng=None, train=False):
        wa = self._p(params, "lora_up.weight")
        wb = self._p(params, "lora_down.weight")
        if self.tucker:
            t = self._p(params, "lora_mid.weight")
            wa = wa.reshape(wa.shape[0], -1).T
            wb = wb.reshape(wb.shape[0], -1)
            weight = rebuild_tucker(t, wa, wb)
        else:
            weight = jnp.matmul(
                wa.reshape(wa.shape[0], -1),
                wb.reshape(wb.shape[0], -1),
                precision=op_precision(wa, wb),
            )
        weight = weight.reshape(self.shape)
        if train and self.rank_dropout and rng is not None:
            drop = rank_dropout_mask(
                jax.random.fold_in(rng, 0x72616E6B),
                weight.shape[0],
                self.rank_dropout,
                self.rank_dropout_scale,
                weight.dtype,
            ).reshape(-1, *[1] * (weight.ndim - 1))
            weight = weight * drop
        return weight * self._p(params, "scalar")

    def get_diff_weight(self, params=None, multiplier=1.0, rng=None, train=False):
        scale = self.scale * multiplier
        return self.make_weight(params, rng, train) * scale, None

    def get_merged_weight(self, org_weight, org_bias=None, params=None, multiplier=1.0):
        diff = self.get_diff_weight(params, multiplier=1.0)[0].reshape(org_weight.shape)
        if self.wd:
            merged = apply_weight_decompose(
                org_weight + diff, self._p(params, "dora_scale"), self.wd_on_out, multiplier
            )
        else:
            merged = org_weight + diff * multiplier
        return merged, org_bias

    def custom_state_dict(self, params=None):
        src = self.params if params is None else params
        dest = {}
        if self.wd:
            dest["dora_scale"] = src["dora_scale"]
        dest["alpha"] = src["alpha"]
        dest["lora_up.weight"] = src["lora_up.weight"] * src["scalar"]
        dest["lora_down.weight"] = src["lora_down.weight"]
        if self.tucker:
            dest["lora_mid.weight"] = src["lora_mid.weight"]
        return dest

    def apply_max_norm(self, max_norm, params=None):
        src = dict(self.params if params is None else params)
        orig_norm = jnp.linalg.norm(self.make_weight(src).reshape(-1)) * self.scale
        norm = jnp.clip(orig_norm, max_norm / 2)
        desired = jnp.clip(norm, max=max_norm)
        ratio = desired / norm
        scaled = norm != desired
        src["scalar"] = src["scalar"] * jnp.where(scaled, ratio, 1.0)
        return src, scaled, orig_norm * ratio

    # (a fused one-kernel y = x@(W + γ·up@down)ᵀ dispatch existed here; the
    # v5e A/B measured it 23% SLOWER than the merged fast path — see
    # ops/lora_fused.py docstring and docs/Guidelines.md — so the merged
    # path is the unconditional production default)

    def factored_merged_fns(self, multiplier):
        """(recon_fn, dtheta_fn) for the dense-dW-free merged backward
        (functional/merged.py), or None when this config needs the generic
        autodiff path (conv kernels, tucker, DoRA, rank dropout)."""
        if self.layer.is_conv or self.tucker or self.wd or self.rank_dropout:
            return None
        from ..functional.merged import lora_dtheta

        c = self.scale * multiplier

        def recon_fn(theta, out_dtype=None):
            # scale·scalar folded into the (out, r) up factor — an r-column
            # multiply instead of a full (out, in) pass; out_dtype lets the
            # cast fuse into the matmul epilogue so bf16 training never
            # materializes the f32 ΔW.
            wa = self._p(theta, "lora_up.weight") * (self._p(theta, "scalar") * c)
            wb = self._p(theta, "lora_down.weight")
            w = jnp.matmul(wa, wb, precision=op_precision(wa, wb))
            return w if out_dtype is None else w.astype(out_dtype)

        want_scalar = "scalar" in self.trainable

        def dtheta_fn(x2d, dy2d, theta):
            up = self._p(theta, "lora_up.weight")
            down = self._p(theta, "lora_down.weight")
            scalar = self._p(theta, "scalar")
            d_up, d_down, d_s = lora_dtheta(x2d, dy2d, up, down, want_scalar)
            cc = c * scalar
            out = {}
            for k, leaf in theta.items():
                if k == "lora_up.weight":
                    out[k] = (d_up * cc).astype(leaf.dtype)
                elif k == "lora_down.weight":
                    out[k] = (d_down * cc).astype(leaf.dtype)
                elif k == "scalar" and want_scalar:
                    out[k] = (d_s * c).astype(leaf.dtype)
                else:
                    out[k] = jnp.zeros_like(leaf)
            return out

        return recon_fn, dtheta_fn

    # -- forward paths -----------------------------------------------------
    def _down_op(self, x, w, params=None):
        """down conv carries the layer's stride/padding only (locon.py:85-99)."""
        if not self.layer.is_conv:
            from ..functional.general import linear

            return linear(x, w)
        from ..functional.general import convnd

        kw = self.layer.kw
        return convnd(x, w, stride=kw.get("stride", 1), padding=kw.get("padding", 0))

    def _plain_op(self, x, w):
        if not self.layer.is_conv:
            from ..functional.general import linear

            return linear(x, w)
        from ..functional.general import convnd

        return convnd(x, w)

    def bypass_forward_diff(self, x, params=None, scale=1.0, org_forward=None, rng=None, train=False):
        # activation-path math runs in the activation dtype (bf16 in-train);
        # lax.conv rejects mixed operand dtypes outright
        down_w = self._p(params, "lora_down.weight").astype(x.dtype)
        up_w = self._p(params, "lora_up.weight").astype(x.dtype)
        if self.tucker:
            mid = self._down_op(
                self._plain_op(x, down_w),
                self._p(params, "lora_mid.weight").astype(x.dtype),
            )
        else:
            mid = self._down_op(x, down_w)

        if self.rank_dropout and train and rng is not None:
            drop = rank_dropout_mask(
                jax.random.fold_in(rng, 0x72616E6B),
                self.lora_dim,
                self.rank_dropout,
                self.rank_dropout_scale,
                mid.dtype,
            )
            if self.layer.is_conv:
                drop = drop.reshape(1, -1, *[1] * (mid.ndim - 2))
            else:
                drop = drop.reshape(*[1] * (mid.ndim - 1), -1)
            mid = mid * drop

        out = self._plain_op(mid, up_w) * self._p(params, "scalar") * self.scale * scale
        out = out.astype(x.dtype)
        if self.dropout and train and rng is not None:
            out = traced_dropout(jax.random.fold_in(rng, 0x64726F70), out, self.dropout)
        return out

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
        diff_weight = self.make_weight(params, rng, train).astype(org_weight.dtype) * self.scale
        if self.wd:
            new_weight = apply_weight_decompose(
                org_weight + diff_weight, self._p(params, "dora_scale"), self.wd_on_out, multiplier
            )
        else:
            new_weight = org_weight + diff_weight * multiplier
        delta = self.op(x, (new_weight - org_weight).astype(x.dtype))
        return self._module_dropout_mix(rng, train, base, base + delta)
