"""LoHa adapter module — TPU-native.

Parity contract with reference lycoris/modules/loha.py (LohaModule):
- param keys ``hada_w1_a/b, hada_w2_a/b, hada_t1/t2, alpha, dora_scale``
  (loha.py:18-28); detection key ``hada_w1_a``.
- factor layout: non-tucker ``w1_a (O,r)``/``w1_b (r,I·∏k)``; tucker
  ``wX_a (r,O)``/``wX_b (r,I)`` + cores ``tX (r,r,*k)`` (loha.py:66-99).
- init: w1_b/w2_b std=1, w1_a std=0.1, w2_a zero (kaiming-free; loha.py:144-154);
  use_scalar flips w2_a to std=0.1 + trainable scalar.
- ΔW via the custom-vjp hadamard (functional.loha) with γ=scale; note the
  reference's get_diff_weight double-γ quirk (loha.py:228-233) is kept for
  file-format parity since ΔW=0 at init makes it invisible — documented in
  SURVEY §2.2; forward semantics follow the reference forward path exactly.

No ``factored_merged_fns`` (the dense-dW-free merged backward LoRA/LoKr
have): ΔW = (w1a·w1b) ∘ (w2a·w2b) is ELEMENTWISE in weight space, so every
factor cotangent needs the dense moment M = dyᵀ·x entry-wise — e.g.
d(w1a)[o,r] = Σ_i M[o,i]·W2[o,i]·w1b[r,i]. Reordering that contraction to
avoid materializing M costs N·out·in·r FLOPs (the three-operand i-sum per
(n,o,r)) vs the single N·out·in dense matmul — r× MORE work, not less.
Plain autodiff (one MXU dW matmul, 81% MXU measured, + the hada VJP) is
the optimum here. The r4 LoHa perf pass instead fused the hada VJP itself:
the single-pass `fused1` backward kernel (ops/hada.py, default) lifted
SDXL LoHa 1.0534→1.1146 and SD1.5 LoHa 5.4927→5.6906 — see the
docs/Guidelines.md flag matrix (`LYCORIS_TPU_HADA_BWD`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..functional import loha as F_loha
from .base import (
    LayerInfo,
    LycorisBaseModule,
    _as_float,
    apply_weight_decompose,
    dropout as traced_dropout,
    infer_wd_on_out,
    init_dora_scale,
    rank_dropout_mask,
)


class LohaModule(LycorisBaseModule):
    name = "loha"
    support_module = frozenset({"linear", "conv1d", "conv2d", "conv3d"})
    weight_list = [
        "hada_w1_a",
        "hada_w1_b",
        "hada_w2_a",
        "hada_w2_b",
        "hada_t1",
        "hada_t2",
        "alpha",
        "dora_scale",
    ]
    weight_list_det = ["hada_w1_a"]

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
            raise ValueError(f"{self.module_type} is not supported in LoHa algo.")
        self.lora_dim = lora_dim
        self.rs_lora = rs_lora
        self.use_scalar = use_scalar
        self.wd = weight_decompose
        self.wd_on_out = wd_on_out

        out_dim, in_dim, *k_size = self.shape
        self.tucker = self.layer.is_conv and use_tucker and any(i != 1 for i in k_size)
        if self.layer.is_conv and not self.tucker:
            w_shape = (out_dim, in_dim * math.prod(k_size))
        else:
            w_shape = (out_dim, in_dim)

        rng = jax.random.key(0) if rng is None else rng
        k1a, k1b, k2a, k2b, kt1, kt2 = jax.random.split(rng, 6)

        def normal(k, shape, std):
            return jax.random.normal(k, shape, dtype=dtype) * std

        if self.tucker:
            self.params["hada_t1"] = normal(kt1, (lora_dim, lora_dim, *k_size), 0.1)
            self.params["hada_t2"] = normal(kt2, (lora_dim, lora_dim, *k_size), 0.1)
            self.params["hada_w1_a"] = normal(k1a, (lora_dim, w_shape[0]), 0.1)
            self.params["hada_w1_b"] = normal(k1b, (lora_dim, w_shape[1]), 1.0)
            self.params["hada_w2_a"] = (
                normal(k2a, (lora_dim, w_shape[0]), 0.1)
                if use_scalar
                else jnp.zeros((lora_dim, w_shape[0]), dtype=dtype)
            )
            self.params["hada_w2_b"] = normal(k2b, (lora_dim, w_shape[1]), 1.0)
        else:
            self.params["hada_w1_a"] = normal(k1a, (w_shape[0], lora_dim), 0.1)
            self.params["hada_w1_b"] = normal(k1b, (lora_dim, w_shape[1]), 1.0)
            self.params["hada_w2_a"] = (
                normal(k2a, (w_shape[0], lora_dim), 0.1)
                if use_scalar
                else jnp.zeros((w_shape[0], lora_dim), dtype=dtype)
            )
            self.params["hada_w2_b"] = normal(k2b, (lora_dim, w_shape[1]), 1.0)

        if self.wd:
            if org_weight is None:
                org_weight = jnp.zeros(self.shape, dtype=dtype)
            self.params["dora_scale"] = init_dora_scale(org_weight, wd_on_out)
            self.trainable.add("dora_scale")

        alpha = _as_float(alpha)
        alpha = lora_dim if alpha == 0.0 else alpha
        r_factor = math.sqrt(lora_dim) if rs_lora else lora_dim
        self.scale = alpha / r_factor
        self.params["alpha"] = jnp.asarray(alpha * (lora_dim / r_factor), dtype=jnp.float32)
        self.params["scalar"] = jnp.asarray(0.0 if use_scalar else 1.0, dtype=dtype)

        self.trainable |= {"hada_w1_a", "hada_w1_b", "hada_w2_a", "hada_w2_b"}
        if self.tucker:
            self.trainable |= {"hada_t1", "hada_t2"}
        if use_scalar:
            self.trainable.add("scalar")

    @classmethod
    def make_module_from_state_dict(
        cls, lora_name, layer, w1a, w1b, w2a, w2b, t1, t2, alpha, dora_scale
    ):
        module = cls(
            lora_name,
            layer,
            1,
            w1b.shape[0],
            alpha,
            use_tucker=t1 is not None,
            weight_decompose=dora_scale is not None,
            wd_on_out=infer_wd_on_out(dora_scale, layer.shape[0]),
        )
        for key, val in [
            ("hada_w1_a", w1a),
            ("hada_w1_b", w1b),
            ("hada_w2_a", w2a),
            ("hada_w2_b", w2b),
            ("hada_t1", t1),
            ("hada_t2", t2),
            ("dora_scale", dora_scale),
        ]:
            if val is not None:
                module.params[key] = jnp.asarray(val)
        return module

    # -- weight reconstruction ---------------------------------------------
    def get_weight(self, params=None, rng=None, train=False):
        if self.tucker:
            weight = F_loha.diff_weight(
                self._p(params, "hada_w1_b"),
                self._p(params, "hada_w1_a"),
                self._p(params, "hada_w2_b"),
                self._p(params, "hada_w2_a"),
                self._p(params, "hada_t1"),
                self._p(params, "hada_t2"),
                gamma=self.scale,
            )
        else:
            weight = F_loha.diff_weight(
                self._p(params, "hada_w1_b"),
                self._p(params, "hada_w1_a"),
                self._p(params, "hada_w2_b"),
                self._p(params, "hada_w2_a"),
                None,
                None,
                gamma=self.scale,
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
        return weight

    def get_diff_weight(self, params=None, multiplier=1.0, rng=None, train=False):
        # Deviation from the reference (loha.py:228-233): the reference
        # multiplies get_weight (already γ-scaled) by scale AGAIN on the merge
        # path, so merge-then-run ≠ run-with-adapter whenever alpha≠rank. We
        # use forward/webui semantics — ΔW = (α/r)·(w1a@w1b ⊙ w2a@w2b)·scalar
        # — per SURVEY §7's do-not-copy list.
        diff = self.get_weight(params, rng, train) * self._p(params, "scalar")
        return diff * multiplier, None

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
        dest = {"alpha": src["alpha"]}
        if self.wd:
            dest["dora_scale"] = src["dora_scale"]
        dest["hada_w1_a"] = src["hada_w1_a"] * src["scalar"]
        dest["hada_w1_b"] = src["hada_w1_b"]
        dest["hada_w2_a"] = src["hada_w2_a"]
        dest["hada_w2_b"] = src["hada_w2_b"]
        if self.tucker:
            dest["hada_t1"] = src["hada_t1"]
            dest["hada_t2"] = src["hada_t2"]
        return dest

    def apply_max_norm(self, max_norm, params=None):
        src = dict(self.params if params is None else params)
        orig_norm = jnp.linalg.norm((self.get_weight(src) * src["scalar"]).reshape(-1))
        norm = jnp.clip(orig_norm, max_norm / 2)
        desired = jnp.clip(norm, max=max_norm)
        ratio = desired / norm
        scaled = norm != desired
        src["scalar"] = src["scalar"] * jnp.where(scaled, ratio, 1.0)
        return src, scaled, orig_norm * ratio

    # -- forward paths --------------------------------------------------------
    def bypass_forward_diff(self, x, params=None, scale=1.0, org_forward=None, rng=None, train=False):
        diff_weight = self.get_weight(params, rng, train) * self._p(params, "scalar") * scale
        out = self.op(x, diff_weight.astype(x.dtype))
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
        diff_weight = self.get_weight(params, rng, train).astype(org_weight.dtype) * self._p(
            params, "scalar"
        )
        if self.wd:
            new_weight = apply_weight_decompose(
                org_weight + diff_weight, self._p(params, "dora_scale"), self.wd_on_out, multiplier
            )
        else:
            new_weight = org_weight + diff_weight * multiplier
        delta = self.op(x, (new_weight - org_weight).astype(x.dtype))
        return self._module_dropout_mix(rng, train, base, base + delta)
