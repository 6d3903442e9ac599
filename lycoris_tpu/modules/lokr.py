"""LoKr (Kronecker) adapter module — TPU-native.

Parity contract with reference lycoris/modules/lokr.py (LokrModule):
- param keys ``lokr_w1, lokr_w1_a/b, lokr_w2, lokr_w2_a/b, lokr_t2, alpha,
  dora_scale`` (lokr.py:31-43); detection ``lokr_w1`` OR ``lokr_w1_a``.
- factorization/branch structure incl. decompose_both, full_matrix,
  unbalanced_factorization, forced-full when rank ≥ max(b,d)/2
  (lokr.py:89-173); alpha forced to rank when both w1,w2 full
  (lokr.py:209-211).
- init table lokr.py:226-244 (zero on the "big" factor so ΔW=0 at init).
- ``make_module_from_state_dict`` re-infers factor from stored shapes
  (lokr.py:246-342) — reproduced exactly for checkpoint compat.
- max-norm distributes ratio^(1/n_factors) across factors (lokr.py:442-466).

Deviations (documented, SURVEY §7 do-not-copy list):
- module-level conv bypass: the reference's w2-LoRA conv branch crashes on a
  bad ``view`` (lokr.py:483: numel mismatch for k≠1); we delegate to the
  correct grouped-matmul functional path instead.
- bypass output is scaled by α/r·scalar·multiplier, consistent with the
  rebuild path (the reference bypass omits α/r — lokr.py:538).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..functional.general import factorization, kaiming_uniform, op_precision, rebuild_tucker
from ..functional.lokr import bypass_diff_with_scale, make_kron
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


class LokrModule(LycorisBaseModule):
    name = "kron"
    support_module = frozenset({"linear", "conv1d", "conv2d", "conv3d"})
    weight_list = [
        "lokr_w1",
        "lokr_w1_a",
        "lokr_w1_b",
        "lokr_w2",
        "lokr_w2_a",
        "lokr_w2_b",
        "lokr_t1",
        "lokr_t2",
        "alpha",
        "dora_scale",
    ]
    weight_list_det = ["lokr_w1", "lokr_w1_a"]

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
        decompose_both=False,
        factor: int = -1,
        rank_dropout_scale=False,
        weight_decompose=False,
        wd_on_out=True,
        full_matrix=False,
        bypass_mode=None,
        rs_lora=False,
        unbalanced_factorization=False,
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
            raise ValueError(f"{self.module_type} is not supported in LoKr algo.")

        factor = int(factor)
        self.lora_dim = lora_dim
        self.tucker = False
        self.use_w1 = False
        self.use_w2 = False
        self.full_matrix = full_matrix
        self.rs_lora = rs_lora
        self.use_scalar = use_scalar
        self.wd = weight_decompose
        self.wd_on_out = wd_on_out

        out_dim, in_dim_g, *k_size = self.shape
        in_dim = in_dim_g  # torch layout already divides by groups
        in_m, in_n = factorization(in_dim, factor)
        out_l, out_k = factorization(out_dim, factor)
        if unbalanced_factorization:
            out_l, out_k = out_k, out_l
        # ((a, b), (c, d)): out = a*c... naming follows the reference comments
        shape = ((out_l, out_k), (in_m, in_n))
        self.kron_shape = shape

        rng = jax.random.key(0) if rng is None else rng
        keys = jax.random.split(rng, 5)

        if self.layer.is_conv:
            self.tucker = use_tucker and any(i != 1 for i in k_size)
            if decompose_both and lora_dim < max(shape[0][0], shape[1][0]) / 2 and not full_matrix:
                w1a_shape, w1b_shape = (shape[0][0], lora_dim), (lora_dim, shape[1][0])
            else:
                self.use_w1 = True
                w1_shape = (shape[0][0], shape[1][0])
            if lora_dim >= max(shape[0][1], shape[1][1]) / 2 or full_matrix:
                self.use_w2 = True
                w2_shape = (shape[0][1], shape[1][1], *k_size)
            elif self.tucker:
                t2_shape = (lora_dim, lora_dim, *k_size)
                w2a_shape = (lora_dim, shape[0][1])
                w2b_shape = (lora_dim, shape[1][1])
            else:
                w2a_shape = (shape[0][1], lora_dim)
                w2b_shape = (lora_dim, shape[1][1] * math.prod(k_size))
        else:
            if decompose_both and lora_dim < max(shape[0][0], shape[1][0]) / 2 and not full_matrix:
                w1a_shape, w1b_shape = (shape[0][0], lora_dim), (lora_dim, shape[1][0])
            else:
                self.use_w1 = True
                w1_shape = (shape[0][0], shape[1][0])
            if lora_dim < max(shape[0][1], shape[1][1]) / 2 and not full_matrix:
                w2a_shape = (shape[0][1], lora_dim)
                w2b_shape = (lora_dim, shape[1][1])
            else:
                self.use_w2 = True
                w2_shape = (shape[0][1], shape[1][1])

        if self.use_w2:
            self.params["lokr_w2"] = (
                kaiming_uniform(keys[2], w2_shape, dtype=dtype)
                if use_scalar
                else jnp.zeros(w2_shape, dtype=dtype)
            )
        else:
            if self.tucker:
                self.params["lokr_t2"] = kaiming_uniform(keys[2], t2_shape, dtype=dtype)
            self.params["lokr_w2_a"] = kaiming_uniform(keys[3], w2a_shape, dtype=dtype)
            self.params["lokr_w2_b"] = (
                kaiming_uniform(keys[4], w2b_shape, dtype=dtype)
                if use_scalar
                else jnp.zeros(w2b_shape, dtype=dtype)
            )

        if self.use_w1:
            self.params["lokr_w1"] = kaiming_uniform(keys[0], w1_shape, dtype=dtype)
        else:
            self.params["lokr_w1_a"] = kaiming_uniform(keys[0], w1a_shape, dtype=dtype)
            self.params["lokr_w1_b"] = kaiming_uniform(keys[1], w1b_shape, dtype=dtype)

        if self.wd:
            if org_weight is None:
                org_weight = jnp.zeros(self.shape, dtype=dtype)
            self.params["dora_scale"] = init_dora_scale(org_weight, wd_on_out)
            self.trainable.add("dora_scale")

        alpha = _as_float(alpha)
        alpha = lora_dim if alpha == 0.0 else alpha
        if self.use_w1 and self.use_w2:
            alpha = lora_dim  # scale = 1 (lokr.py:209-211)
        r_factor = math.sqrt(lora_dim) if rs_lora else lora_dim
        self.scale = alpha / r_factor
        self.params["alpha"] = jnp.asarray(alpha * (lora_dim / r_factor), dtype=jnp.float32)
        self.params["scalar"] = jnp.asarray(0.0 if use_scalar else 1.0, dtype=dtype)

        for k in ("lokr_w1", "lokr_w1_a", "lokr_w1_b", "lokr_w2", "lokr_w2_a", "lokr_w2_b", "lokr_t2"):
            if k in self.params:
                self.trainable.add(k)
        if use_scalar:
            self.trainable.add("scalar")

    # -- checkpoint re-inference (lokr.py:246-342) --------------------------
    @classmethod
    def make_module_from_state_dict(
        cls, lora_name, layer, w1, w1a, w1b, w2, w2a, w2b, _t1, t2, alpha, dora_scale
    ):
        full_matrix = False
        # tucker layout stores w2a as (rank, b) / w2b as (rank, d) — the
        # reference reads w2a.size(1) regardless and so mis-infers rank on
        # tucker files (lokr.py:263-269); dispatch on t2 presence instead
        tucker = t2 is not None
        if w1a is not None:
            lora_dim = w1a.shape[1]
        elif w2a is not None:
            lora_dim = w2a.shape[0] if tucker else w2a.shape[1]
        else:
            full_matrix = True
            lora_dim = 1

        if w1 is None:
            out_dim, in_dim = w1a.shape[0], w1b.shape[1]
        else:
            out_dim, in_dim = w1.shape
        shape_s = [out_dim, in_dim]
        if w2 is None:
            out_dim *= w2a.shape[1] if tucker else w2a.shape[0]
            in_dim *= w2b.shape[1]
        else:
            out_dim *= w2.shape[0]
            in_dim *= w2.shape[1]

        if shape_s[0] == factorization(out_dim, -1)[0] and shape_s[1] == factorization(in_dim, -1)[0]:
            factor = -1
        else:
            w1_shape = tuple(w1.shape) if w1 is not None else (w1a.shape[0], w1b.shape[1])
            if w2 is not None:
                w2_shape = tuple(w2.shape[:2])
            elif tucker:
                w2_shape = (w2a.shape[1], w2b.shape[1])
            else:
                w2_shape = (w2a.shape[0], w2b.shape[1])
            shape_group_1 = (w1_shape[0], w2_shape[0])
            shape_group_2 = (w1_shape[1], w2_shape[1])
            w_shape = (w1_shape[0] * w2_shape[0], w1_shape[1] * w2_shape[1])
            factor1 = max(w1_shape) if w1 is not None else max(w1a.shape[0], w1b.shape[1])
            factor2 = max(w2_shape)
            if (
                w_shape[0] % factor1 == 0
                and w_shape[1] % factor1 == 0
                and factor1 in shape_group_1
                and factor1 in shape_group_2
            ):
                factor = factor1
            elif (
                w_shape[0] % factor2 == 0
                and w_shape[1] % factor2 == 0
                and factor2 in shape_group_1
                and factor2 in shape_group_2
            ):
                factor = factor2
            else:
                factor = min(factor1, factor2)

        module = cls(
            lora_name,
            layer,
            1,
            lora_dim,
            alpha,
            use_tucker=t2 is not None,
            decompose_both=w1 is None and w2 is None,
            factor=factor,
            weight_decompose=dora_scale is not None,
            wd_on_out=infer_wd_on_out(dora_scale, layer.shape[0]),
            full_matrix=full_matrix,
        )
        for key, val in [
            ("lokr_w1", w1),
            ("lokr_w1_a", w1a),
            ("lokr_w1_b", w1b),
            ("lokr_w2", w2),
            ("lokr_w2_a", w2a),
            ("lokr_w2_b", w2b),
            ("lokr_t2", t2),
            ("dora_scale", dora_scale),
        ]:
            if val is not None:
                v = jnp.asarray(val)
                if key in module.params and module.params[key].shape != v.shape:
                    v = v.reshape(module.params[key].shape)
                module.params[key] = v
        return module

    # -- weight reconstruction -----------------------------------------------
    def _rebuild_w1(self, params):
        if self.use_w1:
            return self._p(params, "lokr_w1")
        a, b = self._p(params, "lokr_w1_a"), self._p(params, "lokr_w1_b")
        return jnp.matmul(a, b, precision=op_precision(a, b))

    def _rebuild_w2(self, params):
        if self.use_w2:
            return self._p(params, "lokr_w2")
        a, b = self._p(params, "lokr_w2_a"), self._p(params, "lokr_w2_b")
        if self.tucker:
            return rebuild_tucker(self._p(params, "lokr_t2"), a, b)
        return jnp.matmul(a, b, precision=op_precision(a, b))

    def get_weight(self, params=None, rng=None, train=False):
        weight = make_kron(self._rebuild_w1(params), self._rebuild_w2(params), self.scale)
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
        # Deviation from the reference (lokr.py:383-388): forward/webui merge
        # semantics — ΔW = (α/r)·(w1 ⊗ w2)·scalar, no double-scale — so
        # merge-then-run == run-with-adapter (SURVEY §7 do-not-copy list).
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
        if self.use_w1:
            dest["lokr_w1"] = src["lokr_w1"] * src["scalar"]
        else:
            dest["lokr_w1_a"] = src["lokr_w1_a"] * src["scalar"]
            dest["lokr_w1_b"] = src["lokr_w1_b"]
        if self.use_w2:
            dest["lokr_w2"] = src["lokr_w2"]
        else:
            dest["lokr_w2_a"] = src["lokr_w2_a"]
            dest["lokr_w2_b"] = src["lokr_w2_b"]
            if self.tucker:
                dest["lokr_t2"] = src["lokr_t2"]
        return dest

    def apply_max_norm(self, max_norm, params=None):
        src = dict(self.params if params is None else params)
        orig_norm = jnp.linalg.norm(self.get_weight(src).reshape(-1))
        norm = jnp.clip(orig_norm, max_norm / 2)
        desired = jnp.clip(norm, max=max_norm)
        ratio = desired / norm
        scaled = norm != desired
        n_factors = 4 - self.use_w1 - self.use_w2 + (not self.use_w2 and self.tucker)
        r = jnp.where(scaled, ratio ** (1 / n_factors), 1.0)
        for k in ("lokr_w1", "lokr_w1_a", "lokr_w1_b", "lokr_w2", "lokr_w2_a", "lokr_w2_b", "lokr_t2"):
            if k in src:
                src[k] = src[k] * r
        return src, scaled, orig_norm * ratio

    def factored_merged_fns(self, multiplier):
        """(recon_fn, dtheta_fn) for the dense-dW-free merged backward
        (functional/merged.py), or None when this config needs the generic
        autodiff path (conv kernels, tucker, DoRA, rank dropout)."""
        if self.layer.is_conv or self.tucker or self.wd or self.rank_dropout:
            return None
        from ..functional.merged import lokr_dtheta

        def recon_fn(theta, out_dtype=None):
            # scalar·multiplier folded into the small w1 factor (free) so no
            # full ΔW-sized multiply pass runs after the kron; out_dtype casts
            # pre-reshape (see make_kron) so bf16 training never materializes
            # the f32 ΔW.
            w1 = self._rebuild_w1(theta) * (self._p(theta, "scalar") * multiplier)
            return make_kron(w1, self._rebuild_w2(theta), self.scale, out_dtype=out_dtype)

        want_scalar = "scalar" in self.trainable

        def dtheta_fn(x2d, dy2d, theta):
            w1f = self._rebuild_w1(theta)
            if self.use_w2:
                w2f, w2ab = self._p(theta, "lokr_w2"), None
            else:
                w2f = None
                w2ab = (self._p(theta, "lokr_w2_a"), self._p(theta, "lokr_w2_b"))
            scalar = self._p(theta, "scalar")
            dW1, dW2, d_s = lokr_dtheta(
                x2d, dy2d, w1f, w2f, w2_ab=w2ab, want_scalar=want_scalar
            )
            cc = self.scale * multiplier * scalar
            grads = {}
            if self.use_w1:
                grads["lokr_w1"] = dW1 * cc
            else:
                w1a = self._p(theta, "lokr_w1_a")
                w1b = self._p(theta, "lokr_w1_b")
                d = dW1 * cc
                grads["lokr_w1_a"] = jnp.matmul(d, w1b.astype(d.dtype).T)
                grads["lokr_w1_b"] = jnp.matmul(w1a.astype(d.dtype).T, d)
            if self.use_w2:
                grads["lokr_w2"] = dW2 * cc
            else:
                dA, dB = dW2
                grads["lokr_w2_a"] = dA * cc
                grads["lokr_w2_b"] = dB * cc
            if want_scalar:
                grads["scalar"] = d_s * (self.scale * multiplier)
            out = {}
            for k, leaf in theta.items():
                g = grads.get(k)
                out[k] = jnp.zeros_like(leaf) if g is None else g.astype(leaf.dtype)
            return out

        return recon_fn, dtheta_fn

    # -- forward paths ----------------------------------------------------------
    def _functional_weights(self, params):
        """Weights tuple in functional layout (conv w2b unflattened)."""
        w1 = self._p(params, "lokr_w1")
        w1a = self._p(params, "lokr_w1_a")
        w1b = self._p(params, "lokr_w1_b")
        w2 = self._p(params, "lokr_w2")
        w2a = self._p(params, "lokr_w2_a")
        w2b = self._p(params, "lokr_w2_b")
        t2 = self._p(params, "lokr_t2")
        if w2b is not None and self.layer.is_conv and not self.tucker:
            d = self.kron_shape[1][1]
            w2b = w2b.reshape(w2b.shape[0], d, *self.shape[2:])
        return (w1, w1a, w1b, w2, w2a, w2b, t2)

    def bypass_forward_diff(self, x, params=None, scale=1.0, org_forward=None, rng=None, train=False):
        eff_scale = self.scale * self._p(params, "scalar") * scale
        out = bypass_diff_with_scale(
            x,
            *self._functional_weights(params),
            scale=eff_scale,
            extra_args=self.layer.kw if self.layer.is_conv else {},
        )
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
