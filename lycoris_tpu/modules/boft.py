"""BOFT (butterfly orthogonal fine-tuning) adapter module — TPU-native.

Parity contract with reference lycoris/modules/boft.py (ButterflyOFTModule):
- ``butterfly_factor`` = power2factorization with error (boft.py:24-33);
  blocks [boft_m, block_num, b, b] with boft_m = popcount(block_num-1)+1
  (boft.py:82-95).
- butterfly permute+rotate over m levels on the weight (make_weight,
  boft.py:145-175) or on activations (bypass, boft.py:202-236); multiplier
  interpolates each level's rotation toward identity
  (``bi·s + (1-s)·I``, boft.py:156-158).
- ``algo_check`` requires ``oft_blocks.ndim == 4`` (boft.py:101-107).
- keys ``oft_blocks, rescale, alpha``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..functional.general import op_precision, power2factorization
from .base import LayerInfo, LycorisBaseModule, _as_float


class ButterflyOFTModule(LycorisBaseModule):
    name = "boft"
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
            raise ValueError(f"{self.module_type} is not supported in BOFT algo.")
        out_dim = self.dim
        b, m_exp = power2factorization(out_dim, lora_dim)
        if b is None or m_exp == 0:
            raise ValueError(
                f"It is impossible to decompose {out_dim} with factor {lora_dim} "
                "under BOFT constraints."
            )
        self.block_size = b
        self.block_num = m_exp
        self.boft_b = b
        self.boft_m = (m_exp - 1).bit_count() + 1
        self.rescaled = rescaled
        self.constraint = float(constraint) * out_dim
        self.params["alpha"] = jnp.asarray(float(constraint), dtype=jnp.float32)
        self.params["oft_blocks"] = jnp.zeros(
            (self.boft_m, self.block_num, b, b), dtype=dtype
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
        return key in state_dict and np.asarray(state_dict[key]).ndim == 4

    @classmethod
    def make_module_from_state_dict(cls, lora_name, layer, oft_blocks, rescale, alpha):
        m, n, s, _ = oft_blocks.shape
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

        blocks = self._p(params, "oft_blocks")
        return get_r(
            blocks,
            jnp.eye(self.boft_b, dtype=blocks.dtype),
            self.constraint if self.constraint > 0 else None,
        )

    def make_weight(self, org_weight, params=None, scale=1.0, diff=False, rng=None, train=False):
        # rotate_front picks dense-Q vs direct chain by static shape — the
        # dense (dim, dim) Q OOMs at ff out_dims — and runs the Cayley
        # transform INSIDE its checkpoint so backward saves only oft_blocks
        # (functional.boft._rotate_impl)
        from ..functional.boft import rotate_front

        blocks = self._p(params, "oft_blocks")
        org = org_weight.astype(blocks.dtype)
        inp = rotate_front(
            org, blocks,
            self.constraint if self.constraint > 0 else None, float(scale),
        )
        if self.rescaled:
            inp = inp * self._p(params, "rescale")
        if diff:
            inp = inp - org
        return inp.astype(org_weight.dtype)

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
        from ..functional.boft import rotate_last

        blocks = self._p(params, "oft_blocks")
        org_out = org_forward(x)
        inp = org = org_out.astype(blocks.dtype)
        if self.layer.is_conv:
            inp = org = jnp.swapaxes(inp, 1, -1)
        inp = rotate_last(
            inp, blocks,
            self.constraint if self.constraint > 0 else None, float(scale),
        )
        if self.rescaled:
            inp = inp * jnp.swapaxes(self._p(params, "rescale"), 0, -1)
        if self.layer.is_conv:
            inp = jnp.swapaxes(inp, 1, -1)
            org = jnp.swapaxes(org, 1, -1)
        if diff:
            inp = inp - org
        return inp.astype(org_out.dtype)

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
        new_weight = self.make_weight(org_weight, params, scale=multiplier)
        delta = self.op(x, (new_weight - org_weight).astype(x.dtype))
        return self._module_dropout_mix(rng, train, base, base + delta)
