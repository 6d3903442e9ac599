"""Module layer (L1) base — TPU-native adapter modules.

Reference contract: lycoris/modules/base.py (LycorisBaseModule,
base.py:64-398). The torch version monkey-patches ``module.forward`` on a
live ``nn.Module``; here an adapter module is **static metadata plus a param
dict of jnp arrays**, and every compute method is a pure function of
``(params, inputs, org_weight, ...)`` so the whole adapted model stays
jit-traceable. Lifecycle (apply/restore/stacking) lives in the network
wrapper, which composes pure forwards instead of mutating objects.

Design mapping (reference → here):
- type dispatch Linear/ConvNd/Norm → :class:`LayerInfo` (base.py:88-158)
- ``module.forward = self.forward`` patching → wrapper-level function
  composition; ``org_forward`` is an explicit argument (base.py:271-324)
- dropout trio with host-side ``torch.rand`` (base.py:183-193,
  locon.py:286-307) → traced masks from an explicit PRNG key
- ``custom_state_dict`` folding + load hooks (base.py:11-61) →
  :meth:`state_dict` / :meth:`load_state_dict`
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..functional import general
from ..functional.general import convnd, linear, layer_norm, group_norm, rms_norm


def _hashable_kw(kw: dict) -> tuple:
    return tuple(sorted((k, tuple(v) if isinstance(v, list) else v) for k, v in kw.items()))


@dataclasses.dataclass(frozen=True)
class LayerInfo:
    """Static description of a wrapped layer (shape/op semantics only).

    Mirrors the reference's type-dispatch block (modules/base.py:88-158)
    without holding the live module: weight layout is torch-style
    ``(out, in, *k)`` so checkpoints stay byte-compatible.
    """

    module_type: str  # linear | conv1d | conv2d | conv3d | layernorm | groupnorm | rmsnorm
    shape: tuple  # torch weight shape
    kw_dict: tuple = ()  # hashable (key, value) pairs for the op
    has_bias: bool = False
    name: str = ""

    @property
    def kw(self) -> dict:
        return {k: v for k, v in self.kw_dict}

    @property
    def dim(self) -> int:
        return self.shape[0]

    @property
    def is_conv(self) -> bool:
        return self.module_type.startswith("conv")

    @property
    def is_norm(self) -> bool:
        return self.module_type in ("layernorm", "groupnorm", "rmsnorm")

    # -- constructors -------------------------------------------------
    @staticmethod
    def linear(out_features: int, in_features: int, bias: bool = True, name: str = "") -> "LayerInfo":
        return LayerInfo("linear", (out_features, in_features), (), bias, name)

    @staticmethod
    def conv(
        nd: int,
        out_channels: int,
        in_channels: int,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        groups: int = 1,
        bias: bool = True,
        name: str = "",
    ) -> "LayerInfo":
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * nd
        kw = _hashable_kw(
            dict(stride=stride, padding=padding, dilation=dilation, groups=groups)
        )
        return LayerInfo(
            f"conv{nd}d",
            (out_channels, in_channels // groups, *kernel_size),
            kw,
            bias,
            name,
        )

    @staticmethod
    def layer_norm(normalized_shape, eps: float = 1e-5, bias: bool = True, name: str = "") -> "LayerInfo":
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        kw = _hashable_kw(dict(normalized_shape=tuple(normalized_shape), eps=eps))
        return LayerInfo("layernorm", tuple(normalized_shape), kw, bias, name)

    @staticmethod
    def rms_norm(normalized_shape, eps: float = 1e-6, bias: bool = False, name: str = "") -> "LayerInfo":
        """Duck-typed ``_norm`` modules in the reference (norms.py:37-44):
        anything with a ``weight`` and a stats-only ``_norm`` — RMSNorm-likes
        (DiT qk-norm, T5/Llama norms)."""
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        kw = _hashable_kw(dict(normalized_shape=tuple(normalized_shape), eps=eps))
        return LayerInfo("rmsnorm", tuple(normalized_shape), kw, bias, name)

    @staticmethod
    def group_norm(num_groups: int, num_channels: int, eps: float = 1e-5, bias: bool = True, name: str = "", act: str | None = None) -> "LayerInfo":
        """``act`` records an activation FOLDED into the layer (models/layers.py
        GroupNorm(act=...), the UNet's norm→silu chains). The op applies it
        after the norm; NormModule computes its delta act-less and re-applies
        the act on the summed pre-activation (gn is linear in (γ, β))."""
        kw = dict(num_groups=num_groups, eps=eps)
        if act is not None:
            kw["act"] = act
        return LayerInfo("groupnorm", (num_channels,), _hashable_kw(kw), bias, name)

    @property
    def act(self) -> str | None:
        """Activation folded into the layer (groupnorm only; see group_norm)."""
        return self.kw.get("act") if self.module_type == "groupnorm" else None

    # -- the op --------------------------------------------------------
    def op(self, x: jax.Array, weight: jax.Array, bias: jax.Array | None = None,
           with_act: bool = True) -> jax.Array:
        t = self.module_type
        if t == "linear":
            return linear(x, weight, bias)
        if t.startswith("conv"):
            return convnd(x, weight, bias, **self.kw)
        if t == "layernorm":
            kw = self.kw
            return layer_norm(x, kw["normalized_shape"], weight, bias, kw["eps"])
        if t == "rmsnorm":
            # reference norm-delta path for org_norm modules (norms.py:148-157):
            # op(x, dw, db) == org_norm(x) * dw + db
            kw = self.kw
            return rms_norm(x, kw["normalized_shape"], weight, bias, kw["eps"])
        if t == "groupnorm":
            kw = self.kw
            return general.group_norm_act(
                x, kw["num_groups"], weight, bias, kw["eps"],
                act=kw.get("act") if with_act else None,
            )
        raise ValueError(f"unsupported module_type {t}")


# ---------------------------------------------------------------------------
# Traced dropout helpers (reference uses host-side torch.rand; here they are
# pure functions of an explicit key so the train step stays one jitted fn)
# ---------------------------------------------------------------------------


def rank_dropout_mask(rng, n: int, p: float, scale: bool, dtype=jnp.float32):
    """Row mask over dim-0 (reference locon.py:198-219)."""
    drop = (jax.random.uniform(rng, (n,)) > p).astype(dtype)
    if scale:
        drop = drop / jnp.clip(jnp.mean(drop), 1e-6)
    return drop


def module_keep(rng, p: float):
    """0/1 keep flag for module_dropout (reference: torch.rand(1) < p skips)."""
    return (jax.random.uniform(rng, ()) >= p).astype(jnp.float32)


def dropout(rng, x, p: float):
    """Inverted dropout (torch nn.Dropout semantics)."""
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0).astype(x.dtype)


def apply_weight_decompose(weight, dora_scale, wd_on_out: bool, multiplier=1.0):
    """DoRA norm-rescale with multiplier interpolation (locon.py:239-260)."""
    weight = weight.astype(dora_scale.dtype)
    nd = weight.ndim - 1
    eps = jnp.finfo(weight.dtype).eps
    if wd_on_out:
        weight_norm = (
            jnp.linalg.norm(weight.reshape(weight.shape[0], -1), axis=1).reshape(
                weight.shape[0], *[1] * nd
            )
            + eps
        )
    else:
        weight_norm = (
            jnp.linalg.norm(
                jnp.swapaxes(weight, 0, 1).reshape(weight.shape[1], -1),
                axis=1,
                keepdims=True,
            )
            .reshape(weight.shape[1], *[1] * nd)
            .swapaxes(0, 1)
            + eps
        )
    scale = dora_scale / weight_norm
    scale = multiplier * (scale - 1) + 1
    return weight * scale


def infer_wd_on_out(dora_scale, out_dim) -> bool:
    """Recover the wd_on_out flag from a saved ``dora_scale`` shape:
    on-out scales are (out_dim, 1, …), on-input ones (1, in_dim, …). The
    reference blindly copies into the default on-out buffer and crashes on
    shape mismatch (locon.py make_module_from_state_dict); we infer instead."""
    shape = tuple(getattr(dora_scale, "shape", ()))
    if len(shape) == 0:
        return True
    return shape[0] != 1 or out_dim == 1


def init_dora_scale(org_weight, wd_on_out: bool):
    """dora_scale init = row (wd_on_out) or col norms of org weight (locon.py:107-129)."""
    w = org_weight.astype(jnp.float32)
    nd = w.ndim - 1
    if wd_on_out:
        return jnp.linalg.norm(w.reshape(w.shape[0], -1), axis=1, keepdims=True).reshape(
            w.shape[0], *[1] * nd
        )
    return (
        jnp.linalg.norm(
            jnp.swapaxes(w, 0, 1).reshape(w.shape[1], -1), axis=1, keepdims=True
        )
        .reshape(w.shape[1], *[1] * nd)
        .swapaxes(0, 1)
    )


def _as_float(alpha) -> float:
    if alpha is None:
        return 0.0
    if isinstance(alpha, (jnp.ndarray, np.ndarray, jax.Array)):
        return float(np.asarray(alpha).reshape(-1)[0])
    try:
        import torch

        if isinstance(alpha, torch.Tensor):
            return float(alpha.detach().float().cpu().numpy())
    except ImportError:
        pass
    return float(alpha)


class LycorisBaseModule:
    """Base adapter: static config + ``params`` dict of jnp arrays.

    ``params`` holds every serialized tensor under its reference state-dict
    key (e.g. ``lora_up.weight``) plus runtime-only entries (``scalar``).
    ``trainable`` is the subset of keys the optimizer should update.
    """

    name: str = "base"
    support_module: frozenset = frozenset()
    weight_list: list = []
    weight_list_det: list = []

    def __init__(
        self,
        lora_name: str,
        layer: LayerInfo,
        multiplier: float = 1.0,
        dropout: float = 0.0,
        rank_dropout: float = 0.0,
        module_dropout: float = 0.0,
        rank_dropout_scale: bool = False,
        bypass_mode: bool | None = None,
        **kwargs,
    ):
        self.lora_name = lora_name
        self.layer = layer
        self.multiplier = multiplier
        self.dropout = dropout
        self.rank_dropout = rank_dropout
        self.rank_dropout_scale = rank_dropout_scale
        self.module_dropout = module_dropout
        self.bypass_mode = bool(bypass_mode)
        self.not_supported = layer.module_type not in self.support_module
        self.params: dict[str, jax.Array] = {}
        self.trainable: set[str] = set()

    # -- shape/op conveniences -----------------------------------------
    @property
    def module_type(self) -> str:
        return self.layer.module_type

    @property
    def shape(self) -> tuple:
        return self.layer.shape

    @property
    def dim(self) -> int:
        return self.layer.dim

    def op(self, x, weight, bias=None):
        return self.layer.op(x, weight, bias)

    def _p(self, params, key):
        return (self.params if params is None else params).get(key)

    def trainable_params(self, params=None) -> dict:
        src = self.params if params is None else params
        return {k: v for k, v in src.items() if k in self.trainable}

    # -- checkpoint API --------------------------------------------------
    @classmethod
    def algo_check(cls, state_dict, lora_name) -> bool:
        """First-match detection by key presence (base.py:236-238)."""
        return any(f"{lora_name}.{k}" in state_dict for k in cls.weight_list_det)

    @classmethod
    def extract_state_dict(cls, state_dict, lora_name) -> list:
        return [state_dict.get(f"{lora_name}.{k}", None) for k in cls.weight_list]

    @classmethod
    def make_module_from_state_dict(cls, lora_name, layer: LayerInfo, *weights):
        raise NotImplementedError

    def custom_state_dict(self, params=None) -> dict:
        raise NotImplementedError

    def state_dict(self, params=None) -> dict:
        return self.custom_state_dict(params)

    def load_state_dict(self, sd: dict):
        """Update params from a flat (unprefixed) state dict; resets scalar to 1
        like the reference load hook (locon.py:184-196)."""
        for k, v in sd.items():
            if k in self.params or k in self.weight_list:
                self.params[k] = jnp.asarray(v).reshape(
                    self.params[k].shape if k in self.params else np.asarray(v).shape
                )
        if "scalar" in self.params:
            self.params["scalar"] = jnp.ones_like(self.params["scalar"])

    # -- compute API -------------------------------------------------------
    def get_diff_weight(self, params=None, multiplier=1.0, rng=None, train=False):
        raise NotImplementedError

    def get_merged_weight(self, org_weight, org_bias=None, params=None, multiplier=1.0):
        raise NotImplementedError

    def apply_max_norm(self, max_norm, params=None):
        """Returns (new_params, scaled?, scaled_norm). Pure (base.py:380-381)."""
        src = dict(self.params if params is None else params)
        return src, None, None

    def bypass_forward_diff(self, x, params=None, scale=1.0, org_forward=None, rng=None, train=False):
        raise NotImplementedError

    def bypass_forward(self, x, params=None, scale=1.0, org_forward=None, rng=None, train=False):
        return org_forward(x) + self.bypass_forward_diff(
            x, params=params, scale=scale, org_forward=org_forward, rng=rng, train=train
        )

    def _default_org_forward(self, org_weight, org_bias):
        return lambda x: self.op(x, org_weight, org_bias)

    def _module_dropout_mix(self, rng, train, base, full):
        """Traced module_dropout: with prob p return base only (delta masked)."""
        if not (train and self.module_dropout and rng is not None):
            return full
        keep = module_keep(jax.random.fold_in(rng, 0x6D6F64), self.module_dropout)
        return base + (full - base) * keep.astype(base.dtype)

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
        raise NotImplementedError

    # -- parametrize API -------------------------------------------------------
    @classmethod
    def parametrize(cls, org_param, *args, rng=None, **kwargs):
        """Adapter over a bare parameter tensor (reference base.py:199-234:
        ``torch.nn.utils.parametrize`` proxy). Returns a module whose
        :meth:`parametrize_forward` maps the original parameter value to the
        adapted one — compose it anywhere a raw weight is consumed."""
        from .full import FullModule

        if cls is FullModule:
            raise RuntimeError("FullModule cannot be used for parametrize.")
        org_param = jnp.asarray(org_param)
        if org_param.ndim == 2:
            li = LayerInfo.linear(org_param.shape[0], org_param.shape[1], bias=False)
        elif org_param.ndim in (3, 4, 5):
            li = LayerInfo.conv(
                org_param.ndim - 2,
                org_param.shape[0],
                org_param.shape[1],
                org_param.shape[2:],
                bias=False,
            )
        else:
            raise ValueError(f"cannot parametrize a {org_param.ndim}-d parameter")
        kwargs["bypass_mode"] = False
        return cls("", li, *args, rng=rng, org_weight=org_param, **kwargs)

    def parametrize_forward(self, org_param, params=None, multiplier=None):
        multiplier = self.multiplier if multiplier is None else multiplier
        w, _ = self.get_merged_weight(org_param, None, params=params, multiplier=multiplier)
        return w.astype(org_param.dtype)
