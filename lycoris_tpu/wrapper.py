"""LycorisNetwork — targeting + lifecycle over a whole model (L2).

Reference contract: lycoris/wrapper.py (create_lycoris,
create_lycoris_from_weights, LycorisNetwork, wrapper.py:64-648). Same
targeting semantics — TARGET_REPLACE_MODULE class matching with recursion,
TARGET_REPLACE_NAME / NAME_ALGO_MAP regex-or-fnmatch matching,
MODULE_ALGO_MAP per-class config overrides, exclusion-first, identical
``lora_name`` generation — but over a :class:`~lycoris_tpu.graph.ModelGraph`
instead of a live torch module tree.

TPU-native lifecycle: ``apply_to`` never mutates the model. For flax linen
models, :meth:`LycorisNetwork.__call__` runs the model under a linen method
interceptor that adds each adapter's delta around the original layer call
(function composition ≡ the reference's forward-patching stack,
base.py:271-324, but pure and jit-traceable). ``merge_to`` returns a new
params pytree. Checkpoints are flat safetensors with the reference key
grammar, loadable by/into PyTorch LyCORIS.
"""

from __future__ import annotations

import fnmatch
import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import PRESET
from .graph import ModelGraph
from .logging import logger
from .modules import get_module, make_module
from .modules.base import LayerInfo
from .modules.locon import LoConModule
from .modules.loha import LohaModule
from .modules.lokr import LokrModule
from .modules.dylora import DyLoraModule
from .modules.glora import GLoRAModule
from .modules.norms import NormModule
from .modules.full import FullModule
from .modules.ia3 import IA3Module
from .modules.diag_oft import DiagOFTModule
from .modules.boft import ButterflyOFTModule
from .utils import str_bool
from .utils.preset import read_preset

VALID_PRESET_KEYS = [
    "enable_conv",
    "target_module",
    "target_name",
    "module_algo_map",
    "name_algo_map",
    "lora_prefix",
    "use_fnmatch",
    "unet_target_module",
    "unet_target_name",
    "text_encoder_target_module",
    "text_encoder_target_name",
    "exclude_name",
]

network_module_dict = {
    "lora": LoConModule,
    "locon": LoConModule,
    "loha": LohaModule,
    "lokr": LokrModule,
    "dylora": DyLoraModule,
    "glora": GLoRAModule,
    "full": FullModule,
    "ia3": IA3Module,
    "diag-oft": DiagOFTModule,
    "boft": ButterflyOFTModule,
}

deprecated_arg_dict = {
    "disable_conv_cp": "use_tucker",
    "use_cp": "use_tucker",
    "use_conv_cp": "use_tucker",
    "constrain": "constraint",
}


def _as_graph(model_or_graph, variables=None, *trace_args, **trace_kwargs) -> ModelGraph:
    if isinstance(model_or_graph, ModelGraph):
        return model_or_graph
    try:
        import torch.nn as tnn

        if isinstance(model_or_graph, tnn.Module):
            return ModelGraph.from_torch(model_or_graph)
    except ImportError:
        pass
    if variables is not None:
        return ModelGraph.from_linen(model_or_graph, variables, *trace_args, **trace_kwargs)
    raise TypeError(
        "create_lycoris needs a ModelGraph, a torch nn.Module, or a flax model "
        "+ variables (pass graph=ModelGraph.from_linen(model, variables, x))"
    )


def create_lycoris(module, multiplier=1.0, linear_dim=4, linear_alpha=1, **kwargs):
    """kwargs-parsing parity with reference wrapper.py:64-145."""
    for key, value in list(kwargs.items()):
        if key in deprecated_arg_dict:
            logger.warning(f"{key} is deprecated. Please use {deprecated_arg_dict[key]} instead.")
            kwargs[deprecated_arg_dict[key]] = value
    if linear_dim is None:
        linear_dim = 4
    conv_dim = int(kwargs.get("conv_dim", linear_dim) or linear_dim)
    conv_alpha = float(kwargs.get("conv_alpha", linear_alpha) or linear_alpha)
    dropout = float(kwargs.get("dropout", 0.0) or 0.0)
    rank_dropout = float(kwargs.get("rank_dropout", 0.0) or 0.0)
    module_dropout = float(kwargs.get("module_dropout", 0.0) or 0.0)
    algo = (kwargs.get("algo", "lora") or "lora").lower()
    use_tucker = str_bool(
        not kwargs.get("disable_conv_cp", True)
        or kwargs.get("use_conv_cp", False)
        or kwargs.get("use_cp", False)
        or kwargs.get("use_tucker", False)
    )
    use_scalar = str_bool(kwargs.get("use_scalar", False))
    block_size = int(kwargs.get("block_size", 4) or 4)
    train_norm = str_bool(kwargs.get("train_norm", False))
    constraint = float(kwargs.get("constraint", 0) or 0)
    rescaled = str_bool(kwargs.get("rescaled", False))
    weight_decompose = str_bool(kwargs.get("dora_wd", False))
    wd_on_output = str_bool(kwargs.get("wd_on_output", True))
    full_matrix = str_bool(kwargs.get("full_matrix", False))
    bypass_mode = str_bool(kwargs.get("bypass_mode", False))
    unbalanced_factorization = str_bool(kwargs.get("unbalanced_factorization", False))

    preset = kwargs.get("preset", "full")
    if preset not in PRESET:
        preset = read_preset(preset)
    else:
        preset = PRESET[preset]
    assert preset is not None
    LycorisNetwork.apply_preset(preset)

    logger.info(f"Using rank adaptation algo: {algo}")

    return LycorisNetwork(
        module,
        multiplier=multiplier,
        lora_dim=linear_dim,
        conv_lora_dim=conv_dim,
        alpha=linear_alpha,
        conv_alpha=conv_alpha,
        dropout=dropout,
        rank_dropout=rank_dropout,
        module_dropout=module_dropout,
        use_tucker=use_tucker,
        use_scalar=use_scalar,
        network_module=algo,
        train_norm=train_norm,
        decompose_both=kwargs.get("decompose_both", False),
        factor=kwargs.get("factor", -1),
        block_size=block_size,
        constraint=constraint,
        rescaled=rescaled,
        weight_decompose=weight_decompose,
        wd_on_out=wd_on_output,
        full_matrix=full_matrix,
        bypass_mode=bypass_mode,
        unbalanced_factorization=unbalanced_factorization,
        train_on_input=str_bool(kwargs.get("train_on_input", False)),
        rng=kwargs.get("rng", None),
    )


def create_lycoris_from_weights(multiplier, file, module, weights_sd=None, **kwargs):
    """Load + algo autodetection (reference wrapper.py:148-194)."""
    if weights_sd is None:
        weights_sd = load_file_sd(file)

    graph = _as_graph(module)

    loras: dict[str, Any] = {}
    for key in weights_sd:
        if "." not in key:
            continue
        loras[key.split(".")[0]] = None

    for name, node in graph.named_modules():
        lora_name = f"{LycorisNetwork.LORA_PREFIX}_{name}".replace(".", "_")
        if lora_name in loras:
            loras[lora_name] = node

    network = LycorisNetwork(graph, init_only=True)
    network.multiplier = multiplier
    network.graph = graph

    for lora_name, node in loras.items():
        if node is None or node.adapter is None:
            continue
        lyco_type, params = get_module(weights_sd, lora_name)
        if lyco_type is None:
            continue
        mod = make_module(lyco_type, params, lora_name, node.adapter.layer_info)
        if mod is not None:
            mod.multiplier = multiplier
            network.loras.append(mod)
            network.lora_map[lora_name] = mod
            network.node_map[lora_name] = node
            network.algo_table[mod.__class__.__name__] = (
                network.algo_table.get(mod.__class__.__name__, 0) + 1
            )
    logger.info(f"{len(network.loras)} Modules Loaded")
    return network, weights_sd


def load_file_sd(file) -> dict:
    """Load a flat state dict from .safetensors (numpy) or torch .pt."""
    if os.path.splitext(file)[1] == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(file)
    import torch

    sd = torch.load(file, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


class LycorisNetwork:
    ENABLE_CONV = True
    TARGET_REPLACE_MODULE = [
        "Linear",
        "Conv1d",
        "Conv2d",
        "Conv3d",
        "GroupNorm",
        "LayerNorm",
        # RMSNorm-likes: the reference duck-types any `weight`+`_norm` module
        # (norms.py:37-44) but only reaches them inside targeted containers;
        # torch/linen spell the class "RMSNorm" so target it directly. Custom
        # names (LlamaRMSNorm, ...) go through target_name / preset.
        "RMSNorm",
        # flax-native class names (lowered onto the same LayerInfo kinds)
        "Dense",
        "Conv",
        # quantized base layers (QLyCORIS; forced into bypass mode)
        "Int8Linear",
        "QuantLinear",
        "Linear8bitLt",
        "LinearFP4",
        "LinearNF4",
    ]
    TARGET_REPLACE_NAME = []
    LORA_PREFIX = "lycoris"
    MODULE_ALGO_MAP = {}
    NAME_ALGO_MAP = {}
    USE_FNMATCH = False
    TARGET_EXCLUDE_NAME = []

    _DEFAULTS = None  # snapshot for reset_preset

    @classmethod
    def apply_preset(cls, preset):
        """Mutates class attrs like the reference (wrapper.py:214-238); use
        :meth:`reset_preset` between configurations (the reference wart is
        kept because downstream code and tests depend on it)."""
        if cls._DEFAULTS is None:
            cls._DEFAULTS = {
                "ENABLE_CONV": cls.ENABLE_CONV,
                "TARGET_REPLACE_MODULE": list(cls.TARGET_REPLACE_MODULE),
                "TARGET_REPLACE_NAME": list(cls.TARGET_REPLACE_NAME),
                "LORA_PREFIX": cls.LORA_PREFIX,
                "MODULE_ALGO_MAP": dict(cls.MODULE_ALGO_MAP),
                "NAME_ALGO_MAP": dict(cls.NAME_ALGO_MAP),
                "USE_FNMATCH": cls.USE_FNMATCH,
                "TARGET_EXCLUDE_NAME": list(cls.TARGET_EXCLUDE_NAME),
            }
        for preset_key in preset.keys():
            if preset_key not in VALID_PRESET_KEYS:
                raise KeyError(f'Unknown preset key "{preset_key}". Valid keys: {VALID_PRESET_KEYS}')
        if "enable_conv" in preset:
            cls.ENABLE_CONV = preset["enable_conv"]
        if "target_module" in preset:
            cls.TARGET_REPLACE_MODULE = preset["target_module"]
        if "target_name" in preset:
            cls.TARGET_REPLACE_NAME = preset["target_name"]
        if "module_algo_map" in preset:
            cls.MODULE_ALGO_MAP = preset["module_algo_map"]
        if "name_algo_map" in preset:
            cls.NAME_ALGO_MAP = preset["name_algo_map"]
        if "lora_prefix" in preset:
            cls.LORA_PREFIX = preset["lora_prefix"]
        if "use_fnmatch" in preset:
            cls.USE_FNMATCH = preset["use_fnmatch"]
        if "exclude_name" in preset:
            cls.TARGET_EXCLUDE_NAME = preset["exclude_name"]
        return cls

    @classmethod
    def reset_preset(cls):
        if cls._DEFAULTS is not None:
            for k, v in cls._DEFAULTS.items():
                setattr(cls, k, v)

    def __init__(
        self,
        module,
        multiplier=1.0,
        lora_dim=4,
        conv_lora_dim=4,
        alpha=1,
        conv_alpha=1,
        use_tucker=False,
        dropout=0,
        rank_dropout=0,
        module_dropout=0,
        network_module: str = "locon",
        norm_modules=NormModule,
        train_norm=False,
        init_only=False,
        rng=None,
        lora_prefix_override=None,
        target_module_override=None,
        target_name_override=None,
        **kwargs,
    ):
        root_kwargs = kwargs
        self.weights_sd = None
        self.loras: list = []
        self.lora_map: dict[str, Any] = {}
        self.node_map: dict[str, Any] = {}
        self.algo_table: dict[str, int] = {}
        # snapshot preset state per-instance (fixes the reference's
        # mutable-class-attr coupling at runtime; apply_preset stays classlevel)
        self.enable_conv = type(self).ENABLE_CONV
        self.target_replace_module = list(type(self).TARGET_REPLACE_MODULE)
        self.target_replace_name = list(type(self).TARGET_REPLACE_NAME)
        self.lora_prefix = type(self).LORA_PREFIX
        self.module_algo_map = dict(type(self).MODULE_ALGO_MAP)
        self.name_algo_map = dict(type(self).NAME_ALGO_MAP)
        self.use_fnmatch = type(self).USE_FNMATCH
        self.target_exclude_name = list(type(self).TARGET_EXCLUDE_NAME)
        if lora_prefix_override is not None:
            self.lora_prefix = lora_prefix_override
        if target_module_override is not None:
            self.target_replace_module = list(target_module_override)
        if target_name_override is not None:
            self.target_replace_name = list(target_name_override)

        if init_only:
            self.multiplier = 1
            self.lora_dim = 0
            self.graph = module if isinstance(module, ModelGraph) else None
            return

        self.graph = _as_graph(module)
        self.multiplier = multiplier
        self.lora_dim = lora_dim

        if not self.enable_conv:
            conv_lora_dim = 0
        self.conv_lora_dim = int(conv_lora_dim)
        self.alpha = alpha
        self.conv_alpha = float(conv_alpha)
        self.dropout = dropout
        self.rank_dropout = rank_dropout
        self.module_dropout = module_dropout
        self.use_tucker = use_tucker
        self.base_rng = jax.random.key(0) if rng is None else rng

        def module_rng(lora_name):
            h = int.from_bytes(lora_name.encode()[-8:].rjust(8, b"\0"), "little")
            return jax.random.fold_in(self.base_rng, h % (2**31))

        def create_single_module(lora_name, node, algo_name, dim=None, alpha_=None, use_tucker_=None, **cfg):
            """dim/alpha by layer kind + algo dispatch (wrapper.py:301-354)."""
            for k, v in root_kwargs.items():
                if k not in cfg:
                    cfg[k] = v
            cfg.pop("algo", None)
            alpha_ = cfg.pop("alpha", alpha_)
            dim = cfg.pop("dim", dim)
            if use_tucker_ is None:
                use_tucker_ = cfg.pop("use_tucker", self.use_tucker)

            adapter = node.adapter
            if adapter is None:
                return None
            li = adapter.layer_info

            if train_norm and "Norm" in node.class_name:
                return norm_modules(
                    lora_name,
                    li,
                    self.multiplier,
                    self.rank_dropout,
                    self.module_dropout,
                    rng=module_rng(lora_name),
                    **cfg,
                )
            if li.is_norm:
                return None
            if li.module_type == "linear" and lora_dim > 0:
                dim = dim or lora_dim
                alpha_ = alpha_ or self.alpha
            elif li.is_conv:
                k_size = li.shape[2] if len(li.shape) > 2 else 1
                if k_size == 1 and lora_dim > 0:
                    dim = dim or lora_dim
                    alpha_ = alpha_ or self.alpha
                elif self.conv_lora_dim > 0 or dim:
                    dim = dim or self.conv_lora_dim
                    alpha_ = alpha_ or self.conv_alpha
                else:
                    return None
            else:
                return None

            # QLyCORIS: quantized base layers force bypass mode so ΔW never
            # touches the quantized weight (reference base.py:162-177)
            from .utils.quant import is_quant_class, log_bypass

            if is_quant_class(node.class_name) or node.adapter.put_weights is None:
                if algo_name == "full":
                    raise ValueError("Quant layers are not supported in Full algo.")
                log_bypass()
                cfg["bypass_mode"] = True

            org_w = None
            try:
                org_w = self.graph.node_weights(node)[0]
            except Exception:
                pass
            return network_module_dict[algo_name](
                lora_name,
                li,
                self.multiplier,
                dim,
                alpha_,
                self.dropout,
                self.rank_dropout,
                self.module_dropout,
                use_tucker=use_tucker_,
                rng=module_rng(lora_name),
                org_weight=org_w,
                **cfg,
            )

        def create_modules_(prefix, root_name, algo, current_lora_map, configs={}):
            """Recursive class-scope walk (wrapper.py:356-405)."""
            loras_ = current_lora_map
            lora_names = []
            for name, node in self.graph.named_modules(root_name):
                if node.class_name in self.module_algo_map and name != "":
                    next_config = dict(self.module_algo_map[node.class_name])
                    next_algo = next_config.get("algo", algo)
                    full_name = f"{root_name}.{name}" if root_name else name
                    new_loras, new_names, new_map = create_modules_(
                        f"{prefix}_{name}" if name else prefix,
                        full_name,
                        next_algo,
                        loras_,
                        configs=next_config,
                    )
                    loras_ = {**loras_, **new_map}
                    for ln, lora in zip(new_names, new_loras):
                        if ln not in loras_ and ln not in current_lora_map:
                            loras_[ln] = lora
                        if ln not in lora_names:
                            lora_names.append(ln)
                    continue

                lora_name = prefix + "." + name if name else prefix
                if f"{self.lora_prefix}_." in lora_name:
                    lora_name = lora_name.replace(f"{self.lora_prefix}_.", f"{self.lora_prefix}.")
                lora_name = lora_name.replace(".", "_")
                if lora_name in loras_:
                    continue
                lora = create_single_module(lora_name, node, algo, **configs)
                if lora is not None:
                    loras_[lora_name] = lora
                    lora_names.append(lora_name)
                    self.node_map[lora_name] = node
            return [loras_[ln] for ln in lora_names], lora_names, loras_

        def create_modules(prefix, target_replace_modules, target_replace_names=[], target_exclude_names=[]):
            """Top-level walk (wrapper.py:408-468)."""
            logger.info("Create LyCORIS Module")
            loras_ = []
            lora_map = {}
            next_config = {}
            for name, node in self.graph.named_modules():
                if name == "":
                    continue
                if name in target_exclude_names or any(
                    self.match_fn(t, name) for t in target_exclude_names
                ):
                    continue
                module_name = node.class_name
                if module_name in target_replace_modules and not any(
                    self.match_fn(t, name) for t in target_replace_names
                ):
                    if module_name in self.module_algo_map:
                        next_config = dict(self.module_algo_map[module_name])
                        algo = next_config.get("algo", network_module)
                    else:
                        algo = network_module
                    lora_lst, _, _map = create_modules_(
                        f"{prefix}_{name}", name, algo, lora_map, configs=next_config
                    )
                    lora_map = {**lora_map, **_map}
                    loras_.extend(lora_lst)
                    next_config = {}
                elif name in target_replace_names or any(
                    self.match_fn(t, name) for t in target_replace_names
                ):
                    conf = self.find_conf_for_name(name)
                    if conf is not None:
                        next_config = dict(conf)
                        algo = next_config.get("algo", network_module)
                    elif module_name in self.module_algo_map:
                        next_config = dict(self.module_algo_map[module_name])
                        algo = next_config.get("algo", network_module)
                    else:
                        algo = network_module
                    lora_name = (prefix + "." + name).replace(".", "_")
                    if lora_name in lora_map:
                        continue
                    lora = create_single_module(lora_name, node, algo, **next_config)
                    next_config = {}
                    if lora is not None:
                        lora_map[lora_name] = lora
                        loras_.append(lora)
                        self.node_map[lora_name] = node
            return loras_, lora_map

        self.loras, self.lora_map = create_modules(
            self.lora_prefix,
            list(set([*self.target_replace_module, *self.module_algo_map.keys()])),
            list(set([*self.target_replace_name, *self.name_algo_map.keys()])),
            target_exclude_names=self.target_exclude_name,
        )
        logger.info(f"create LyCORIS: {len(self.loras)} modules.")

        for lora in self.loras:
            self.algo_table[lora.__class__.__name__] = (
                self.algo_table.get(lora.__class__.__name__, 0) + 1
            )
        logger.info(f"module type table: {self.algo_table}")

        names = set()
        for lora in self.loras:
            assert lora.lora_name not in names, f"duplicated lora name: {lora.lora_name}"
            names.add(lora.lora_name)

    # -- targeting helpers --------------------------------------------------
    def match_fn(self, pattern: str, name: str) -> bool:
        if self.use_fnmatch:
            return fnmatch.fnmatch(name, pattern)
        return bool(re.match(pattern, name))

    def find_conf_for_name(self, name: str):
        if name in self.name_algo_map:
            return self.name_algo_map[name]
        for key, value in self.name_algo_map.items():
            if self.match_fn(key, name):
                return value
        return None

    # -- param trees --------------------------------------------------------
    def params_tree(self) -> dict:
        """Full adapter param pytree {lora_name: {key: array}}."""
        return {l.lora_name: dict(l.params) for l in self.loras}

    def trainable_params(self) -> dict:
        return {l.lora_name: l.trainable_params() for l in self.loras}

    def merge_params(self, adapter_params: dict | None, lora_name: str):
        if adapter_params is None:
            return None
        return adapter_params.get(lora_name)

    def set_params_tree(self, tree: dict):
        for l in self.loras:
            if l.lora_name in tree:
                l.params.update(tree[l.lora_name])

    # -- lifecycle -----------------------------------------------------------
    def set_multiplier(self, multiplier):
        self.multiplier = multiplier
        for lora in self.loras:
            lora.multiplier = multiplier

    def apply_to(self):
        """Deferred-weight-load parity (wrapper.py:547-558); application is
        functional so there is nothing to patch."""
        if self.weights_sd:
            self.load_state_dict(self.weights_sd)

    def restore(self):
        pass

    def is_mergeable(self):
        return True

    # -- runtime (flax linen) -------------------------------------------------
    def interceptor(self, adapter_params=None, multiplier=None, train=False, rng=None,
                    merged_forward=False):
        """A linen method interceptor adding each adapter's delta around the
        original layer call. Compose several networks' interceptors for
        multi-adapter stacking (delta-over-base, base.py:271-287).

        ``merged_forward=True`` enables the TPU fast path: instead of the
        reference's delta-over-base pattern (base matmul + a SECOND full
        matmul with ΔW per layer, locon.py:309-332), the layer runs ONCE with
        the merged weight ``W+ΔW`` — mathematically identical for a single
        un-stacked adapter, and ~2x fewer layer FLOPs. Automatically falls
        back to the delta pattern for bypass-mode modules and when training
        with any dropout active (dropout masks live on the delta path). Do
        NOT enable when stacking multiple networks on the same layers."""
        mult = self.multiplier if multiplier is None else multiplier

        def _interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if context.method_name != "__call__":
                return next_fun(*args, **kwargs)
            name = ".".join(str(p) for p in mod.path)
            lora_name = f"{self.lora_prefix}_{name}".replace(".", "_")
            lyco = self.lora_map.get(lora_name)
            node = self.node_map.get(lora_name)
            if lyco is None or node is None:
                return next_fun(*args, **kwargs)
            adapter = node.adapter
            params = mod.variables.get("params", {})
            w, b = adapter.get_weights(params)
            x = adapter.cf_in(args[0])
            mod_rng = None
            if rng is not None:
                h = int.from_bytes(lora_name.encode()[-8:].rjust(8, b"\0"), "little")
                mod_rng = jax.random.fold_in(rng, h % (2**31))

            p = self.merge_params(adapter_params, lora_name)

            no_dropout = (
                getattr(lyco, "dropout", 0) == 0
                and getattr(lyco, "rank_dropout", 0) == 0
                and getattr(lyco, "module_dropout", 0) == 0
            )
            if (
                merged_forward
                and not lyco.bypass_mode
                and not lyco.not_supported
                and (not train or no_dropout)
            ):
                # dense-dW-free backward (functional/merged.py): in training,
                # algos with a factored cotangent reordering (LoRA/LoKr
                # linear) wrap the layer in a custom_vjp so the frozen base
                # never gets a dense xᵀ·dy weight-grad matmul — 106 ms/step
                # of the SDXL@1024 b4 profile. Same forward, exact grads.
                if (
                    train
                    and p is not None
                    and os.environ.get("LYCORIS_TPU_FACTORED_GRAD", "1") == "1"
                ):
                    from .functional import merged as fm

                    out_dim, in_dim = lyco.shape[0], lyco.shape[1]
                    fns = None
                    if fm.worth_factoring(
                        out_dim, in_dim,
                        # default 1024: r4 warm-cache A/B SDXL 1.3172→1.3437
                        # (+2.0%) / SD1.5 5.799→5.8959 (+1.7%) vs 512 — the
                        # harmonic-[512,1024) tiers (square-1280, 640-tier
                        # ff) prefer the dense dW.
                        int(os.environ.get("LYCORIS_TPU_FACTORED_MIN", "1024")),
                        n_tokens=x.size // x.shape[-1],
                    ):
                        fns = getattr(lyco, "factored_merged_fns", None)
                        fns = fns(mult) if fns is not None else None
                    if fns is not None:
                        recon_fn, dtheta_fn = fns
                        bx = None if b is None else b.astype(x.dtype)
                        if adapter.native_op is not None:
                            apply_fn = lambda xx, ww, bb: adapter.native_op(
                                xx, ww.astype(xx.dtype), bb
                            )
                            # native (…, H, T, D) cotangent: dx directly via
                            # einsum (no relayout), dy2d via the adapter's
                            # output converter (one transpose in bwd)
                            dx_fn = lambda g, ww: jnp.einsum(
                                "...htd,hdc->...tc", g,
                                ww.astype(g.dtype).reshape(
                                    g.shape[-3], g.shape[-1], in_dim
                                ),
                            )
                            dy2d_fn = lambda g: adapter.cf_out_inv(g).reshape(
                                -1, out_dim
                            )
                            return fm.factored_merged_apply(
                                x, w, bx, p, recon_fn=recon_fn,
                                dtheta_fn=dtheta_fn, apply_fn=apply_fn,
                                dx_fn=dx_fn, dy2d_fn=dy2d_fn,
                            )
                        apply_fn = lambda xx, ww, bb: lyco.op(
                            xx, ww.astype(xx.dtype), bb
                        )
                        out = fm.factored_merged_apply(
                            x, w, bx, p, recon_fn=recon_fn,
                            dtheta_fn=dtheta_fn, apply_fn=apply_fn,
                            dx_fn=lambda g, ww: jnp.matmul(g, ww.astype(g.dtype)),
                            dy2d_fn=lambda g: g.reshape(-1, out_dim),
                        )
                        return adapter.cf_out(out)
                w_m, b_m = lyco.get_merged_weight(w, b, params=p, multiplier=mult)
                b_m = None if b_m is None else b_m.astype(x.dtype)
                if adapter.native_op is not None:
                    # produce the native-layout output directly (e.g. the
                    # head split fused into the merged projection matmul)
                    return adapter.native_op(x, w_m.astype(x.dtype), b_m)
                out = lyco.op(x, w_m.astype(x.dtype), b_m)
                return adapter.cf_out(out)

            # org_forward: the FIRST call goes through ``next_fun`` so inner
            # interceptors (adapter stacking) participate; flax method
            # wrappers are single-shot (a second call re-registers params),
            # so any further calls — bypass algos like IA3/GLoRA call
            # org_forward again with modified inputs, module_dropout mixes in
            # the plain base — fall back to the functional reconstruction
            # from the adapter's extracted weights.
            called = [False]

            def org_forward(z):
                if not called[0]:
                    called[0] = True
                    return adapter.cf_out_inv(next_fun(adapter.cf_in_inv(z), *args[1:], **kwargs))
                return lyco.op(z, w.astype(z.dtype), None if b is None else b.astype(z.dtype))

            out = lyco.forward(
                x,
                org_weight=w,
                org_bias=b,
                params=p,
                multiplier=mult,
                train=train,
                rng=mod_rng,
                org_forward=org_forward,
            )
            return adapter.cf_out(out)

        return _interceptor

    def __call__(self, variables, *args, adapter_params=None, multiplier=None,
                 train=False, rng=None, method=None, model=None,
                 merged_forward=False, **kwargs):
        """Run the wrapped flax model with adapters applied."""
        import flax.linen as nn

        model = model if model is not None else getattr(self.graph, "model", None)
        assert model is not None, "graph was not built from a flax model"
        with nn.intercept_methods(
            self.interceptor(adapter_params, multiplier, train, rng, merged_forward)
        ):
            if method is not None:
                return model.apply(variables, *args, method=method, **kwargs)
            return model.apply(variables, *args, **kwargs)

    # -- merge ---------------------------------------------------------------
    def traced_merge(self, base_params, adapter_params=None, multiplier=1.0, dtype=None,
                     include_bypass=False):
        """Pure, jit-traceable merge: returns a new native params pytree with
        every adapter folded in. Used by the pre-merge train mode (merge all
        ΔW up front inside the step, then run the plain model — the layer
        sweep is a static unroll, so XLA schedules all the tiny rebuild
        matmuls concurrently ahead of the model's big ones)."""
        # rebuild containers without copying leaves (tracer-safe)
        new_params = jax.tree_util.tree_map(lambda x: x, base_params)

        def set_in(tree, path, value):
            sub = tree
            for k in path[:-1]:
                sub = sub[k]
            sub[path[-1]] = value

        for lora_name, lyco in self.lora_map.items():
            if lyco.not_supported or (lyco.bypass_mode and not include_bypass):
                continue
            node = self.node_map[lora_name]
            adapter = node.adapter
            if adapter.put_weights is None:  # quantized base: not mergeable
                continue
            sub = base_params
            for k in node.params_path:
                sub = sub[k]
            w, b = adapter.get_weights(sub)
            p = self.merge_params(adapter_params, lora_name)
            merged_w, merged_b = lyco.get_merged_weight(w, b, params=p, multiplier=multiplier)
            merged_w = merged_w.astype(w.dtype if dtype is None else dtype)
            if merged_b is not None and b is not None:
                merged_b = merged_b.astype(b.dtype)
            new_sub = adapter.put_weights(dict(sub), merged_w, merged_b)
            set_in(new_params, node.params_path, new_sub)
        return new_params

    def merge_to(self, weight=1.0, adapter_params=None):
        """Return a new native params pytree with every adapter merged in
        (functional analog of reference merge_to, base.py:326-342). Runs as
        ONE jitted program — merging eagerly dispatches thousands of tiny ops
        (fatal on remote-dispatch runtimes)."""
        if adapter_params is None:
            adapter_params = self.params_tree()
        params = jax.tree_util.tree_map(jnp.asarray, self.graph.params)

        merged = jax.jit(
            lambda bp, ap: self.traced_merge(bp, ap, multiplier=weight, include_bypass=True)
        )(params, adapter_params)
        return jax.tree_util.tree_map(lambda x: x, merged)

    def onfly_merge(self, weight=1.0, adapter_params=None):
        """Swap the graph's params for merged ones (inference-time merge;
        functional analog of base.py:344-374). Restore with onfly_restore."""
        self._cached_org_params = self.graph.params
        self.graph.params = self.merge_to(weight, adapter_params)
        return self.graph.params

    def onfly_restore(self):
        self.graph.params = self._cached_org_params
        del self._cached_org_params
        return self.graph.params

    def apply_max_norm_traced(self, full_tree, max_norm_value):
        """jit-safe max-norm pass over the whole adapter tree.

        Returns ``(updates, scaled_flags, norms)`` where ``updates`` maps each
        supporting module's lora_name to its post-scale param dict, and
        ``scaled_flags`` / ``norms`` are stacked traced vectors (one slot per
        supporting module, reference kohya.py:637-650 collects the same pair
        per module). Modules whose ``apply_max_norm`` is the base no-op
        (Full/Norm/IA3/GLoRA) are skipped statically."""
        updates, flags, norms = {}, [], []
        for lyco in self.loras:
            p = full_tree.get(lyco.lora_name)
            if p is None:
                continue
            new_p, scaled, norm = lyco.apply_max_norm(max_norm_value, p)
            if scaled is None:
                continue
            updates[lyco.lora_name] = new_p
            flags.append(jnp.asarray(scaled, jnp.float32))
            norms.append(jnp.asarray(norm, jnp.float32))
        if not flags:
            z = jnp.zeros((0,), jnp.float32)
            return updates, z, z
        return updates, jnp.stack(flags), jnp.stack(norms)

    def apply_max_norm_regularization(self, max_norm_value, adapter_params=None):
        """Returns (updated_params_tree, keys_scaled, mean_norm, max_norm)
        — pure version of wrapper.py:579-592."""
        key_scaled = 0
        norms = []
        updated = {}
        for lyco in self.loras:
            p = self.merge_params(adapter_params, lyco.lora_name)
            new_p, scaled, norm = lyco.apply_max_norm(max_norm_value, p)
            if scaled is None:
                continue
            updated[lyco.lora_name] = new_p
            norms.append(float(norm))
            key_scaled += int(scaled)
        if key_scaled == 0:
            return updated, 0, 0, 0
        return updated, key_scaled, sum(norms) / len(norms), max(norms)

    def prepare_optimizer_params(self, lr=None):
        param_data = {"params": self.trainable_params()}
        if lr is not None:
            param_data["lr"] = lr
        return [param_data]

    def get_trainable_params(self):
        return self.trainable_params()

    # -- checkpoint I/O --------------------------------------------------------
    def state_dict(self, adapter_params=None, dtype=None) -> dict:
        sd = {}
        for lyco in self.loras:
            p = self.merge_params(adapter_params, lyco.lora_name)
            for k, v in lyco.custom_state_dict(p).items():
                arr = np.asarray(v)
                if dtype is not None:
                    arr = arr.astype(dtype)
                sd[f"{lyco.lora_name}.{k}"] = arr
        return sd

    def load_state_dict(self, sd: dict, strict=False):
        missing, loaded = [], 0
        for lyco in self.loras:
            prefix = f"{lyco.lora_name}."
            local = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            if not local:
                missing.append(lyco.lora_name)
                continue
            lyco.load_state_dict(local)
            loaded += 1
        if strict and missing:
            raise KeyError(f"missing adapters in state dict: {missing}")
        return {"loaded": loaded, "missing": missing}

    def save_weights(self, file, dtype=None, metadata=None):
        from safetensors.numpy import save_file

        if metadata is not None and len(metadata) == 0:
            metadata = None
        sd = self.state_dict(dtype=dtype)
        if os.path.splitext(file)[1] == ".safetensors":
            save_file(sd, file, metadata)
        else:
            import torch

            torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, file)

    def load_weights(self, file):
        self.weights_sd = load_file_sd(file)
        return self.load_state_dict(self.weights_sd, strict=False)
