"""kohya-ss/sd-scripts trainer contract (L3) — TPU-native.

Reference contract: lycoris/kohya.py (create_network,
create_network_from_weights, LycorisNetworkKohya, kohya.py:30-772):
- ``create_network(multiplier, network_dim, network_alpha, vae, text_encoder,
  unet, **network_args)`` with the full network_args string-kwarg grammar
  (rs_lora, train_t5xxl, LoRA+ ratios, ...);
- dual-tree targeting with ``UNET_TARGET_REPLACE_MODULE/NAME`` and
  ``TEXT_ENCODER_TARGET_REPLACE_MODULE/NAME``; prefixes ``lora_unet`` /
  ``lora_te`` (``lora_te1``/``lora_te2`` for multi-TE SDXL, kohya.py:507-536);
- ``prepare_optimizer_params(te_lr, unet_lr, lr)`` with LoRA+ (params named
  ``lora_up`` get lr×ratio in a separate group, kohya.py:666-731);
- ``save_weights`` with ``sshs_model_hash`` metadata (kohya.py:749-772).

Here text_encoder/unet are :class:`~lycoris_tpu.graph.ModelGraph` objects (or
torch modules / anything ``_as_graph`` accepts); ``vae`` is accepted and
ignored exactly like the reference. The trainer drives everything through
pure param trees — see lycoris_tpu.trainer for the pjit train step.
"""

from __future__ import annotations

import os

import numpy as np

from .config import PRESET
from .logging import logger
from .modules import get_module, make_module
from .utils import precalculate_safetensors_hashes, str_bool
from .utils.preset import read_preset
from .wrapper import (
    LycorisNetwork,
    _as_graph,
    deprecated_arg_dict,
    load_file_sd,
)


def create_network(multiplier, network_dim, network_alpha, vae, text_encoder, unet, **kwargs):
    """network_args parsing parity with reference kohya.py:30-145."""
    for key, value in list(kwargs.items()):
        if key in deprecated_arg_dict:
            logger.warning(f"{key} is deprecated. Please use {deprecated_arg_dict[key]} instead.")
            kwargs[deprecated_arg_dict[key]] = value
    if network_dim is None:
        network_dim = 4
    conv_dim = int(kwargs.get("conv_dim", network_dim) or network_dim)
    conv_alpha = float(kwargs.get("conv_alpha", network_alpha) or network_alpha)
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
    block_size = int(kwargs.get("block_size", None) or 4)
    train_norm = str_bool(kwargs.get("train_norm", False))
    constraint = float(kwargs.get("constraint", None) or 0)
    rescaled = str_bool(kwargs.get("rescaled", False))
    weight_decompose = str_bool(kwargs.get("dora_wd", False))
    wd_on_output = str_bool(kwargs.get("wd_on_output", True))
    full_matrix = str_bool(kwargs.get("full_matrix", False))
    bypass_mode = str_bool(kwargs.get("bypass_mode", False))
    rs_lora = str_bool(kwargs.get("rs_lora", False))
    unbalanced_factorization = str_bool(kwargs.get("unbalanced_factorization", False))
    train_t5xxl = str_bool(kwargs.get("train_t5xxl", False))

    def _ratio(key):
        v = kwargs.get(key, None)
        return float(v) if v is not None else None

    loraplus_lr_ratio = _ratio("loraplus_lr_ratio")
    loraplus_unet_lr_ratio = _ratio("loraplus_unet_lr_ratio")
    loraplus_text_encoder_lr_ratio = _ratio("loraplus_text_encoder_lr_ratio")

    preset_str = kwargs.get("preset", "full")
    preset = PRESET[preset_str] if preset_str in PRESET else read_preset(preset_str)
    assert preset is not None
    LycorisNetworkKohya.apply_preset(preset)

    logger.info(f"Using rank adaptation algo: {algo}")
    if algo == "ia3" and preset_str != "ia3":
        logger.warning("It is recommended to use preset ia3 for IA^3 algorithm")

    network = LycorisNetworkKohya(
        text_encoder,
        unet,
        multiplier=multiplier,
        lora_dim=network_dim,
        conv_lora_dim=conv_dim,
        alpha=network_alpha,
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
        rs_lora=rs_lora,
        unbalanced_factorization=unbalanced_factorization,
        train_t5xxl=train_t5xxl,
        rng=kwargs.get("rng", None),
    )
    if (
        loraplus_lr_ratio is not None
        or loraplus_unet_lr_ratio is not None
        or loraplus_text_encoder_lr_ratio is not None
    ):
        network.set_loraplus_lr_ratio(
            loraplus_lr_ratio, loraplus_unet_lr_ratio, loraplus_text_encoder_lr_ratio
        )
    return network


def create_network_from_weights(
    multiplier, file, vae, text_encoder, unet, weights_sd=None, for_inference=False, **kwargs
):
    """Reference kohya.py:148-234."""
    if weights_sd is None:
        weights_sd = load_file_sd(file)

    network = LycorisNetworkKohya(text_encoder, unet, init_only=True)
    network.multiplier = multiplier

    unet_graph = _as_graph(unet)
    te_graphs = network._te_graphs(text_encoder)

    from .wrapper import LycorisNetwork

    def load_tree(graph, prefix, out_list):
        sub = LycorisNetwork(graph, init_only=True)
        sub.lora_prefix = prefix
        sub.multiplier = multiplier
        wanted = {
            key.split(".")[0]: None
            for key in weights_sd
            if "." in key and key.split(".")[0].startswith(prefix)
        }
        for name, node in graph.named_modules():
            lora_name = f"{prefix}_{name}".replace(".", "_")
            if lora_name in wanted:
                wanted[lora_name] = node
        for lora_name, node in wanted.items():
            if node is None or node.adapter is None:
                continue
            lyco_type, params = get_module(weights_sd, lora_name)
            if lyco_type is None:
                continue
            mod = make_module(lyco_type, params, lora_name, node.adapter.layer_info)
            if mod is not None:
                mod.multiplier = multiplier
                out_list.append(mod)
                for n in (network, sub):
                    n.lora_map[lora_name] = mod
                    n.node_map[lora_name] = node
                sub.loras.append(mod)
        network.sub_networks[prefix] = sub

    load_tree(unet_graph, LycorisNetworkKohya.LORA_PREFIX_UNET, network.unet_loras)
    network.unet_graph = unet_graph
    network.graph = unet_graph
    if te_graphs:
        for i, (prefix, g) in enumerate(te_graphs):
            load_tree(g, prefix, network.text_encoder_loras)
        network.te_graphs_list = te_graphs
    network.loras = network.text_encoder_loras + network.unet_loras
    logger.info(f"{len(network.loras)} Modules Loaded")
    return network, weights_sd


class LycorisNetworkKohya(LycorisNetwork):
    """Dual-tree (TE(s) + UNet) targeting network (kohya.py:237-772)."""

    ENABLE_CONV = True
    UNET_TARGET_REPLACE_MODULE = PRESET["full"]["unet_target_module"]
    UNET_TARGET_REPLACE_NAME = PRESET["full"]["unet_target_name"]
    TEXT_ENCODER_TARGET_REPLACE_MODULE = PRESET["full"]["text_encoder_target_module"]
    TEXT_ENCODER_TARGET_REPLACE_NAME = []
    LORA_PREFIX_UNET = "lora_unet"
    LORA_PREFIX_TEXT_ENCODER = "lora_te"
    MODULE_ALGO_MAP = {}
    NAME_ALGO_MAP = {}
    USE_FNMATCH = False

    _KOHYA_DEFAULTS = None

    @classmethod
    def apply_preset(cls, preset):
        if cls._KOHYA_DEFAULTS is None:
            cls._KOHYA_DEFAULTS = {
                "ENABLE_CONV": cls.ENABLE_CONV,
                "UNET_TARGET_REPLACE_MODULE": list(cls.UNET_TARGET_REPLACE_MODULE),
                "UNET_TARGET_REPLACE_NAME": list(cls.UNET_TARGET_REPLACE_NAME),
                "TEXT_ENCODER_TARGET_REPLACE_MODULE": list(cls.TEXT_ENCODER_TARGET_REPLACE_MODULE),
                "TEXT_ENCODER_TARGET_REPLACE_NAME": list(cls.TEXT_ENCODER_TARGET_REPLACE_NAME),
                "MODULE_ALGO_MAP": dict(cls.MODULE_ALGO_MAP),
                "NAME_ALGO_MAP": dict(cls.NAME_ALGO_MAP),
                "USE_FNMATCH": cls.USE_FNMATCH,
            }
        if "enable_conv" in preset:
            cls.ENABLE_CONV = preset["enable_conv"]
        if "unet_target_module" in preset:
            cls.UNET_TARGET_REPLACE_MODULE = preset["unet_target_module"]
        if "unet_target_name" in preset:
            cls.UNET_TARGET_REPLACE_NAME = preset["unet_target_name"]
        if "text_encoder_target_module" in preset:
            cls.TEXT_ENCODER_TARGET_REPLACE_MODULE = preset["text_encoder_target_module"]
        if "text_encoder_target_name" in preset:
            cls.TEXT_ENCODER_TARGET_REPLACE_NAME = preset["text_encoder_target_name"]
        if "module_algo_map" in preset:
            cls.MODULE_ALGO_MAP = preset["module_algo_map"]
        if "name_algo_map" in preset:
            cls.NAME_ALGO_MAP = preset["name_algo_map"]
        if "use_fnmatch" in preset:
            cls.USE_FNMATCH = preset["use_fnmatch"]
        return cls

    @classmethod
    def reset_preset(cls):
        if cls._KOHYA_DEFAULTS is not None:
            for k, v in cls._KOHYA_DEFAULTS.items():
                setattr(cls, k, v)

    def _te_graphs(self, text_encoder):
        if not text_encoder:
            return []
        tes = text_encoder if isinstance(text_encoder, list) else [text_encoder]
        use_index = isinstance(text_encoder, list)
        return [
            (
                self.LORA_PREFIX_TEXT_ENCODER + (f"{i + 1}" if use_index else ""),
                _as_graph(te),
            )
            for i, te in enumerate(tes)
        ]

    def __init__(self, text_encoder, unet, train_t5xxl=False, init_only=False, **kwargs):
        self.train_t5xxl = train_t5xxl
        self.loraplus_lr_ratio = None
        self.loraplus_unet_lr_ratio = None
        self.loraplus_text_encoder_lr_ratio = None
        self.unet_loras: list = []
        self.text_encoder_loras: list = []
        self.sub_networks: dict = {}

        if init_only:
            super().__init__(None, init_only=True)
            return

        cls = type(self)
        network_module = kwargs.get("network_module", "locon")
        # NOTE: the reference compares ``network_module == GLoRAModule`` (a
        # class) against the algo STRING (kohya.py:498-505), so its GLoRA
        # target-narrowing is dead code; we honor the evident intent.
        if network_module == "glora":
            logger.info("GLoRA enabled, only train transformer")
            unet_targets = ["Transformer2DModel", "Attention"]
            unet_target_names = []
        else:
            unet_targets = list(cls.UNET_TARGET_REPLACE_MODULE)
            unet_target_names = list(cls.UNET_TARGET_REPLACE_NAME)

        # build per-tree sub-networks sharing one targeting engine
        self.te_graphs_list = self._te_graphs(text_encoder)
        for prefix, g in self.te_graphs_list:
            sub = LycorisNetwork(
                g,
                lora_prefix_override=prefix,
                target_module_override=list(cls.TEXT_ENCODER_TARGET_REPLACE_MODULE),
                target_name_override=list(cls.TEXT_ENCODER_TARGET_REPLACE_NAME),
                **kwargs,
            )
            self.sub_networks[prefix] = sub
            self.text_encoder_loras.extend(sub.loras)
        logger.info(f"create LyCORIS for Text Encoder: {len(self.text_encoder_loras)} modules.")

        self.unet_graph = _as_graph(unet)
        unet_sub = LycorisNetwork(
            self.unet_graph,
            lora_prefix_override=cls.LORA_PREFIX_UNET,
            target_module_override=unet_targets,
            target_name_override=unet_target_names,
            **kwargs,
        )
        self.sub_networks[cls.LORA_PREFIX_UNET] = unet_sub
        self.unet_loras = list(unet_sub.loras)
        logger.info(f"create LyCORIS for U-Net: {len(self.unet_loras)} modules.")

        # flatten into the base-network fields so every inherited method works
        self.loras = self.text_encoder_loras + self.unet_loras
        self.lora_map = {}
        self.node_map = {}
        self.algo_table = {}
        for prefix, sub in self.sub_networks.items():
            self.lora_map.update(sub.lora_map)
            self.node_map.update(sub.node_map)
        for lora in self.loras:
            self.algo_table[lora.__class__.__name__] = (
                self.algo_table.get(lora.__class__.__name__, 0) + 1
            )
        logger.info(f"module type table: {self.algo_table}")
        self.multiplier = kwargs.get("multiplier", 1.0)
        self.weights_sd = None
        self.graph = self.unet_graph

        names = set()
        for lora in self.loras:
            assert lora.lora_name not in names, f"duplicated lora name: {lora.lora_name}"
            names.add(lora.lora_name)

    # -- lifecycle (kohya.py:589-650) ----------------------------------------
    def apply_to(self, text_encoder=None, unet=None, apply_text_encoder=None, apply_unet=None):
        assert apply_text_encoder is not None and apply_unet is not None, "internal error: flag not set"
        if apply_text_encoder:
            logger.info("enable LyCORIS for text encoder")
        else:
            self.text_encoder_loras = []
        if apply_unet:
            logger.info("enable LyCORIS for U-Net")
        else:
            self.unet_loras = []
        self.loras = self.text_encoder_loras + self.unet_loras
        keep = {l.lora_name for l in self.loras}
        self.lora_map = {k: v for k, v in self.lora_map.items() if k in keep}
        if self.weights_sd:
            info = self.load_state_dict(self.weights_sd, False)
            logger.info(f"weights are loaded: {info}")

    def merge_to(self, text_encoder=None, unet=None, weights_sd=None, dtype=None, device=None, weight=1.0):
        """Merge into every tree; returns {prefix: merged native params}."""
        if weights_sd is not None:
            self.load_state_dict(weights_sd)
        merged = {}
        for prefix, sub in self.sub_networks.items():
            sub_tree = {l.lora_name: dict(l.params) for l in sub.loras}
            merged[prefix] = sub.merge_to(weight, adapter_params=sub_tree)
        return merged

    # -- LoRA+ optimizer groups (kohya.py:666-731) -----------------------------
    def set_loraplus_lr_ratio(self, loraplus_lr_ratio, loraplus_unet_lr_ratio, loraplus_text_encoder_lr_ratio):
        self.loraplus_lr_ratio = loraplus_lr_ratio
        self.loraplus_unet_lr_ratio = loraplus_unet_lr_ratio
        self.loraplus_text_encoder_lr_ratio = loraplus_text_encoder_lr_ratio
        logger.info(f"LoRA+ UNet LR Ratio: {self.loraplus_unet_lr_ratio or self.loraplus_lr_ratio}")
        logger.info(
            f"LoRA+ Text Encoder LR Ratio: {self.loraplus_text_encoder_lr_ratio or self.loraplus_lr_ratio}"
        )

    def prepare_optimizer_params(self, text_encoder_lr=None, unet_lr: float = 1e-4, learning_rate=None):
        all_params = []
        lr_descriptions = []

        def assemble_params(loras, lr, ratio):
            groups = {"lora": {}, "plus": {}}
            for lora in loras:
                for name, param in lora.trainable_params().items():
                    qual = f"{lora.lora_name}.{name}"
                    if ratio is not None and "lora_up" in name:
                        groups["plus"][qual] = param
                    else:
                        groups["lora"][qual] = param
            params, descriptions = [], []
            for key, group in groups.items():
                if not group:
                    continue
                param_data = {"params": group}
                if lr is not None:
                    param_data["lr"] = lr * ratio if key == "plus" else lr
                if param_data.get("lr", None) in (0, None):
                    logger.info("NO LR skipping!")
                    continue
                params.append(param_data)
                descriptions.append("plus" if key == "plus" else "")
            return params, descriptions

        if self.text_encoder_loras:
            params, descriptions = assemble_params(
                self.text_encoder_loras,
                text_encoder_lr if text_encoder_lr is not None else learning_rate,
                self.loraplus_text_encoder_lr_ratio or self.loraplus_lr_ratio,
            )
            all_params.extend(params)
            lr_descriptions.extend(["textencoder" + (" " + d if d else "") for d in descriptions])

        if self.unet_loras:
            params, descriptions = assemble_params(
                self.unet_loras,
                unet_lr if unet_lr is not None else learning_rate,
                self.loraplus_unet_lr_ratio or self.loraplus_lr_ratio,
            )
            all_params.extend(params)
            lr_descriptions.extend(["unet" + (" " + d if d else "") for d in descriptions])

        return all_params, lr_descriptions

    def enable_gradient_checkpointing(self):
        """kohya's train_network.py calls this unconditionally when
        ``--gradient_checkpointing`` is set (reference kohya.py:733-735 is a
        no-op too). The TPU mapping is the trainer's remat tier
        (:mod:`lycoris_tpu.trainer` ``remat=`` / ``LYCORIS_TPU_REMAT``), which
        wraps the jitted step in ``jax.checkpoint`` — record the request so a
        host trainer can read it when building the step."""
        self.gradient_checkpointing = True

    def prepare_grad_etc(self, *args):
        """Reference kohya.py:737-738 flips requires_grad on. JAX grads are
        positional (whatever is passed as the differentiated argument), so
        trainability is already pinned by each module's ``trainable`` set —
        nothing to flip; kept for the drop-in call contract."""

    def on_epoch_start(self, *args):
        """Reference kohya.py:740-741 calls ``self.train()``; JAX modules are
        stateless — train/eval is the ``train=`` argument of each forward."""

    def on_step_start(self, *args):
        pass

    def get_trainable_params(self):
        return self.trainable_params()

    def save_weights(self, file, dtype=None, metadata=None):
        from safetensors.numpy import save_file

        if metadata is not None and len(metadata) == 0:
            metadata = None
        sd = self.state_dict(dtype=dtype)
        if os.path.splitext(file)[1] == ".safetensors":
            if metadata is None:
                metadata = {}
            model_hash, _ = precalculate_safetensors_hashes(sd, {})
            metadata["sshs_model_hash"] = model_hash
            save_file(sd, file, metadata)
        else:
            import torch

            torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, file)

    # -- runtime ---------------------------------------------------------------
    def apply_unet(self, variables, *args, model=None, **kw):
        sub = self.sub_networks[type(self).LORA_PREFIX_UNET]
        return sub(variables, *args, model=model, **kw)

    def apply_text_encoder(self, idx_or_variables, *args, **kw):
        if isinstance(idx_or_variables, int):
            prefix, _ = self.te_graphs_list[idx_or_variables]
            return self.sub_networks[prefix](*args, **kw)
        prefix, _ = self.te_graphs_list[0]
        return self.sub_networks[prefix](idx_or_variables, *args, **kw)
