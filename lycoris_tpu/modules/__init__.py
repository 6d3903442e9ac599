"""lycoris_tpu.modules — adapter module layer (L1).

Registry mirrors reference lycoris/modules/__init__.py:19-46:
``MODULE_LIST`` detection order, ``get_module(state_dict, lora_name)``
first-match autodetection, and ``make_module`` shape-driven reconstruction.
"""

from __future__ import annotations

from .base import LayerInfo, LycorisBaseModule
from .locon import LoConModule
from .loha import LohaModule
from .lokr import LokrModule
from .ia3 import IA3Module
from .full import FullModule
from .norms import NormModule
from .diag_oft import DiagOFTModule
from .boft import ButterflyOFTModule
from .glora import GLoRAModule
from .dylora import DyLoraModule

# detection order matters: first algo_check hit wins (modules/__init__.py:19-31)
MODULE_LIST = [
    LoConModule,
    LohaModule,
    IA3Module,
    LokrModule,
    FullModule,
    NormModule,
    DiagOFTModule,
    ButterflyOFTModule,
    GLoRAModule,
    DyLoraModule,
]


def get_module(lyco_state_dict, lora_name):
    """Return (module_class, ordered_params) for the first matching algo
    (reference modules/__init__.py:33-37)."""
    for module_class in MODULE_LIST:
        if module_class.algo_check(lyco_state_dict, lora_name):
            return module_class, module_class.extract_state_dict(lyco_state_dict, lora_name)
    return None, None


def make_module(module_class, params, lora_name, layer: LayerInfo, dtype=None):
    """Instantiate from extracted params; None when unsupported
    (reference modules/__init__.py:40-46).

    Loaded tensors are normalized to ``dtype`` (default fp32) — real LyCORIS
    files are usually fp16, and the reference upcasts on load into its fp32
    parameters (torch ``copy_`` casts); fp16 compute would underflow the
    merge math on TPU."""
    import jax.numpy as jnp

    try:
        module = module_class.make_module_from_state_dict(lora_name, layer, *params)
    except NotImplementedError:
        return None
    if module is not None:
        target = jnp.float32 if dtype is None else dtype
        module.params = {
            k: v.astype(target) if jnp.issubdtype(v.dtype, jnp.floating) else v
            for k, v in module.params.items()
        }
    return module


__all__ = [
    "LayerInfo",
    "LycorisBaseModule",
    "LoConModule",
    "LohaModule",
    "LokrModule",
    "IA3Module",
    "FullModule",
    "NormModule",
    "DiagOFTModule",
    "ButterflyOFTModule",
    "GLoRAModule",
    "DyLoraModule",
    "MODULE_LIST",
    "get_module",
    "make_module",
]
