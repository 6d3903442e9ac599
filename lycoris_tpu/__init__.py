"""lycoris_tpu — a TPU-native (JAX/Flax/Pallas) rebuild of LyCORIS.

Parameter-efficient fine-tuning adapters (LoRA/LoCon, LoHa, LoKr, DyLoRA,
GLoRA, (IA)^3, Diag-OFT, BOFT, full, norms) for JAX/Flax models, with:

- a stateless functional core (:mod:`lycoris_tpu.functional`),
- adapter modules as pytree-friendly param dicts (:mod:`lycoris_tpu.modules`),
- a network wrapper with preset/regex targeting that patches Flax param
  trees instead of monkey-patching forwards (:mod:`lycoris_tpu.wrapper`),
- safetensors checkpoint I/O byte-compatible with PyTorch LyCORIS files,
- fused Pallas TPU kernels for the hot ΔW math (:mod:`lycoris_tpu.ops`),
- a pjit/GSPMD sharded fine-tune path (:mod:`lycoris_tpu.parallel`).

The reference implementation being rebuilt is KohakuBlueleaf/LyCORIS
(pure PyTorch); citations in docstrings point into that tree as
``lycoris/<file>:<lines>``.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("LYCORIS_FORCE_CPU", "0") == "1":
    # some TPU plugins (axon) force-select themselves and ignore
    # JAX_PLATFORMS; offline tooling can pin CPU through the config API
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from . import functional
from . import modules
from . import utils
from .logging import logger
from .graph import ModelGraph
from .wrapper import (
    LycorisNetwork,
    create_lycoris,
    create_lycoris_from_weights,
)

# module classes at package top level, mirroring reference
# lycoris/__init__.py:10-18 (plus the two it omits: IA3, BOFT)
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
from .modules import make_module

# kohya layer is optional in the reference (lycoris/__init__.py:1-26 wraps it
# in try/except); here it has no extra deps but we keep the same surface
try:
    from . import kohya
except ImportError:  # pragma: no cover
    kohya = None

__all__ = [
    "functional",
    "modules",
    "utils",
    "kohya",
    "logger",
    "ModelGraph",
    "LycorisNetwork",
    "create_lycoris",
    "create_lycoris_from_weights",
    "LoConModule",
    "LohaModule",
    "LokrModule",
    "DyLoraModule",
    "GLoRAModule",
    "NormModule",
    "FullModule",
    "IA3Module",
    "DiagOFTModule",
    "ButterflyOFTModule",
    "make_module",
    "__version__",
]
