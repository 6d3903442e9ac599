"""lycoris_tpu.functional — stateless per-algorithm math (L0).

Mirrors the reference lycoris/functional package surface
(lycoris/functional/__init__.py:1-9): per-algorithm modules exposing
``weight_gen`` / ``diff_weight`` / ``bypass_forward_diff`` plus the shared
helpers from :mod:`.general`.
"""

from . import general
from . import locon
from . import loha
from . import lokr
from . import diag_oft
from . import boft

from .general import (
    FUNC_LIST,
    factorization,
    power2factorization,
    rebuild_tucker,
    tucker_weight,
    tucker_weight_from_conv,
    apply_dora_scale,
    op_by_ndim,
    linear,
    convnd,
)

__all__ = [
    "general",
    "locon",
    "loha",
    "lokr",
    "diag_oft",
    "boft",
    "FUNC_LIST",
    "factorization",
    "power2factorization",
    "rebuild_tucker",
    "tucker_weight",
    "tucker_weight_from_conv",
    "apply_dora_scale",
    "op_by_ndim",
    "linear",
    "convnd",
]
