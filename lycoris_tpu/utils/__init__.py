"""lycoris_tpu.utils — shared helpers (L5).

``str_bool`` mirrors reference lycoris/utils/__init__.py (coercing kohya
network_args string kwargs); the SVD extract / merge toolchain lives in
:mod:`lycoris_tpu.utils.extract` and :mod:`lycoris_tpu.utils.merge`.
"""

from __future__ import annotations

import hashlib
import math


def str_bool(val) -> bool:
    """Coerce kohya-style string kwargs to bool (reference utils str_bool)."""
    if isinstance(val, str):
        return val.lower() not in ("false", "0", "none", "")
    return bool(val)


def product(xs):
    return math.prod(xs)


def precalculate_safetensors_hashes(tensors, metadata):
    """sha256 over the serialized safetensors payload
    (reference utils/__init__.py:19-41): returns (model_hash, legacy_hash).
    """
    import safetensors.numpy
    import numpy as np

    tensors = {k: np.asarray(v) for k, v in tensors.items()}
    bytes_ = safetensors.numpy.save(tensors, metadata)
    b = hashlib.sha256()
    b.update(bytes_)
    model_hash = b.hexdigest()[0:8]

    legacy = hashlib.sha256()
    legacy.update(bytes_[0x100000 : 0x100000 + 0x10000])
    legacy_hash = legacy.hexdigest()[0:8]
    return model_hash, legacy_hash


from .preset import read_preset  # noqa: E402,F401
