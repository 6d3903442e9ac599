"""Training data pipeline: native (C++) safetensors shard loader.

The reference leaves data loading to the host trainer (kohya's torch
DataLoader). The TPU trainer gets its own input pipeline:

- Python parses safetensors shard headers (the 8-byte length + JSON prefix)
  and registers raw (file, offset, nbytes) tensor records;
- ``lycoris_tpu/native/loader.cpp`` mmaps the shards and assembles batches on
  a worker thread pool with a bounded prefetch queue — zero GIL on the data
  plane (built on demand with g++; a pure-numpy fallback covers environments
  without a toolchain).

Usage::

    ds = ShardDataset.from_dir("latents/", key="latents")
    for batch in ds.epoch(batch_size=8, seed=0):   # np.ndarray (B, *shape)
        ...
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
import subprocess

import numpy as np

from .logging import logger

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libloader.so")

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": np.uint16,  # raw bits; cast with jnp.bfloat16 via view
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def parse_safetensors_header(path: str):
    """Return (header_dict, data_offset) without reading tensor data."""
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
    return header, 8 + n


def _build_native() -> bool:
    if os.path.exists(_SO_PATH):
        return True
    src = os.path.join(_NATIVE_DIR, "loader.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", src, "-o", _SO_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # pragma: no cover
        logger.warning(f"native loader build failed ({e}); using numpy fallback")
        return False


class _NativeLib:
    _lib = None

    @classmethod
    def get(cls):
        if cls._lib is None and _build_native():
            lib = ctypes.CDLL(_SO_PATH)
            lib.loader_create.restype = ctypes.c_void_p
            lib.loader_create.argtypes = [ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32]
            lib.loader_add_file.restype = ctypes.c_int
            lib.loader_add_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.loader_add_record.restype = ctypes.c_int
            lib.loader_add_record.argtypes = [ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint64, ctypes.c_uint64]
            lib.loader_start.restype = ctypes.c_int
            lib.loader_start.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_uint64]
            lib.loader_next.restype = ctypes.c_int64
            lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.loader_n_batches.restype = ctypes.c_uint64
            lib.loader_n_batches.argtypes = [ctypes.c_void_p]
            lib.loader_destroy.argtypes = [ctypes.c_void_p]
            cls._lib = lib
        return cls._lib


class ShardDataset:
    """Uniform-shaped tensors spread across safetensors shards."""

    def __init__(self, records, shape, dtype, files):
        self.records = records  # [(file_idx, offset, nbytes)]
        self.shape = tuple(shape)
        self.dtype = dtype
        self.files = files
        self.item_nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize

    @staticmethod
    def from_dir(path: str, key_prefix: str = "", ext: str = ".safetensors") -> "ShardDataset":
        files, records = [], []
        shape = dtype = None
        names = sorted(f for f in os.listdir(path) if f.endswith(ext))
        if not names:
            raise FileNotFoundError(f"no {ext} shards in {path}")
        for fname in names:
            full = os.path.join(path, fname)
            header, base = parse_safetensors_header(full)
            fidx = len(files)
            files.append(full)
            for key, info in header.items():
                if key == "__metadata__" or not key.startswith(key_prefix):
                    continue
                if shape is None:
                    shape = tuple(info["shape"])
                    dtype = _DTYPES[info["dtype"]]
                elif tuple(info["shape"]) != shape:
                    raise ValueError(f"{key}: shape {info['shape']} != {shape}")
                off0, off1 = info["data_offsets"]
                records.append((fidx, base + off0, off1 - off0))
        return ShardDataset(records, shape, dtype, files)

    def __len__(self):
        return len(self.records)

    def epoch(self, batch_size: int, seed: int = 0, n_threads: int = 4, queue_depth: int = 4):
        """Yield shuffled (B, *shape) numpy batches (drop-remainder)."""
        order = np.random.default_rng(seed).permutation(len(self.records)).astype(np.int64)
        lib = _NativeLib.get()
        if lib is None:
            yield from self._epoch_numpy(order, batch_size)
            return

        h = lib.loader_create(self.item_nbytes, batch_size, n_threads, queue_depth)
        try:
            for f in self.files:
                if lib.loader_add_file(h, f.encode()) < 0:
                    raise OSError(f"mmap failed: {f}")
            for fidx, off, nb in self.records:
                if lib.loader_add_record(h, fidx, off, nb) < 0:
                    raise ValueError(f"bad record {(fidx, off, nb)}")
            lib.loader_start(h, order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(order))
            buf = np.empty(batch_size * self.item_nbytes, np.uint8)
            n_batches = lib.loader_n_batches(h)
            for _ in range(n_batches):
                idx = lib.loader_next(h, buf.ctypes.data_as(ctypes.c_char_p))
                if idx < 0:
                    break
                yield buf.view(self.dtype).reshape(batch_size, *self.shape).copy()
        finally:
            lib.loader_destroy(h)

    def _epoch_numpy(self, order, batch_size):  # fallback data plane
        handles = [open(f, "rb") for f in self.files]
        try:
            n = len(order) // batch_size
            for b in range(n):
                out = np.empty((batch_size, *self.shape), self.dtype)
                for i in range(batch_size):
                    fidx, off, nb = self.records[order[b * batch_size + i]]
                    handles[fidx].seek(off)
                    out[i] = np.frombuffer(handles[fidx].read(nb), self.dtype).reshape(self.shape)
                yield out
        finally:
            for f in handles:
                f.close()
