"""Mesh + sharding utilities — the TPU-native distributed story (SURVEY §2.4).

The reference has NO distributed code (kohya/accelerate own DDP). Here the
equivalents are compiler-driven GSPMD:

- :func:`make_mesh` — build a ``jax.sharding.Mesh`` over (data, model) axes;
  ICI handles intra-slice collectives, DCN multi-slice (slice topology comes
  from ``jax.devices()`` ordering).
- :func:`shard_base_params` — shard the frozen base model's big weights over
  the ``model`` axis (tensor-sharded storage; XLA inserts all-gathers where
  layers need full weights) and replicate the small ones.
- :func:`replicate` — adapter params + optimizer state are tiny; they stay
  replicated so their update is collective-free (grads all-reduce over
  ``data`` only, inserted automatically by GSPMD from output shardings).

No hand-written collectives: sharding annotations in/out of the jitted train
step are the whole story.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data: int | None = None, model: int = 1, axis_names=("data", "model")) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def replicated_spec_tree(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def base_param_spec(path_leaf, mesh: Mesh, min_size: int = 2**16) -> P:
    """PartitionSpec for one frozen-base weight: shard the largest divisible
    dim over the ``model`` axis when the tensor is big enough."""
    x = path_leaf
    model_size = mesh.shape.get("model", 1)
    if model_size <= 1 or x.size < min_size or x.ndim == 0:
        return P()
    # prefer the largest axis divisible by the model-axis size
    order = sorted(range(x.ndim), key=lambda i: -x.shape[i])
    for i in order:
        if x.shape[i] % model_size == 0 and x.shape[i] >= model_size:
            spec = [None] * x.ndim
            spec[i] = "model"
            return P(*spec)
    return P()


def shard_base_params(params, mesh: Mesh, min_size: int = 2**16):
    """Apply :func:`base_param_spec` over a frozen-base param pytree."""
    specs = jax.tree_util.tree_map(lambda x: base_param_spec(x, mesh, min_size), params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    ), specs


def batch_spec(ndim: int) -> P:
    return P("data", *[None] * (ndim - 1))


def shard_batch(batch, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_spec(x.ndim))), batch
    )
