"""LoRA / LoCon functional API — TPU-native.

Parity contract with reference lycoris/functional/locon.py:
- ``weight_gen`` (locon.py:10-34): kaiming-uniform down, zero up, optional
  tucker mid for convs with non-1 kernels.
- ``diff_weight`` (locon.py:37-61): ΔW = gamma * up @ down (or tucker rebuild).
- ``bypass_forward_diff`` (locon.py:64-85): chained down→(mid)→up ops, * gamma.

JAX changes: ``weight_gen`` takes an explicit PRNG key; arrays are jnp;
everything is jit-traceable. Weight layout is torch-style (out, in, *k) so
state dicts remain checkpoint-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .general import (
    kaiming_uniform,
    convnd,
    op_by_ndim,
    op_precision,
    rebuild_tucker,
)


def weight_gen(key: jax.Array, org_weight_shape, rank: int, tucker: bool = True, dtype=jnp.float32):
    """Generate (down, up, mid) params for a layer with torch-layout weight shape.

    ``org_weight_shape``: (out_dim, in_dim, *k) — or a live array, whose
    shape is used (reference API passes the tensor itself).
    """
    if hasattr(org_weight_shape, "shape"):
        org_weight_shape = org_weight_shape.shape
    out_dim, in_dim, *k = org_weight_shape
    k_down, k_mid = jax.random.split(key)
    if k and tucker:
        down = kaiming_uniform(k_down, (rank, in_dim, *(1 for _ in k)), dtype=dtype)
        up = jnp.zeros((out_dim, rank, *(1 for _ in k)), dtype=dtype)
        mid = kaiming_uniform(k_mid, (rank, rank, *k), dtype=dtype)
        return down, up, mid
    down = kaiming_uniform(k_down, (rank, in_dim, *k), dtype=dtype)
    up = jnp.zeros((out_dim, rank, *(1 for _ in k)), dtype=dtype) if k else jnp.zeros((out_dim, rank), dtype=dtype)
    return down, up, None


def diff_weight(*weights, gamma=1.0) -> jax.Array:
    """ΔW = gamma * up@down (low-rank) or tucker rebuild. Output (O, I, *k)."""
    d, u, m = weights
    R, I, *k = d.shape
    O = u.shape[0]
    u = u * gamma
    if m is None:
        result = jnp.matmul(
            u.reshape(-1, u.shape[1]),
            d.reshape(d.shape[0], -1),
            precision=op_precision(u, d),
        )
    else:
        R, R2, *k = m.shape
        u = u.reshape(u.shape[0], -1).T
        d = d.reshape(d.shape[0], -1)
        result = rebuild_tucker(m, u, d)
    return result.reshape(O, I, *k)


def bypass_forward_diff(x, org_out, *weights, gamma=1.0, extra_args={}):
    """Low-rank bypass: run x through down (strided), then up — never builds ΔW.

    ``org_out`` is unused (kept for the uniform functional signature, like the
    reference). Input layout is channels-first for convs.
    """
    d, u, m = weights
    op = op_by_ndim(d.ndim)
    if m is not None:
        down = op(x, d)
        mid = convnd(down, m, **extra_args)
        up = op_by_ndim(u.ndim)(mid, u)
    else:
        down = op(x, d, **extra_args)
        up = op_by_ndim(u.ndim)(down, u)
    return up * gamma
