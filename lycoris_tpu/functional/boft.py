"""BOFT (butterfly orthogonal fine-tuning) functional API — TPU-native.

Parity contract with reference lycoris/functional/boft.py:
- ``weight_gen`` (boft.py:13-34): zero blocks [m, num, b, b] via
  power2factorization; m defaults to the max butterfly depth
  popcount(block_num-1)+1.
- ``diff_weight`` (boft.py:37-71): m levels of butterfly permutation
  (unflatten/transpose/flatten on the output axis) + batched block rotation
  by R_i from the shared Cayley transform; returns rotated_W - W.
- ``bypass_forward_diff`` (boft.py:74-122): same butterfly applied to the
  base layer's outputs (feature-last), returns the delta.

The level loop is a static Python loop (m is a compile-time constant —
at most log2(block_num)+1), so XLA sees a fixed chain of
reshape/transpose/batched-matmul: MXU-friendly, no gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .general import power2factorization, op_precision
from .diag_oft import get_r


def weight_gen(org_weight_shape, max_block_size: int, boft_m: int = -1, rescale: bool = False, dtype=jnp.float32):
    if hasattr(org_weight_shape, "shape"):
        org_weight_shape = org_weight_shape.shape
    out_dim, *rest = org_weight_shape
    block_size, block_num = power2factorization(out_dim, max_block_size)
    if block_size is None:
        raise ValueError(
            f"Cannot power-of-2 factorize {out_dim} with max block size {max_block_size}"
        )
    max_boft_m = (block_num - 1).bit_count() + 1
    if boft_m == -1:
        boft_m = max_boft_m
    boft_m = min(boft_m, max_boft_m)
    oft_blocks = jnp.zeros((boft_m, block_num, block_size, block_size), dtype=dtype)
    if rescale:
        return oft_blocks, jnp.ones((out_dim, *[1] * len(rest)), dtype=dtype)
    return oft_blocks, None


def diff_weight(org_weight: jax.Array, *weights, constraint=None) -> jax.Array:
    oft_blocks, rescale = weights
    m, num, b, _ = oft_blocks.shape
    r_b = b // 2
    I = jnp.eye(b, dtype=oft_blocks.dtype)
    r = get_r(oft_blocks, I, constraint)
    org = org_weight.astype(r.dtype)
    inp = org
    rest = org.shape[1:]

    for i in range(m):
        bi = r[i]  # (num, b, b)
        g = 2
        k = (2**i) * r_b
        # butterfly permutation on axis 0: (c g k) -> (c k g), then block view
        inp = (
            inp.reshape(-1, g, k, *rest)
            .swapaxes(1, 2)
            .reshape(-1, b, *rest)
        )
        inp = jnp.einsum("bij,bj...->bi...", bi, inp, precision=op_precision(bi, inp))
        inp = inp.reshape(-1, *rest).reshape(-1, k, g, *rest).swapaxes(1, 2).reshape(-1, *rest)

    if rescale is not None:
        inp = inp * rescale

    return inp - org


def bypass_forward_diff(org_out, *weights, constraint=None, need_transpose=False):
    """Butterfly-rotate the base outputs (feature axis last); return the delta."""
    oft_blocks, rescale = weights
    m, num, b, _ = oft_blocks.shape
    r_b = b // 2
    I = jnp.eye(b, dtype=oft_blocks.dtype)
    r = get_r(oft_blocks, I, constraint)
    inp = org = org_out.astype(r.dtype)
    if need_transpose:
        inp = org = jnp.swapaxes(inp, 1, -1)
    lead = inp.shape[:-1]

    for i in range(m):
        bi = r[i]
        g = 2
        k = (2**i) * r_b
        inp = (
            inp.reshape(*lead, -1, g, k)
            .swapaxes(-2, -1)
            .reshape(*lead, -1)
            .reshape(*lead, -1, b)
        )
        inp = jnp.einsum("bij,...bj->...bi", bi, inp, precision=op_precision(bi, inp))
        inp = inp.reshape(*lead, -1).reshape(*lead, -1, k, g).swapaxes(-2, -1).reshape(*lead, -1)

    if rescale is not None:
        inp = inp * jnp.swapaxes(rescale, 0, -1)

    inp = inp - org
    if need_transpose:
        inp = jnp.swapaxes(inp, 1, -1)
    return inp
