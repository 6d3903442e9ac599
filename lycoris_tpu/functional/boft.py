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


def _chain(inp: jax.Array, r: jax.Array) -> jax.Array:
    """Apply the m butterfly stages to ``inp`` along axis 0 (reference
    boft.py:37-71 permute/rotate/unpermute loop; static m)."""
    m, num, b, _ = r.shape
    r_b = b // 2
    rest = inp.shape[1:]
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
    return inp


def dense_rotation(r: jax.Array) -> jax.Array:
    """Materialize the full butterfly product as ONE dense (dim, dim) matrix:
    ``Q = chain(I)``, so ``chain(X) == Q @ X`` for features on axis 0.

    TPU rationale (measured, docs/Guidelines.md): running the m-stage chain
    directly over activations streams the full (M, dim) tensor through HBM m
    times with 10×10-block VPU rotations (~8× off the HBM roofline, 1.4 ms at
    M=8192 dim=640). Building Q costs one chain over a (dim, dim) identity
    (M=dim ≪ tokens) after which the rotation is a single dense MXU matmul
    (~0.1 ms at the same shape)."""
    m, num, b, _ = r.shape
    dim = num * b
    return _chain(jnp.eye(dim, dtype=r.dtype), r)


def diff_weight(org_weight: jax.Array, *weights, constraint=None) -> jax.Array:
    oft_blocks, rescale = weights
    I = jnp.eye(oft_blocks.shape[-1], dtype=oft_blocks.dtype)
    r = get_r(oft_blocks, I, constraint)
    org = org_weight.astype(r.dtype)
    q = dense_rotation(r)
    inp = jnp.einsum(
        "ij,j...->i...", q, org, precision=op_precision(q, org)
    )

    if rescale is not None:
        inp = inp * rescale

    return inp - org


def bypass_forward_diff(org_out, *weights, constraint=None, need_transpose=False):
    """Butterfly-rotate the base outputs (feature axis last); return the delta.

    Applied as ``x @ Qᵀ`` with the dense rotation from :func:`dense_rotation`
    — one MXU matmul instead of m HBM-streaming stages (see dense_rotation)."""
    oft_blocks, rescale = weights
    I = jnp.eye(oft_blocks.shape[-1], dtype=oft_blocks.dtype)
    r = get_r(oft_blocks, I, constraint)
    inp = org = org_out.astype(r.dtype)
    if need_transpose:
        inp = org = jnp.swapaxes(inp, 1, -1)

    q = dense_rotation(r)
    inp = jnp.einsum("...j,ij->...i", inp, q, precision=op_precision(q, inp))

    if rescale is not None:
        inp = inp * jnp.swapaxes(rescale, 0, -1)

    inp = inp - org
    if need_transpose:
        inp = jnp.swapaxes(inp, 1, -1)
    return inp
