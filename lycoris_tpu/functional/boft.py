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

import math

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


def _scaled_r(oft_blocks: jax.Array, constraint, scale) -> jax.Array:
    """Cayley rotations for every level, multiplier-interpolated toward I
    (reference boft.py level loop's ``scale`` blend). ``constraint``/``scale``
    are STATIC (Python numbers or None — module hyperparameters)."""
    I = jnp.eye(oft_blocks.shape[-1], dtype=oft_blocks.dtype)
    r = get_r(oft_blocks, I, constraint)
    if scale != 1:
        r = r * scale + (1 - scale) * I
    return r


def _rotate_impl(inp: jax.Array, oft_blocks: jax.Array, constraint, scale,
                 last: bool) -> jax.Array:
    """Butterfly-rotate ``inp`` (features on axis 0, or the LAST axis when
    ``last`` — the bypass layout), picking the cheaper of two equivalent forms
    by static shape:

    - ``cols >= dim`` (activation-like): materialize ``Q = chain(I)`` once and
      apply it as ONE dense MXU matmul — avoids streaming the big tensor
      through HBM m times (measured; see :func:`dense_rotation`).
    - ``cols < dim`` (weight-like): run the m-stage chain directly on ``inp``.
      Building Q here would materialize a (dim, dim) intermediate per stage —
      at SD1.5's ff ``out_dim=10240`` that is 400 MB f32 × 11 stages and OOMs
      the 16 GB chip (measured r4); the direct chain touches only (dim, cols).

    The Cayley transform runs INSIDE this (checkpointed) function on purpose:
    with get_r outside, every Gauss-Jordan iterate and the final ``r`` become
    backward residuals in XLA's (…, b, b) tiled layout — (11, 1024, 10, 10)
    pads 20.5× to 88 MB per copy at the SD1.5 ff layers (measured OOM, r4).
    Inside the checkpoint the only saved residual is ``oft_blocks`` itself (a
    parameter already resident in HBM); the Cayley replays in backward for
    ~m·num·b³ FLOPs — noise next to the matmuls it feeds.
    """
    m, num, b, _ = oft_blocks.shape
    r = _scaled_r(oft_blocks, constraint, scale)
    dim = num * b
    if last:
        cols = math.prod(inp.shape[:-1]) if inp.ndim > 1 else 1
    else:
        cols = math.prod(inp.shape[1:]) if inp.ndim > 1 else 1
    if cols >= dim:
        q = dense_rotation(r)
        if last:
            return jnp.einsum("...j,ij->...i", inp, q, precision=op_precision(q, inp))
        return jnp.einsum("ij,j...->i...", q, inp, precision=op_precision(q, inp))
    if last:
        moved = jnp.moveaxis(inp, -1, 0)
        return jnp.moveaxis(_chain(moved, r), 0, -1)
    return _chain(inp, r)


# Rematerialized: the chain's per-stage intermediates (m × the input size, or
# m × (dim, dim) on the dense path) and the Cayley's padded (…, b, b) iterates
# are cheap to replay and expensive to save — without this the backward keeps
# every stage live (44 GB at SD1.5 b8 ff). constraint/scale/last are static.
_rotate_ckpt = jax.checkpoint(_rotate_impl, static_argnums=(2, 3, 4))


def rotate_front(inp: jax.Array, oft_blocks: jax.Array, constraint=None,
                 scale: float = 1.0) -> jax.Array:
    """Checkpointed butterfly rotation, features on axis 0 (weight layout)."""
    return _rotate_ckpt(inp, oft_blocks, constraint, scale, False)


def rotate_last(inp: jax.Array, oft_blocks: jax.Array, constraint=None,
                scale: float = 1.0) -> jax.Array:
    """Checkpointed butterfly rotation, features on the last axis (bypass)."""
    return _rotate_ckpt(inp, oft_blocks, constraint, scale, True)


def diff_weight(org_weight: jax.Array, *weights, constraint=None) -> jax.Array:
    oft_blocks, rescale = weights
    org = org_weight.astype(oft_blocks.dtype)
    inp = rotate_front(org, oft_blocks, constraint)

    if rescale is not None:
        inp = inp * rescale

    return inp - org


def bypass_forward_diff(org_out, *weights, constraint=None, need_transpose=False):
    """Butterfly-rotate the base outputs (feature axis last); return the delta.

    Applied as ``x @ Qᵀ`` with the dense rotation from :func:`dense_rotation`
    when tokens ≥ dim — one MXU matmul instead of m HBM-streaming stages —
    and as the direct chain otherwise (see :func:`_rotate_impl`)."""
    oft_blocks, rescale = weights
    inp = org = org_out.astype(oft_blocks.dtype)
    if need_transpose:
        inp = org = jnp.swapaxes(inp, 1, -1)

    inp = rotate_last(inp, oft_blocks, constraint)

    if rescale is not None:
        inp = inp * jnp.swapaxes(rescale, 0, -1)

    inp = inp - org
    if need_transpose:
        inp = jnp.swapaxes(inp, 1, -1)
    return inp
