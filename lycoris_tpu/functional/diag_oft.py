"""Diag-OFT (block-diagonal orthogonal fine-tuning) functional API — TPU-native.

Parity contract with reference lycoris/functional/diag_oft.py:
- ``get_r`` (diag_oft.py:10-25): Cayley transform R = (I+Q)(I-Q)^-1 of the
  skew-symmetric Q = B - B^T, with optional COFT norm constraint. The
  reference's data-dependent ``if q_norm > constraint`` rescale becomes a
  traced ``minimum`` (identical math, jit-safe).
- ``weight_gen`` (diag_oft.py:28-45): zero blocks via
  factorization(out_dim, max_block_size), optional all-ones rescale vector.
- ``diff_weight`` (diag_oft.py:48-76): rotate org_weight's output blocks by
  (R - I); batched einsum over [num, b, b] blocks.
- ``bypass_forward_diff`` (diag_oft.py:79-112): rotate *outputs* instead.
  NOTE the reference has a signature asymmetry vs boft (its version takes an
  unused ``x`` first): we normalize to the boft convention
  ``bypass_forward_diff(org_out, *weights, ...)`` (SURVEY §2.1 decision).

The batched [num,b,b] inverse lowers to XLA's batched LU on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .general import factorization, op_precision


def _gj_inv(a: jax.Array) -> jax.Array:
    """Batched (…, b, b) inverse via pivot-free Gauss-Jordan, unrolled over
    the static b.

    Safe here by construction: ``a = I - q`` with q exactly skew-symmetric,
    so a's symmetric part is I (positive definite) and every leading
    principal minor is positive — no pivoting needed. 4.1× faster than the
    batched pivoted LU behind jnp.linalg.inv on v5e at the OFT block shapes
    ((m, num, 10, 10): 0.147 vs 0.604 ms per Cayley, max|err| 1.8e-7)."""
    b = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(b, dtype=a.dtype), a.shape)
    m = jnp.concatenate([a, eye], axis=-1)  # (…, b, 2b)
    for i in range(b):
        pivot = m[..., i, :] / m[..., i, i : i + 1]
        m = m - m[..., :, i : i + 1] * pivot[..., None, :]
        # the rank-1 update zeroed row i as well; restore the pivot row
        m = m.at[..., i, :].set(pivot)
    return m[..., b:]


def get_r(oft_blocks: jax.Array, I: jax.Array | None = None, constraint=0) -> jax.Array:
    if I is None:
        I = jnp.eye(oft_blocks.shape[-1], dtype=oft_blocks.dtype)
    while I.ndim < oft_blocks.ndim:
        I = I[None]
    q = oft_blocks - jnp.swapaxes(oft_blocks, -1, -2)
    if constraint is not None and (not isinstance(constraint, (int, float)) or constraint > 0):
        q_norm = jnp.linalg.norm(q) + 1e-8
        # rescale only when the norm exceeds the constraint (COFT)
        normed_q = q * jnp.minimum(1.0, constraint / q_norm)
    else:
        normed_q = q
    inv = _gj_inv((I - normed_q).astype(jnp.float32)).astype(normed_q.dtype)
    r = jnp.matmul(I + normed_q, inv, precision=op_precision(normed_q))
    return r


def weight_gen(org_weight_shape, max_block_size: int = -1, rescale: bool = False, dtype=jnp.float32):
    """Zero-init oft blocks (identity rotation) and optional rescale vector."""
    if hasattr(org_weight_shape, "shape"):
        org_weight_shape = org_weight_shape.shape
    out_dim, *rest = org_weight_shape
    block_size, block_num = factorization(out_dim, max_block_size)
    oft_blocks = jnp.zeros((block_num, block_size, block_size), dtype=dtype)
    if rescale:
        return oft_blocks, jnp.ones((out_dim, *[1] * len(rest)), dtype=dtype)
    return oft_blocks, None


def diff_weight(org_weight: jax.Array, *weights, constraint=None) -> jax.Array:
    oft_blocks, rescale = weights
    I = jnp.eye(oft_blocks.shape[1], dtype=oft_blocks.dtype)
    r = get_r(oft_blocks, I, constraint)

    block_num, block_size, _ = oft_blocks.shape
    shape = org_weight.shape[1:]
    org = org_weight.astype(r.dtype).reshape(block_num, block_size, *shape)
    # R = I at init (blocks are zero), so ΔW = 0 at step 0.
    weight = jnp.einsum(
        "knm,kn...->km...", r - I, org, precision=op_precision(r, org)
    ).reshape(-1, *shape)
    if rescale is not None:
        weight = rescale * weight
        weight = weight + (rescale - 1) * org_weight
    return weight


def bypass_forward_diff(org_out, *weights, constraint=None, need_transpose=False):
    """Rotate the base layer's *outputs* by (R - I); returns the delta only.

    ``need_transpose=True`` for channels-first conv outputs (feature axis 1).
    """
    oft_blocks, rescale = weights
    block_num, block_size, _ = oft_blocks.shape
    I = jnp.eye(block_size, dtype=oft_blocks.dtype)
    r = get_r(oft_blocks, I, constraint)
    if need_transpose:
        org_out = jnp.swapaxes(org_out, 1, -1)
    org_out = org_out.astype(r.dtype)
    lead = org_out.shape[:-1]
    oft_out = jnp.einsum(
        "knm,...kn->...km",
        r - I,
        org_out.reshape(*lead, block_num, block_size),
        precision=op_precision(r, org_out),
    )
    out = oft_out.reshape(*lead, -1)
    if rescale is not None:
        rs = jnp.swapaxes(rescale, -1, 0)
        out = rs * out
        out = out + (rs - 1) * org_out
    if need_transpose:
        out = jnp.swapaxes(out, 1, -1)
    return out
