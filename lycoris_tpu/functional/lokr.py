"""LoKr (Kronecker product) functional API — TPU-native.

Parity contract with reference lycoris/functional/lokr.py:
- ``make_kron`` (lokr.py:11-20): ΔW = scale * (w1 ⊗ w2).
- ``weight_gen`` (lokr.py:23-121): factorization of in/out dims, w1 full or
  LoRA pair (decompose_both), w2 full / LoRA pair / tucker, zero-init on the
  "big" factor so ΔW = 0 at init.
- ``diff_weight`` (lokr.py:124-151): rebuild w1, w2 then kron; the effective
  scale is gamma/rank.
- ``bypass_forward_diff`` (lokr.py:154-247): **never materializes the
  Kronecker product** — reshapes the input into ``uq`` groups, applies w2 as
  a grouped op, swaps group and feature axes, applies w1 as a linear across
  groups. This is the flagship fused path on TPU: every step is a reshape /
  transpose / batched matmul that XLA tiles directly onto the MXU.

JAX changes: explicit PRNG key in weight_gen; jnp.kron for rebuild.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .general import (
    factorization,
    kaiming_uniform,
    linear,
    op_by_ndim,
    op_precision,
    rebuild_tucker,
)


def _mm(a, b):
    return jnp.matmul(a, b, precision=op_precision(a, b))


def make_kron(w1: jax.Array, w2: jax.Array, scale=1.0, out_dtype=None) -> jax.Array:
    """scale * (w1 ⊗ w2), with w1 broadcast over w2's trailing (spatial) dims.

    ``scale`` is folded into the SMALL factor (w1) before the outer product —
    a (p, q)-sized multiply instead of a full ΔW-sized pass after it.

    ``out_dtype`` casts the block outer product BEFORE the final (p·u, q·v)
    reshape. That reshape's minor dim q·v is rarely lane-aligned, so whatever
    dtype crosses it gets materialized + relaid-out in HBM; in bf16 training
    the f32 reconstruction otherwise parks a full-precision ΔW copy there
    (52 MB for SDXL's [10240,1280] ff weight) that every consumer matmul then
    re-reads and down-casts. Casting here is numerically identical to the
    consumer-side ``astype`` it replaces — the multiply math stays f32.
    """
    for _ in range(w2.ndim - w1.ndim):
        w1 = w1[..., None]
    if isinstance(scale, (int, float)) and scale == 1.0:
        pass
    else:
        w1 = w1 * scale
    p, q = w1.shape[:2]
    u, v = w2.shape[:2]
    spatial = w2.shape[2:]
    prod = w1.reshape(p, 1, q, 1, *w1.shape[2:]) * w2.reshape(1, u, 1, v, *spatial)
    if out_dtype is not None:
        prod = prod.astype(out_dtype)
    return prod.reshape(p * u, q * v, *spatial)


def weight_gen(
    key: jax.Array,
    org_weight_shape,
    rank: int,
    tucker: bool = True,
    factor: int = -1,
    decompose_both: bool = False,
    full_matrix: bool = False,
    unbalanced_factorization: bool = False,
    dtype=jnp.float32,
):
    """Generate (w1, w1a, w1b, w2, w2a, w2b, t2); None for unused slots.

    Branch structure and init parity: reference lokr.py:41-121.
    """
    if hasattr(org_weight_shape, "shape"):
        org_weight_shape = org_weight_shape.shape
    out_dim, in_dim, *k = org_weight_shape
    w1 = w1a = w1b = None
    w2 = w2a = w2b = None
    t2 = None
    use_w1 = use_w2 = False

    in_m, in_n = factorization(in_dim, factor)
    out_l, out_k = factorization(out_dim, factor)
    if unbalanced_factorization:
        out_l, out_k = out_k, out_l

    keys = jax.random.split(key, 5)

    if k:
        shape = ((out_l, out_k), (in_m, in_n), *k)
        tucker = tucker and any(i != 1 for i in k)
        if decompose_both and rank < max(shape[0][0], shape[1][0]) / 2 and not full_matrix:
            w1a_shape = (shape[0][0], rank)
            w1b_shape = (rank, shape[1][0])
        else:
            use_w1 = True
            w1_shape = (shape[0][0], shape[1][0])

        if rank >= max(shape[0][1], shape[1][1]) / 2 or full_matrix:
            use_w2 = True
            w2_shape = (shape[0][1], shape[1][1], *k)
        elif tucker:
            t2_shape = (rank, rank, *k)
            w2a_shape = (rank, shape[0][1])
            w2b_shape = (rank, shape[1][1])
        else:
            w2a_shape = (shape[0][1], rank)
            w2b_shape = (rank, shape[1][1], *k)
    else:
        shape = ((out_l, out_k), (in_m, in_n))
        if decompose_both and rank < max(shape[0][0], shape[1][0]) / 2:
            w1a_shape = (shape[0][0], rank)
            w1b_shape = (rank, shape[1][0])
        else:
            use_w1 = True
            w1_shape = (shape[0][0], shape[1][0])
        if rank < max(shape[0][1], shape[1][1]) / 2:
            w2a_shape = (shape[0][1], rank)
            w2b_shape = (rank, shape[1][1])
        else:
            use_w2 = True
            w2_shape = (shape[0][1], shape[1][1])

    if use_w2:
        w2 = jnp.zeros(w2_shape, dtype=dtype)
    else:
        if k and tucker and not use_w2:
            t2 = kaiming_uniform(keys[2], t2_shape, dtype=dtype)
        w2a = kaiming_uniform(keys[3], w2a_shape, dtype=dtype)
        w2b = jnp.zeros(w2b_shape, dtype=dtype)

    if use_w1:
        w1 = kaiming_uniform(keys[0], w1_shape, dtype=dtype)
    else:
        w1a = kaiming_uniform(keys[0], w1a_shape, dtype=dtype)
        w1b = kaiming_uniform(keys[1], w1b_shape, dtype=dtype)

    return w1, w1a, w1b, w2, w2a, w2b, t2


def diff_weight(*weights, gamma=1.0) -> jax.Array:
    """Rebuild w1 and w2 (LoRA pair or tucker) then Kronecker; scale=gamma/rank.

    Reference lokr.py:124-151 (incl. the rank-from-whichever-pair-exists rule).
    """
    w1, w1a, w1b, w2, w2a, w2b, t = weights
    if w1a is not None:
        rank = w1a.shape[1]
    elif w2a is not None:
        rank = w2a.shape[1]
    else:
        rank = gamma
    scale = gamma / rank
    if w1 is None:
        w1 = _mm(w1a, w1b)
    if w2 is None:
        if t is None:
            r, o, *k = w2b.shape
            w2 = _mm(w2a, w2b.reshape(r, -1))
            w2 = w2.reshape(-1, o, *k)
        else:
            w2 = rebuild_tucker(t, w2a, w2b)
    return make_kron(w1, w2, scale)


def bypass_forward_diff(h, org_out, *weights, gamma=1.0, extra_args={}):
    """Grouped-matmul Kronecker bypass (no ΔW materialization).

    Identity used (reference lokr.py:154-247): for W = w1 ⊗ w2 with
    w1: (up, uq), w2: (vp, vq ...), x of feature dim uq*vq grouped as
    (..., uq, vq):  y = w1 · (x · w2ᵀ)ᵀ-over-groups. Convs keep the group
    axis folded into batch so w2 applies as a normal (strided) conv.
    """
    w1, w1a, w1b, w2, w2a, w2b, t = weights
    use_w1 = w1 is not None
    use_w2 = w2 is not None
    rank = w1b.shape[0] if not use_w1 else w2b.shape[0] if not use_w2 else gamma
    return bypass_diff_with_scale(h, *weights, scale=gamma / rank, extra_args=extra_args)


def bypass_diff_with_scale(h, *weights, scale=1.0, extra_args={}):
    """Core of the kron bypass with an explicit output scale (module layer
    passes α/r·scalar·multiplier directly; see modules/lokr.py)."""
    # activation-path application runs in the activation dtype (like every
    # other module's bypass_forward_diff); lax.conv rejects mixed operand
    # dtypes (bf16 h × f32 factors) outright — r4 bypass-bench crash
    weights = tuple(None if w is None else w.astype(h.dtype) for w in weights)
    w1, w1a, w1b, w2, w2a, w2b, t = weights
    use_w1 = w1 is not None
    use_w2 = w2 is not None
    tucker = t is not None
    dim = t.ndim if tucker else w2.ndim if w2 is not None else w2b.ndim
    is_conv = dim > 2
    op = op_by_ndim(dim)
    kw_dict = extra_args if is_conv else {}

    if use_w2:
        ba = w2
    else:
        a = w2b
        b = w2a
        if tucker:
            # tucker layout (rebuild_tucker): w2a is (rank, vp), w2b (rank, vq);
            # as 1×1 conv kernels the last hop needs (vp, rank)
            a = a.reshape(*a.shape, *[1] * (dim - 2))
            b = b.T.reshape(*b.T.shape, *[1] * (dim - 2))
        elif is_conv:
            b = b.reshape(*b.shape, *[1] * (dim - 2))

    c = w1 if use_w1 else _mm(w1a, w1b)
    uq = c.shape[1]

    if is_conv:
        B = h.shape[0]
        rest = h.shape[2:]
        h_in_group = h.reshape(B * uq, -1, *rest)
    else:
        h_in_group = h.reshape(*h.shape[:-1], uq, -1)

    if use_w2:
        hb = op(h_in_group, ba, **kw_dict)
    elif is_conv:
        if tucker:
            ha = op(h_in_group, a)
            ht = op(ha, t, **kw_dict)
            hb = op(ht, b)
        else:
            ha = op(h_in_group, a, **kw_dict)
            hb = op(ha, b)
    else:
        ha = op(h_in_group, a, **kw_dict)
        hb = op(ha, b)

    if is_conv:
        # (B*uq, vp, *f) -> (B, uq, vp, *f) -> (B, f_last, vp, ..., uq)
        hb = hb.reshape(B, -1, *hb.shape[1:])
        h_cross_group = jnp.swapaxes(hb, 1, -1)
    else:
        h_cross_group = jnp.swapaxes(hb, -1, -2)

    hc = linear(h_cross_group, c)
    if is_conv:
        hc = jnp.swapaxes(hc, 1, -1)
        out = hc.reshape(B, -1, *hc.shape[3:])
    else:
        hc = jnp.swapaxes(hc, -1, -2)
        out = hc.reshape(*hc.shape[:-2], -1)

    # scale may be a f32 scalar array (α/r·scalar·multiplier) — keep the
    # result in the activation dtype
    return (out * scale).astype(h.dtype)
