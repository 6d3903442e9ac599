"""LoHa (Hadamard product of two low-rank factors) functional API — TPU-native.

Parity contract with reference lycoris/functional/loha.py:
- ``HadaWeight`` custom autograd (loha.py:10-30): fwd
  ΔW = (w1u@w1d) ⊙ (w2u@w2d) * scale, with a hand-written backward that
  *recomputes* the partner product instead of caching both full-size
  products (saves 2x weight-size residuals). Here that is
  :func:`hada_weight` with ``jax.custom_vjp`` — the residuals saved are
  only the small factors, and the backward recomputes (w2u@w2d)/(w1u@w1d)
  on the fly, exactly the reference's memory/compute trade.
- ``HadaWeightTucker`` (loha.py:33-75) → :func:`hada_weight_tucker`.
- ``weight_gen`` (loha.py:86-116): w1d/w2d ~ N(0,1), w1u = 0, w2u ~ N(0,0.1),
  tucker cores ~ N(0,0.1).
- ``diff_weight`` (loha.py:119-147), ``bypass_forward_diff`` (loha.py:150-165).

On TPU the matmuls in fwd/bwd run on the MXU via XLA; the element-wise
Hadamard fuses into the matmul epilogue (verified via fused HLO). A Pallas
fused kernel is provided in lycoris_tpu.ops.hada for the large-layer case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .general import normal_init, op_by_ndim, op_precision


def _mm(a, b):
    return jnp.matmul(a, b, precision=op_precision(a, b))


def _es(eq, *ops):
    return jnp.einsum(eq, *ops, precision=op_precision(*ops))


@jax.custom_vjp
def hada_weight(w1d, w1u, w2d, w2u, scale=1.0):
    return _mm(w1u, w1d) * _mm(w2u, w2d) * scale


def _hada_weight_fwd(w1d, w1u, w2d, w2u, scale):
    # Save only the factors (small); recompute products in bwd.
    return hada_weight(w1d, w1u, w2d, w2u, scale), (w1d, w1u, w2d, w2u, scale)


def _hada_weight_bwd(res, grad_out):
    w1d, w1u, w2d, w2u, scale = res
    grad_out = grad_out * scale
    temp = grad_out * _mm(w2u, w2d)
    grad_w1u = _mm(temp, w1d.T)
    grad_w1d = _mm(w1u.T, temp)
    temp = grad_out * _mm(w1u, w1d)
    grad_w2u = _mm(temp, w2d.T)
    grad_w2d = _mm(w2u.T, temp)
    return grad_w1d, grad_w1u, grad_w2d, grad_w2u, None


hada_weight.defvjp(_hada_weight_fwd, _hada_weight_bwd)


@jax.custom_vjp
def hada_weight_tucker(t1, w1d, w1u, t2, w2d, w2u, scale=1.0):
    rebuild1 = _es("ij...,jr,ip->pr...", t1, w1d, w1u)
    rebuild2 = _es("ij...,jr,ip->pr...", t2, w2d, w2u)
    return rebuild1 * rebuild2 * scale


def _hada_weight_tucker_fwd(t1, w1d, w1u, t2, w2d, w2u, scale):
    out = hada_weight_tucker(t1, w1d, w1u, t2, w2d, w2u, scale)
    return out, (t1, w1d, w1u, t2, w2d, w2u, scale)


def _hada_weight_tucker_bwd(res, grad_out):
    # Mirrors reference loha.py:43-75: recompute each side's rebuild, form
    # grads for the partner side's factors/core via einsum contractions.
    t1, w1d, w1u, t2, w2d, w2u, scale = res
    grad_out = grad_out * scale

    temp = _es("ij...,jr->ir...", t2, w2d)
    rebuild = _es("ij...,ir->rj...", temp, w2u)
    grad_w = rebuild * grad_out
    grad_w1u = _es("rj...,ij...->ri", temp, grad_w)
    grad_temp = _es("ij...,ir->rj...", grad_w, w1u.T)
    grad_w1d = _es("ir...,ij...->rj", t1, grad_temp)
    grad_t1 = _es("ij...,jr->ir...", grad_temp, w1d.T)

    temp = _es("ij...,jr->ir...", t1, w1d)
    rebuild = _es("ij...,ir->rj...", temp, w1u)
    grad_w = rebuild * grad_out
    grad_w2u = _es("rj...,ij...->ri", temp, grad_w)
    grad_temp = _es("ij...,ir->rj...", grad_w, w2u.T)
    grad_w2d = _es("ir...,ij...->rj", t2, grad_temp)
    grad_t2 = _es("ij...,jr->ir...", grad_temp, w2d.T)

    return grad_t1, grad_w1d, grad_w1u, grad_t2, grad_w2d, grad_w2u, None


hada_weight_tucker.defvjp(_hada_weight_tucker_fwd, _hada_weight_tucker_bwd)


def make_weight(w1d, w1u, w2d, w2u, scale):
    """Dispatch to the fused Pallas kernel on TPU (lycoris_tpu.ops.hada);
    falls back to the jnp custom-vjp path elsewhere or when
    LYCORIS_TPU_NO_PALLAS=1."""
    import os

    if os.environ.get("LYCORIS_TPU_NO_PALLAS", "0") != "1":
        from ..ops.hada import hada_weight as dispatch

        return dispatch(w1d, w1u, w2d, w2u, scale)
    return hada_weight(w1d, w1u, w2d, w2u, scale)


def make_weight_tucker(t1, w1d, w1u, t2, w2d, w2u, scale):
    return hada_weight_tucker(t1, w1d, w1u, t2, w2d, w2u, scale)


def weight_gen(key: jax.Array, org_weight_shape, rank: int, tucker: bool = True, dtype=jnp.float32):
    """Generate (w1d, w1u, w2d, w2u, t1, t2). Init parity: loha.py:96-116."""
    if hasattr(org_weight_shape, "shape"):
        org_weight_shape = org_weight_shape.shape
    out_dim, in_dim, *k = org_weight_shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if k and tucker:
        w1d = normal_init(k1, (rank, in_dim), std=1, dtype=dtype)
        w1u = jnp.zeros((rank, out_dim), dtype=dtype)
        t1 = normal_init(k3, (rank, rank, *k), std=0.1, dtype=dtype)
        w2d = normal_init(k2, (rank, in_dim), std=1, dtype=dtype)
        w2u = normal_init(k4, (rank, out_dim), std=0.1, dtype=dtype)
        t2 = normal_init(jax.random.fold_in(k3, 1), (rank, rank, *k), std=0.1, dtype=dtype)
        return w1d, w1u, w2d, w2u, t1, t2
    w1d = normal_init(k1, (rank, in_dim), std=1, dtype=dtype)
    w1u = jnp.zeros((out_dim, rank), dtype=dtype)
    w2d = normal_init(k2, (rank, in_dim), std=1, dtype=dtype)
    w2u = normal_init(k4, (out_dim, rank), std=0.1, dtype=dtype)
    return w1d, w1u, w2d, w2u, None, None


def diff_weight(*weights, gamma=1.0) -> jax.Array:
    """ΔW for LoHa; output (O, I, *k). Reference loha.py:119-147."""
    w1d, w1u, w2d, w2u, t1, t2 = weights
    if t1 is not None and t2 is not None:
        R, I = w1d.shape
        R2, O = w1u.shape
        k = t1.shape[2:]
        result = make_weight_tucker(t1, w1d, w1u, t2, w2d, w2u, gamma)
    else:
        R, I, *k = w1d.shape
        O = w1u.shape[0]
        result = make_weight(
            w1d.reshape(w1d.shape[0], -1),
            w1u.reshape(-1, w1u.shape[1]),
            w2d.reshape(w2d.shape[0], -1),
            w2u.reshape(-1, w2u.shape[1]),
            gamma,
        )
    return result.reshape(O, I, *k)


def bypass_forward_diff(x, org_out, *weights, gamma=1.0, extra_args={}):
    """LoHa has no factored bypass: rebuild ΔW then apply once (loha.py:150-165)."""
    w1d, w1u, w2d, w2u, t1, t2 = weights
    diff_w = diff_weight(w1d, w1u, w2d, w2u, t1, t2, gamma=gamma)
    return op_by_ndim(diff_w.ndim)(x, diff_w, **extra_args)
