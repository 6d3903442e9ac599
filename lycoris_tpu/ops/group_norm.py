"""Fused GroupNorm Pallas kernels (channels-first, custom_vjp).

MEASURED AND REJECTED as the in-train default (v5e warm pairs): SD1.5
5.79 → 5.01 steps/s (−13%), SDXL b4 1.1612 → 1.1386 (−2%) with these
kernels dispatched. Unlike LayerNorm (ops/layer_norm.py, which wins), the
UNet's GroupNorms sit in elementwise chains (silu, residual adds, conv
epilogues) that XLA fuses INTO its GN loops; three custom-call boundaries
forfeit that fusion and re-materialize x around each call. Kept as a tested
reference point (tests/test_ops.py); no dispatch, no env flag — the
reshape-free jnp form in functional/general.py is the production path.

Original motivation: XLA's GN fusions profile tens of times off the HBM
roofline (3.4 ms for a (4,640,64,64) stats pass whose traffic rooflines at
~0.1 ms) — but that slack is apparently paid back by what the fusions
absorb. The channels-first activation
(N, C, *spatial) flattens to rows = N·C, lanes = prod(spatial) — both
reductions and the apply are then row-local, which maps perfectly onto TPU
tiles with NO relayout (row scalars live as (rows, 1) sublane vectors):

  fwd:  sums2 kernel  (per-row Σx, Σx²) → tiny (N, G) combine in jnp →
        fma1 kernel   y = scale_c·x + shift_c      (γ/β folded per channel)
  bwd:  sums2 kernel  (per-row Σdy, Σdy·x) → tiny per-group coefficients →
        fma2 kernel   dx = A_c·dy + B_c·x + C_c
        dγ/dβ fall out of the same row sums (no extra pass over x).

Total traffic ≈ 2 reads + 1 write per direction — the bandwidth optimum
for a two-pass (exact-stats) normalization.

Reference semantics: torch F.group_norm (reference wraps norm layers in
lycoris/modules/norms.py; our functional/general.py group_norm is the jnp
fallback with identical math).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sums2_kernel(u_ref, v_ref, s1_ref, s2_ref):
    u = u_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    s1_ref[:] = jnp.sum(u, axis=-1, keepdims=True)
    s2_ref[:] = jnp.sum(u * v, axis=-1, keepdims=True)


def _fma1_kernel(x_ref, a_ref, c_ref, y_ref):
    y_ref[:] = (
        x_ref[:].astype(jnp.float32) * a_ref[:] + c_ref[:]
    ).astype(y_ref.dtype)


def _fma2_kernel(p_ref, q_ref, a_ref, b_ref, c_ref, y_ref):
    y_ref[:] = (
        p_ref[:].astype(jnp.float32) * a_ref[:]
        + q_ref[:].astype(jnp.float32) * b_ref[:]
        + c_ref[:]
    ).astype(y_ref.dtype)


def _block_rows(rows: int, s: int) -> int | None:
    # keep each (bc, S) block ≤ ~512 KB bf16: Mosaic double-buffers every
    # in/out block and the kernels hold fp32 casts, so the fma2 kernel's
    # scoped VMEM is ~12x the block size (2 MB blocks OOMed the 16 MB
    # budget on the (5120, 4096) SD1.5 GN)
    cap = max(8, (512 << 10) // max(1, 2 * s))
    for bc in (256, 128, 64, 32, 16, 8):
        if bc <= cap and rows % bc == 0:
            return bc
    return None


def _row_spec(bc):
    return pl.BlockSpec((bc, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _mat_spec(bc, s):
    return pl.BlockSpec((bc, s), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _sums2(u, v):
    rows, s = u.shape
    bc = _block_rows(rows, s)
    return pl.pallas_call(
        _sums2_kernel,
        grid=(rows // bc,),
        in_specs=[_mat_spec(bc, s), _mat_spec(bc, s)],
        out_specs=[_row_spec(bc), _row_spec(bc)],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
    )(u, v)


def _fma1(x, a, c, out_dtype):
    rows, s = x.shape
    bc = _block_rows(rows, s)
    return pl.pallas_call(
        _fma1_kernel,
        grid=(rows // bc,),
        in_specs=[_mat_spec(bc, s), _row_spec(bc), _row_spec(bc)],
        out_specs=_mat_spec(bc, s),
        out_shape=jax.ShapeDtypeStruct((rows, s), out_dtype),
    )(x, a, c)


def _fma2(p, q, a, b, c, out_dtype):
    rows, s = p.shape
    bc = _block_rows(rows, s)
    return pl.pallas_call(
        _fma2_kernel,
        grid=(rows // bc,),
        in_specs=[
            _mat_spec(bc, s), _mat_spec(bc, s),
            _row_spec(bc), _row_spec(bc), _row_spec(bc),
        ],
        out_specs=_mat_spec(bc, s),
        out_shape=jax.ShapeDtypeStruct((rows, s), out_dtype),
    )(p, q, a, b, c)


def _stats(x2, n, g, cg, s, eps):
    """Per-group fp32 (mean, rstd) from the per-channel sums kernel."""
    s1, s2 = _sums2(x2, x2)  # (N*C, 1) each
    cnt = cg * s
    gs1 = jnp.sum(s1.reshape(n, g, cg), axis=2)
    gs2 = jnp.sum(s2.reshape(n, g, cg), axis=2)
    mean = gs1 / cnt
    var = gs2 / cnt - mean * mean
    return mean, jax.lax.rsqrt(var + eps), s1, s2


def _group_norm_fwd(x, weight, bias, num_groups, eps):
    n, c, *spatial = x.shape
    s = math.prod(spatial) if spatial else 1
    cg = c // num_groups
    x2 = x.reshape(n * c, s)
    mean, rstd, _, _ = _stats(x2, n, num_groups, cg, s, eps)
    rep = lambda a: jnp.repeat(a, cg, axis=1).reshape(n * c, 1)
    scale = rep(rstd)
    shift = rep(-mean * rstd)
    if weight is not None:
        w = weight.astype(jnp.float32).reshape(1, c)
        wt = jnp.tile(w, (n, 1)).reshape(n * c, 1)
        scale = scale * wt
        shift = shift * wt
    if bias is not None:
        shift = shift + jnp.tile(bias.astype(jnp.float32).reshape(1, c), (n, 1)).reshape(n * c, 1)
    y = _fma1(x2, scale, shift, x.dtype)
    return y.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn(x, weight, bias, num_groups, eps):
    return _group_norm_fwd(x, weight, bias, num_groups, eps)


def _gn_fwd(x, weight, bias, num_groups, eps):
    return _group_norm_fwd(x, weight, bias, num_groups, eps), (x, weight)


def _gn_bwd(num_groups, eps, res, dy):
    x, weight = res
    n, c, *spatial = x.shape
    s = math.prod(spatial) if spatial else 1
    g, cg = num_groups, c // num_groups
    cnt = cg * s
    x2 = x.reshape(n * c, s)
    dy2 = dy.reshape(n * c, s)
    mean, rstd, _, _ = _stats(x2, n, g, cg, s, eps)  # (N, G)
    t1, t2 = _sums2(dy2, x2)  # per-channel Σdy, Σdy·x — one fused pass
    t1c = t1.reshape(n, c)
    t2c = t2.reshape(n, c)
    w = (jnp.ones((c,), jnp.float32) if weight is None
         else weight.astype(jnp.float32))
    # per-group means of dŷ·w and (dŷ·w)·x̂  (x̂ = (x-m)·r)
    wt1 = (t1c * w[None]).reshape(n, g, cg).sum(axis=2)
    wt2 = (t2c * w[None]).reshape(n, g, cg).sum(axis=2)
    m_dxhat = wt1 / cnt                                   # (N, G)
    m_dxhat_xhat = (wt2 - mean * wt1) * rstd / cnt        # (N, G)
    # dx = r·(w_c·dy − m_dxhat − x̂·m_dxhat_xhat)
    #    = A_c·dy + B_c·x + C_c
    repg = lambda a: jnp.repeat(a, cg, axis=1)            # (N, G) -> (N, C)
    r_c = repg(rstd)
    A = (r_c * w[None])
    B = -repg(rstd * rstd * m_dxhat_xhat)
    C = -r_c * repg(m_dxhat) + repg(mean) * (-B)
    dx = _fma2(dy2, x2, A.reshape(n * c, 1), B.reshape(n * c, 1),
               C.reshape(n * c, 1), x.dtype)
    # dγ_c = Σ_n (t2 − m_g·t1)·r_g ; dβ_c = Σ_n t1
    dgamma = (((t2c - repg(mean) * t1c) * repg(rstd)).sum(axis=0)
              if weight is not None else None)
    dbeta = t1c.sum(axis=0)
    dw = None if weight is None else dgamma.astype(weight.dtype)
    return (dx.reshape(x.shape), dw, dbeta)


_gn.defvjp(_gn_fwd, _gn_bwd)


# ---------------------------------------------------------------------------
# 'dots' formulation: per-channel sums as MXU dot_generals, elementwise in jnp
# ---------------------------------------------------------------------------
#
# XLA lowers the jnp form's per-channel spatial reductions to VPU reduce
# loops that profile at 21-63 GB/s on the SDXL conv layouts (HWNC-tiled,
# T(4,128)) — ~60-70 ms/step across fwd + remat replay + bwd.  Reformulating
# Σ_s x and Σ_s u·v as dot_generals against a ones matrix moves the reduction
# onto the MXU, which consumes the activation at matmul input bandwidth.  The
# elementwise normalize/FMA stays in plain jnp so XLA keeps fusing the
# surrounding silu/conv epilogues (the reason the all-Pallas GN above lost).
# Statistics are cached as tiny (N, C) f32 residuals, so the backward only
# pays the two t-sums and the dx FMA.

_DOT_K = 128


def _sums2_dot(u3, v3):
    """(Σ_s u, Σ_s u·v) per (n, c) via dots with a ones matrix.

    The K=128 redundant output columns cost only MXU flops (free at
    arithmetic intensity ~1); column 0 is the sum.  bf16 inputs accumulate
    exactly in f32 on the MXU; f32 inputs use HIGHEST precision (the TPU
    default would silently round to one bf16 pass)."""
    n, c, s = u3.shape
    prec = (
        None
        if u3.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    # Activation as the dot's RHS: the UNet's conv activations live in HWNC
    # layouts (spatial-major, channels-minor), which is exactly the rhs tile
    # order the MXU wants (K=s in sublanes, n·c in lanes) — no relayout.
    j = jnp.ones((_DOT_K, s), u3.dtype)
    dn = (((1,), (2,)), ((), ()))
    s1 = jax.lax.dot_general(
        j, u3, dn, precision=prec, preferred_element_type=jnp.float32
    )
    s2 = jax.lax.dot_general(
        j, u3 * v3, dn, precision=prec, preferred_element_type=jnp.float32
    )
    # The barrier keeps the algebraic simplifier from pushing the row-0
    # slice through the dot (which would strip the ones matrix to one row
    # and lower the whole thing back to the slow VPU reduce).
    s1, s2 = jax.lax.optimization_barrier((s1, s2))
    return s1[0], s2[0]


def _combine_groups(s1, s2, n, g, cg, cnt, eps):
    gs1 = jnp.sum(s1.reshape(n, g, cg), axis=2)
    gs2 = jnp.sum(s2.reshape(n, g, cg), axis=2)
    mean = gs1 / cnt
    var = gs2 / cnt - mean * mean
    return mean, jax.lax.rsqrt(var + eps)


def _gn_dots_impl(x, weight, bias, num_groups, eps):
    n, c, *spatial = x.shape
    s = math.prod(spatial) if spatial else 1
    g, cg = num_groups, c // num_groups
    x3 = x.reshape(n, c, s)
    s1, s2 = _sums2_dot(x3, x3)
    mean, rstd = _combine_groups(s1, s2, n, g, cg, cg * s, eps)
    rep = lambda a: jnp.repeat(a, cg, axis=1)  # (n, g) -> (n, c)
    scale = rep(rstd)
    shift = rep(-mean * rstd)
    w = weight.astype(jnp.float32)[None]
    scale = scale * w
    shift = shift * w + bias.astype(jnp.float32)[None]
    y = (
        x3.astype(jnp.float32) * scale[:, :, None] + shift[:, :, None]
    ).astype(x.dtype)
    return y.reshape(x.shape), (mean, rstd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_dots(x, weight, bias, num_groups, eps):
    return _gn_dots_impl(x, weight, bias, num_groups, eps)[0]


def _gn_dots_fwd(x, weight, bias, num_groups, eps):
    y, (mean, rstd) = _gn_dots_impl(x, weight, bias, num_groups, eps)
    return y, (x, weight, mean, rstd)


def _gn_dots_bwd(num_groups, eps, res, dy):
    x, weight, mean, rstd = res
    n, c, *spatial = x.shape
    s = math.prod(spatial) if spatial else 1
    g, cg = num_groups, c // num_groups
    cnt = cg * s
    x3 = x.reshape(n, c, s)
    dy3 = dy.reshape(n, c, s)
    t1, t2 = _sums2_dot(dy3, x3)  # per-channel Σdy, Σdy·x (n, c) f32
    w = weight.astype(jnp.float32)
    wt1 = (t1 * w[None]).reshape(n, g, cg).sum(axis=2)
    wt2 = (t2 * w[None]).reshape(n, g, cg).sum(axis=2)
    m_dxhat = wt1 / cnt                                  # (n, g)
    m_dxhat_xhat = (wt2 - mean * wt1) * rstd / cnt       # (n, g)
    repg = lambda a: jnp.repeat(a, cg, axis=1)           # (n, g) -> (n, c)
    r_c = repg(rstd)
    A = r_c * w[None]
    B = -repg(rstd * rstd * m_dxhat_xhat)
    C = -r_c * repg(m_dxhat) + repg(mean) * (-B)
    dx = (
        dy3.astype(jnp.float32) * A[:, :, None]
        + x3.astype(jnp.float32) * B[:, :, None]
        + C[:, :, None]
    ).astype(x.dtype)
    dgamma = ((t2 - repg(mean) * t1) * repg(rstd)).sum(axis=0).astype(weight.dtype)
    dbeta = t1.sum(axis=0)
    return (dx.reshape(x.shape), dgamma, dbeta)


_gn_dots.defvjp(_gn_dots_fwd, _gn_dots_bwd)


def group_norm_dots(x, num_groups, weight, bias, eps):
    """GroupNorm with MXU-dot statistics; None γ/β are substituted with
    constants (their grads fall on constants and are dropped by autodiff)."""
    w = jnp.ones((x.shape[1],), jnp.float32) if weight is None else weight
    b = jnp.zeros((x.shape[1],), jnp.float32) if bias is None else bias
    return _gn_dots(x, w, b, num_groups, eps)


def supported(x_shape, on_tpu: bool) -> bool:
    if os.environ.get("LYCORIS_TPU_FUSED_NORMS", "auto") == "off":
        return False
    if os.environ.get("LYCORIS_TPU_NO_PALLAS", "0") == "1" or not on_tpu:
        return False
    if len(x_shape) < 3:
        return False
    n, c, *spatial = x_shape
    s = math.prod(spatial)
    return s >= 128 and _block_rows(n * c, s) is not None


def group_norm(x, num_groups, weight, bias, eps):
    """Channels-first GroupNorm via the fused kernels; caller guarantees
    ``supported()``. bias grad is returned even when bias is None (dropped
    by autodiff on the zeros constant)."""
    b = jnp.zeros((x.shape[1],), jnp.float32) if bias is None else bias
    return _gn(x, weight, b, num_groups, eps)
