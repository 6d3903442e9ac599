"""Fused low-rank epilogue matmul: y = x @ (W + γ·up@down)ᵀ in ONE kernel.

Per (M, N) output tile the kernel builds the effective weight tile in VMEM —
up_tile(tn,r) @ down(r,K) is a rank-r MXU matmul — and contracts against the
x tile with fp32 accumulation. Backward (custom_vjp): dx reuses the same
fused kernel with the non-transposed effective weight; the factor grads are
rank-r contractions (dup = γ·gᵀ(x·downᵀ), ddown = γ·(g·up)ᵀx) that XLA
handles without help — no (N, K) gradient intermediate is ever materialized.

MEASURED AND REJECTED as the in-train default (v5e, SD1.5 LoRA attn-mlp
dim8 b8, warm cache): merged fast path 5.81 steps/s vs this kernel 4.51
(−23%). Reconstructing W_eff per grid cell re-reads up/down every (i, k)
step and the custom call blocks XLA from fusing the surrounding epilogue
(bias/GEGLU/residual) into the matmul, while the merged path pays one W'
HBM write per layer per step and then runs a clean fully-fused XLA matmul.
The in-train dispatch was removed with that measurement (docs/Guidelines.md
"Fused-epilogue A/B"); the kernel stays as a tested reference point.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = lax.Precision.HIGHEST


def _tile(dim, target, align):
    """Largest tile ≤ target that divides ``dim`` AND is a multiple of
    ``align`` (8 sublanes / 128 lanes — cf. ops/hada.py's ×16/×128 rule).
    Falls back to the full dim (≤ 512, Mosaic pads internally) when no
    aligned divisor exists (e.g. SD's 320-wide projections); returns None
    for shapes the kernel shouldn't touch."""
    t = min(dim, target) // align * align
    while t >= align:
        if dim % t == 0:
            return t
        t -= align
    return dim if dim <= 512 else None


def _fused_kernel_nt(x_ref, w_ref, down_ref, up_ref, scale_ref, o_ref, acc_scr):
    """o[i,j] = x[i,:] @ (W[j,:] + s*up[j,:]@down)ᵀ  (W stored (N, K)).

    Grid (i, j, k): k tiles the contraction dim so VMEM stays bounded even
    for the 10k-wide FF projections (loading full-K tiles OOMs the 16 MB
    scoped VMEM there); fp32 scratch accumulates across k steps.

    Kernel dots run at DEFAULT precision (one bf16 MXU pass) with fp32
    accumulation via preferred_element_type — Mosaic rejects bf16 operands
    with an fp32 contract-precision request ("Bad lhs type"), and one-pass
    bf16 matches the merged fast path's numerics class anyway."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    w_eff = w_ref[:].astype(jnp.float32) + scale_ref[0, 0] * jnp.dot(
        up_ref[:], down_ref[:], preferred_element_type=jnp.float32
    )
    acc_scr[:] += jnp.dot(
        x_ref[:], w_eff.T.astype(x_ref.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


def _fused_kernel_nn(g_ref, w_ref, down_ref, up_ref, scale_ref, o_ref, acc_scr):
    """o[i,k] = g[i,:] @ (W[:,k] + s*(up@down)[:,k])  — for dx in backward.
    Grid (i, j, k): k tiles the contraction dim (N = W rows)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    w_eff = w_ref[:].astype(jnp.float32) + scale_ref[0, 0] * jnp.dot(
        up_ref[:], down_ref[:], preferred_element_type=jnp.float32
    )
    acc_scr[:] += jnp.dot(
        g_ref[:], w_eff.astype(g_ref.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_scr[:].astype(o_ref.dtype)


def _call_fused(kernel, a, w, down, up, scale, out_cols_from_w_rows: bool):
    M = a.shape[0]
    N, K = w.shape
    R = down.shape[0]
    out_dim, contract_dim = (N, K) if out_cols_from_w_rows else (K, N)
    tm = _tile(M, 256, 8)
    tn = _tile(out_dim, 256, 128)
    tc = _tile(contract_dim, 2048, 128)
    assert tm is not None and tn is not None and tc is not None, (M, N, K)
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    if out_cols_from_w_rows:
        # y = a @ w_effᵀ : j tiles w rows, k tiles w cols (= contraction)
        w_spec = pl.BlockSpec((tn, tc), lambda i, j, k: (j, k), memory_space=pltpu.VMEM)
        up_spec = pl.BlockSpec((tn, R), lambda i, j, k: (j, 0), memory_space=pltpu.VMEM)
        down_spec = pl.BlockSpec((R, tc), lambda i, j, k: (0, k), memory_space=pltpu.VMEM)
        a_spec = pl.BlockSpec((tm, tc), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)
    else:
        # y = a @ w_eff : j tiles w cols, k tiles w rows (= contraction)
        w_spec = pl.BlockSpec((tc, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)
        up_spec = pl.BlockSpec((tc, R), lambda i, j, k: (k, 0), memory_space=pltpu.VMEM)
        down_spec = pl.BlockSpec((R, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM)
        a_spec = pl.BlockSpec((tm, tc), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)
    grid = (M // tm, out_dim // tn, contract_dim // tc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            a_spec,
            w_spec,
            down_spec,
            up_spec,
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, out_dim), a.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )(a, w, down, up, scale_arr)


@jax.custom_vjp
def fused_lora_matmul(x, w, down, up, scale=1.0):
    """x: (M, K); w: (N, K) torch layout; down: (r, K); up: (N, r)."""
    return _call_fused(_fused_kernel_nt, x, w, down, up, scale, True)


def _fwd(x, w, down, up, scale):
    return fused_lora_matmul(x, w, down, up, scale), (x, w, down, up, scale)


def _bwd(res, g):
    x, w, down, up, scale = res
    # dx = g @ (W + s·up·down): same fused kernel, non-transposed weight
    dx = _call_fused(_fused_kernel_nn, g, w, down, up, scale, False)
    # factor grads via rank-r contractions (no (N, K) intermediate)
    t = jnp.matmul(x.astype(jnp.float32), down.T.astype(jnp.float32), precision=_PREC)
    dup = scale * jnp.matmul(g.T.astype(jnp.float32), t, precision=_PREC)
    s = jnp.matmul(g.astype(jnp.float32), up.astype(jnp.float32), precision=_PREC)
    ddown = scale * jnp.matmul(s.T, x.astype(jnp.float32), precision=_PREC)
    return dx, None, ddown.astype(down.dtype), dup.astype(up.dtype), None


fused_lora_matmul.defvjp(_fwd, _bwd)


def supported(x_shape, w_shape) -> bool:
    M = 1
    for d in x_shape[:-1]:
        M *= d
    N, K = w_shape
    return (
        M >= 8
        and N >= 128
        and K >= 128
        and _tile(M, 256, 8) is not None
        and _tile(N, 256, 128) is not None
        and _tile(K, 256, 128) is not None
    )
