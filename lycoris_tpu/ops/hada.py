"""Fused LoHa Hadamard-of-matmuls Pallas kernel.

Computes ΔW = (w1u @ w1d) ⊙ (w2u @ w2d) · γ in ONE kernel: each (O, I) tile
does two rank-r MXU matmuls in VMEM and multiplies them elementwise before
the single HBM write. The jnp fallback materializes BOTH full-size products
in HBM (2 extra O×I round trips) — this kernel removes them, which is the
same memory/compute trade the reference's hand-written autograd makes
(lycoris/functional/loha.py:10-30, docs/Algo-Details.md:94-99), extended to
the forward as well.

Backward (custom_vjp) recomputes the partner product per tile instead of
caching it, exactly like the reference:
  g1u = (g ⊙ P2) @ w1dᵀ,  g1d = w1uᵀ @ (g ⊙ P2),  P2 = w2u@w2d  (recomputed)
  g2u = (g ⊙ P1) @ w2dᵀ,  g2d = w2uᵀ @ (g ⊙ P1),  P1 = w1u@w1d

Gated by ``use_pallas`` (default: on for TPU backends, off elsewhere); all
math accumulates in fp32 regardless of input dtype (SURVEY hard-part #1).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _round_up(x, m):
    return -(-x // m) * m


def _tile(dim, target):
    """Sublane (second-to-last) tile: largest divisor of dim <= target that is
    a multiple of 8; falls back to the full dim (Mosaic requires the
    second-to-last block dim % 8 == 0 OR == the array dim)."""
    # multiples of 16 cover the strictest (bf16) sublane packing
    t = min(dim, target) // 16 * 16
    while t >= 16:
        if dim % t == 0:
            return t
        t -= 16
    return dim


def _tile_lane(dim, target=512):
    """Last-dim tile: largest divisor of dim <= target that is a multiple of
    128; falls back to the full dim (Mosaic lane constraint)."""
    t = min(dim, target) // 128 * 128
    while t >= 128:
        if dim % t == 0:
            return t
        t -= 128
    return dim


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _hada_fwd_kernel(w1u_ref, w1d_ref, w2u_ref, w2d_ref, scale_ref, out_ref):
    p1 = jnp.dot(w1u_ref[:], w1d_ref[:], preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    p2 = jnp.dot(w2u_ref[:], w2d_ref[:], preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    out_ref[:] = (p1 * p2 * scale_ref[0, 0]).astype(out_ref.dtype)


def _hada_fwd_pallas(w1d, w1u, w2d, w2u, scale):
    O, R = w1u.shape
    _, I = w1d.shape
    tm = _tile(O, 256)
    tn = _tile_lane(I, 512)
    grid = (O // tm, I // tn)
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        _hada_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, R), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, R), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((O, I), w1u.dtype),
    )(w1u, w1d, w2u, w2d, scale_arr)


# ---------------------------------------------------------------------------
# backward kernels — per tile: recompute partner product, accumulate grads
# ---------------------------------------------------------------------------


def _hada_bwd_u_kernel(g_ref, w1u_ref, w1d_ref, w2u_ref, w2d_ref, scale_ref, g1u_ref, g2u_ref):
    """grid (O_tiles, I_tiles): u-grads accumulate over the inner (j) axis, so
    each output block's grid visits are consecutive (TPU grids run serially
    row-major — Pallas keeps a revisited output block resident in VMEM)."""
    j = pl.program_id(1)
    g = g_ref[:].astype(jnp.float32) * scale_ref[0, 0]
    t1 = g * jnp.dot(w2u_ref[:], w2d_ref[:], preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    t2 = g * jnp.dot(w1u_ref[:], w1d_ref[:], preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)

    @pl.when(j == 0)
    def _():
        g1u_ref[:] = jnp.zeros_like(g1u_ref)
        g2u_ref[:] = jnp.zeros_like(g2u_ref)

    g1u_ref[:] += jnp.dot(t1, w1d_ref[:].astype(jnp.float32).T, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    g2u_ref[:] += jnp.dot(t2, w2d_ref[:].astype(jnp.float32).T, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)


def _hada_bwd_d_kernel(g_ref, w1u_ref, w1d_ref, w2u_ref, w2d_ref, scale_ref, g1d_ref, g2d_ref):
    """grid (I_tiles, O_tiles): d-grads accumulate over the inner (i) axis."""
    i = pl.program_id(1)
    g = g_ref[:].astype(jnp.float32) * scale_ref[0, 0]
    t1 = g * jnp.dot(w2u_ref[:], w2d_ref[:], preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    t2 = g * jnp.dot(w1u_ref[:], w1d_ref[:], preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)

    @pl.when(i == 0)
    def _():
        g1d_ref[:] = jnp.zeros_like(g1d_ref)
        g2d_ref[:] = jnp.zeros_like(g2d_ref)

    g1d_ref[:] += jnp.dot(w1u_ref[:].astype(jnp.float32).T, t1, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)
    g2d_ref[:] += jnp.dot(w2u_ref[:].astype(jnp.float32).T, t2, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST)


def _make_hada_bwd_fused1_kernel(single_row: bool, single_col: bool):
    """Single pass over g: all four factor grads per tile.

    The u-grad outputs (O, R) and d-grad outputs (R, I) are FULL-array
    resident (constant index_map) — at rank ≤ 64 they are a few hundred KB
    of VMEM, so instead of two kernels with transposed grids (each
    re-reading the whole f32 cotangent from HBM) the accumulators just stay
    on-chip for the whole grid. Measured motive: the split backward's
    custom-calls run ~7× off the HBM roofline on the SDXL LoHa step
    (0.462 ms for a 52 MB g read; ~210 ms/step total across 722 modules).

    ``single_row``/``single_col``: when the tile fallback returns the FULL
    dim (e.g. I=320 — not a multiple of 128), the grid has one block on
    that axis and the accumulator slice must be static (`:`) — Mosaic
    cannot prove `j*320` lane-aligned."""

    def kernel(g_ref, w1u_ref, w1d_ref, w2u_ref, w2d_ref,
               scale_ref, g1u_ref, g2u_ref, g1d_ref, g2d_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        tm, tn = g_ref.shape

        @pl.when((i == 0) & (j == 0))
        def _():
            g1u_ref[:] = jnp.zeros_like(g1u_ref)
            g2u_ref[:] = jnp.zeros_like(g2u_ref)
            g1d_ref[:] = jnp.zeros_like(g1d_ref)
            g2d_ref[:] = jnp.zeros_like(g2d_ref)

        g = g_ref[:].astype(jnp.float32) * scale_ref[0, 0]
        w1u = w1u_ref[:].astype(jnp.float32)
        w1d = w1d_ref[:].astype(jnp.float32)
        w2u = w2u_ref[:].astype(jnp.float32)
        w2d = w2d_ref[:].astype(jnp.float32)
        t1 = g * jnp.dot(w2u, w2d, preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
        t2 = g * jnp.dot(w1u, w1d, preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
        rm = slice(None) if single_row else pl.ds(i * tm, tm)
        rn = slice(None) if single_col else pl.ds(j * tn, tn)
        g1u_ref[rm, :] += jnp.dot(t1, w1d.T, preferred_element_type=jnp.float32,
                                  precision=lax.Precision.HIGHEST)
        g2u_ref[rm, :] += jnp.dot(t2, w2d.T, preferred_element_type=jnp.float32,
                                  precision=lax.Precision.HIGHEST)
        g1d_ref[:, rn] += jnp.dot(w1u.T, t1, preferred_element_type=jnp.float32,
                                  precision=lax.Precision.HIGHEST)
        g2d_ref[:, rn] += jnp.dot(w2u.T, t2, preferred_element_type=jnp.float32,
                                  precision=lax.Precision.HIGHEST)

    return kernel


def _hada_bwd_fused1(w1d, w1u, w2d, w2u, scale, g, interpret=False):
    O, R = w1u.shape
    _, I = w1d.shape
    tm = _tile(O, 256)
    tn = _tile_lane(I, 512)
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    kw = {"interpret": True} if interpret else {}
    g1u, g2u, g1d, g2d = pl.pallas_call(
        _make_hada_bwd_fused1_kernel(tm == O, tn == I),
        grid=(O // tm, I // tn),
        in_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, R), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, R), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(full((O, R)), full((O, R)), full((R, I)), full((R, I))),
        out_shape=(
            jax.ShapeDtypeStruct((O, R), jnp.float32),
            jax.ShapeDtypeStruct((O, R), jnp.float32),
            jax.ShapeDtypeStruct((R, I), jnp.float32),
            jax.ShapeDtypeStruct((R, I), jnp.float32),
        ),
        **kw,
    )(g, w1u, w1d, w2u, w2d, scale_arr)
    return (
        g1d.astype(w1d.dtype),
        g1u.astype(w1u.dtype),
        g2d.astype(w2d.dtype),
        g2u.astype(w2u.dtype),
    )


def _hada_bwd_pallas(w1d, w1u, w2d, w2u, scale, g):
    import os as _os

    O, R = w1u.shape
    _, I = w1d.shape
    tm = _tile(O, 256)
    tn = _tile_lane(I, 512)
    # fused1: one pass over g, all four grads, accumulators VMEM-resident.
    # DEFAULT since r4 — warm-cache A/B on the exact shipped config:
    # SDXL LoHa b4 1.0534 -> 1.1146 (+5.8%), SD1.5 LoHa b8 5.4927 -> 5.6906
    # (+3.6%). `split` keeps the two-kernel transposed-grid form.
    if _os.environ.get("LYCORIS_TPU_HADA_BWD", "fused1") == "fused1":
        return _hada_bwd_fused1(w1d, w1u, w2d, w2u, scale, g)
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)

    g1u, g2u = pl.pallas_call(
        _hada_bwd_u_kernel,
        grid=(O // tm, I // tn),
        in_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, R), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, R), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, R), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, R), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((O, R), jnp.float32),
            jax.ShapeDtypeStruct((O, R), jnp.float32),
        ),
    )(g, w1u, w1d, w2u, w2d, scale_arr)

    g1d, g2d = pl.pallas_call(
        _hada_bwd_d_kernel,
        grid=(I // tn, O // tm),
        in_specs=[
            pl.BlockSpec((tm, tn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, R), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, R), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, tn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, I), jnp.float32),
            jax.ShapeDtypeStruct((R, I), jnp.float32),
        ),
    )(g, w1u, w1d, w2u, w2d, scale_arr)

    return (
        g1d.astype(w1d.dtype),
        g1u.astype(w1u.dtype),
        g2d.astype(w2d.dtype),
        g2u.astype(w2u.dtype),
    )


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _supported(w1d, w1u):
    O, R = w1u.shape
    I = w1d.shape[1]
    # need MXU-friendly dims: last dims multiples of 128 after tiling is
    # overkill for adapters; just require every dim >= 8 and even tiles
    return O >= 8 and I >= 128 and R >= 1


@jax.custom_vjp
def hada_weight_pallas(w1d, w1u, w2d, w2u, scale=1.0):
    return _hada_fwd_pallas(w1d, w1u, w2d, w2u, scale)


def _fwd(w1d, w1u, w2d, w2u, scale):
    return hada_weight_pallas(w1d, w1u, w2d, w2u, scale), (w1d, w1u, w2d, w2u, scale)


def _bwd(res, g):
    w1d, w1u, w2d, w2u, scale = res
    return (*_hada_bwd_pallas(w1d, w1u, w2d, w2u, scale, g), None)


hada_weight_pallas.defvjp(_fwd, _bwd)


def hada_weight(w1d, w1u, w2d, w2u, scale=1.0, use_pallas=None):
    """Dispatch: Pallas fused kernel on TPU, jnp custom-vjp fallback elsewhere."""
    from ..functional import loha as f_loha

    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas and _supported(w1d, w1u):
        return hada_weight_pallas(w1d, w1u, w2d, w2u, scale)
    return f_loha.hada_weight(w1d, w1u, w2d, w2u, scale)
