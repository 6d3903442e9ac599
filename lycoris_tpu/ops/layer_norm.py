"""Fused LayerNorm Pallas kernels (fwd + bwd).

Why: XLA's layer-norm fusions on the SDXL train step run 7-13x off the HBM
bandwidth roofline (profiled on v5e: LN fwd `convert_reduce_fusion`
0.42 ms for a (4,1024,1280) tensor whose ~32 MB of traffic rooflines at
~40 µs; the LN bwd `multiply_reduce_fusion` class is ~12x off). Norm time
totals ~100+ ms of an 880 ms SDXL step. These kernels do the textbook
one-pass-per-direction fusion: fwd computes fp32 row stats in VMEM and
writes only y; bwd RECOMPUTES the row stats from the x block it already
reads (free VPU math — saving stats would cost a sublane→lane relayout per
block) and emits dx in one pass, accumulating dw/db in an fp32 VMEM
scratch across the (sequential) row grid.

Reference semantics: torch F.layer_norm over the trailing dim
(lycoris functional ops normalize the same way; see
functional/general.py layer_norm).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)  # (br, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * w_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, w_ref, dx_ref, dw_ref, db_ref,
                dw_scr, db_scr, *, eps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    # recompute row stats from the x block already in VMEM: free VPU math,
    # and it avoids the sublane->lane relayout a saved-stats row would cost
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    wdy = dy * w
    c1 = jnp.mean(wdy * xhat, axis=-1, keepdims=True)
    c2 = jnp.mean(wdy, axis=-1, keepdims=True)
    dx_ref[:] = ((wdy - xhat * c1 - c2) * rstd).astype(dx_ref.dtype)
    dw_scr[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_scr[:] += jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = dw_scr[:]
        db_ref[:] = db_scr[:]


def _block_rows(r: int) -> int | None:
    for br in (512, 256, 128, 64, 32, 16, 8):
        if r % br == 0:
            return br
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm2d(x, w, b, eps):
    return _fwd_call(x, w, b, eps)


def _fwd_call(x, w, b, eps):
    r, c = x.shape
    br = _block_rows(r)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
    )(x, w.reshape(1, c), b.reshape(1, c))


def _vjp_fwd(x, w, b, eps):
    return _fwd_call(x, w, b, eps), (x, w)


def _vjp_bwd(eps, res, dy):
    x, w = res
    r, c = x.shape
    br = _block_rows(r)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
    )(x, dy, w.reshape(1, c))
    return dx, dw.reshape(c).astype(w.dtype), db.reshape(c)


_layer_norm2d.defvjp(_vjp_fwd, _vjp_bwd)


def supported(x_shape, on_tpu: bool) -> bool:
    if os.environ.get("LYCORIS_TPU_FUSED_NORMS", "auto") == "off":
        return False
    if os.environ.get("LYCORIS_TPU_NO_PALLAS", "0") == "1" or not on_tpu:
        return False
    if len(x_shape) < 2:
        return False
    c = x_shape[-1]
    r = 1
    for d in x_shape[:-1]:
        r *= d
    # c >= 512: in-train A/B on v5e — SDXL (LN dims 640/1280) 1.1245 ->
    # 1.1615 steps/s with the kernel, but SD1.5 regressed 1.3% when its
    # 320-wide T4096 LNs used it (narrow lanes pad 320->384 and the row
    # blocks go bandwidth-starved); XLA keeps the narrow case.
    # c bounded so the (br=512, c) blocks fit VMEM.
    return 512 <= c <= 8192 and r >= 8 and _block_rows(r) is not None


def layer_norm(x, weight, bias, eps: float):
    """Trailing-dim LayerNorm via the fused kernel; caller guarantees
    `supported()`. ``bias=None`` is handled with a zero vector (the add
    fuses into the same pass)."""
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    b = jnp.zeros((c,), weight.dtype) if bias is None else bias
    # bwd returns db regardless; for bias=None the cotangent is dropped by
    # autodiff since the zeros constant is not differentiated through
    y = _layer_norm2d(x2, weight, b, float(eps))
    return y.reshape(x.shape)
