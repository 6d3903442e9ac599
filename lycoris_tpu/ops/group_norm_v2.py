"""Layout-native fused GroupNorm(+SiLU) Pallas kernels — v2.

The step profiles (SD1.5 r3: 33.6 ms/step, SDXL r3: 72.6 ms/step of
(act, Σx, Σx²)/(Σdy, Σdy·x) tuple fusions running 24-50× off their HBM
roofline) show XLA's multi-output reduce fusions are the single largest
attackable bucket. The round-2 kernel (ops/group_norm.py) lost in-train
because its rows=N·C / lanes=S view fights the conv activations' physical
layout ({1,0,3,2}: C minor on lanes) — every call relayouted the activation.

v2 works on the layout-NATIVE view instead: [N, C, *spatial] with layout
{1,0,3,2} holds the same bytes as a standard-layout [S, N, C] array, so
``transpose(2,3,0,1).reshape(S, N, C)`` lowers to a bitcast, and the kernels
see lanes=C / sublanes=N / grid-walked S — no relayout on either side.

  fwd:  stats kernel   (accumulate Σx, Σx² into an (N,C) f32 block across the
        S grid) → tiny (N,C)→(N,G) combine in jnp →
        apply kernel   y = act(x·scale_c + shift_c)
  bwd:  tstats kernel  (recompute z = x·scale+shift, dy = dh·act'(z);
        accumulate Σdy, Σdy·x) → tiny per-group coefficients →
        dx kernel      dx = dy·A_c + x·B_c + C_c   (dy recomputed in-kernel)

SiLU rides inside the kernels (``act="silu"``) so the resnet's norm→silu
chain costs zero extra passes; dγ/dβ fall out of the same t-sums.

Semantics: torch F.group_norm (+ optional fused activation), channels-first.
Reference parity: lycoris/modules/norms.py wraps nn.GroupNorm; our
functional/general.py group_norm is the jnp fallback with identical math.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # tests flip this for CPU interpreter mode


def _act_fwd(z, act):
    if act == "silu":
        return z * jax.nn.sigmoid(z)
    return z


def _act_grad(z, act):
    if act == "silu":
        s = jax.nn.sigmoid(z)
        return s * (1.0 + z * (1.0 - s))
    return jnp.ones_like(z)


# ---------------------------------------------------------------------------
# kernels on the (S, N, C) view: lanes=C, sublanes=N, grid walks S
# ---------------------------------------------------------------------------


def _stats_kernel(x_ref, s1_ref, s2_ref):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)  # (sb, N, C)
    p1 = jnp.sum(x, axis=0)
    p2 = jnp.sum(x * x, axis=0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = p1
        s2_ref[:] = p2

    @pl.when(i > 0)
    def _acc():
        s1_ref[:] += p1
        s2_ref[:] += p2


def _apply_kernel(x_ref, sc_ref, sh_ref, y_ref, *, act):
    z = x_ref[:].astype(jnp.float32) * sc_ref[:] + sh_ref[:]
    y_ref[:] = _act_fwd(z, act).astype(y_ref.dtype)


def _tstats_kernel(x_ref, dh_ref, sc_ref, sh_ref, t1_ref, t2_ref, *, act):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    dh = dh_ref[:].astype(jnp.float32)
    z = x * sc_ref[:] + sh_ref[:]
    dy = dh * _act_grad(z, act)
    p1 = jnp.sum(dy, axis=0)
    p2 = jnp.sum(dy * x, axis=0)

    @pl.when(i == 0)
    def _init():
        t1_ref[:] = p1
        t2_ref[:] = p2

    @pl.when(i > 0)
    def _acc():
        t1_ref[:] += p1
        t2_ref[:] += p2


def _dx_kernel(x_ref, dh_ref, sc_ref, sh_ref, a_ref, b_ref, c_ref, dx_ref, *, act):
    x = x_ref[:].astype(jnp.float32)
    dh = dh_ref[:].astype(jnp.float32)
    z = x * sc_ref[:] + sh_ref[:]
    dy = dh * _act_grad(z, act)
    dx_ref[:] = (dy * a_ref[:] + x * b_ref[:] + c_ref[:]).astype(dx_ref.dtype)


def _sblock(s: int, n: int, c: int) -> int | None:
    # keep each (sb, N, C) f32 working block ≲ 2 MB (double-buffered in/out
    # plus casts lands ~8-10x of this in scoped VMEM)
    cap = max(8, (2 << 20) // max(1, 4 * n * c))
    for sb in (512, 256, 128, 64, 32, 16, 8):
        if sb <= cap and s % sb == 0:
            return sb
    return None


def _nc_spec():
    return pl.BlockSpec((None, None), lambda i: (0, 0))


def _grid_call(kernel, s, n, c, sb, ins, outs, **kwargs):
    snc = pl.BlockSpec((sb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    nc = pl.BlockSpec((n, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [snc if a.ndim == 3 else nc for a in ins]
    out_specs = [snc if o.shape != (n, c) else nc for o in outs]
    return pl.pallas_call(
        functools.partial(kernel, **kwargs),
        grid=(s // sb,),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=outs if len(outs) > 1 else outs[0],
        interpret=_INTERPRET,
    )(*ins)


def _to_view(x):
    """(N, C, *spatial) -> (S, N, C). A bitcast when x carries the conv
    layout {1,0,3,2}; XLA's layout assignment propagates the standard-layout
    requirement backward so no copy materializes on the conv path."""
    n, c, *spatial = x.shape
    s = math.prod(spatial) if spatial else 1
    return jnp.transpose(x.reshape(n, c, s), (2, 0, 1)), s


def _from_view(xv, shape):
    n, c, *spatial = shape
    return jnp.transpose(xv, (1, 2, 0)).reshape(shape)


def _combine(s1, s2, g, cg, cnt, eps):
    n = s1.shape[0]
    gs1 = jnp.sum(s1.reshape(n, g, cg), axis=2)
    gs2 = jnp.sum(s2.reshape(n, g, cg), axis=2)
    mean = gs1 / cnt
    var = gs2 / cnt - mean * mean
    return mean, jax.lax.rsqrt(var + eps)


def _scale_shift(mean, rstd, weight, bias, cg):
    rep = lambda a: jnp.repeat(a, cg, axis=1)  # (N,G) -> (N,C)
    scale = rep(rstd)
    shift = rep(-mean * rstd)
    if weight is not None:
        w = weight.astype(jnp.float32)[None]
        scale = scale * w
        shift = shift * w
    if bias is not None:
        shift = shift + bias.astype(jnp.float32)[None]
    return scale, shift


def _fwd_impl(x, weight, bias, num_groups, eps, act):
    n, c, *spatial = x.shape
    xv, s = _to_view(x)
    sb = _sblock(s, n, c)
    cg = c // num_groups
    f32nc = jax.ShapeDtypeStruct((n, c), jnp.float32)
    s1, s2 = _grid_call(_stats_kernel, s, n, c, sb, [xv], [f32nc, f32nc])
    mean, rstd = _combine(s1, s2, num_groups, cg, cg * s, eps)
    scale, shift = _scale_shift(mean, rstd, weight, bias, cg)
    y = _grid_call(
        _apply_kernel, s, n, c, sb, [xv, scale, shift],
        [jax.ShapeDtypeStruct(xv.shape, x.dtype)], act=act,
    )
    return _from_view(y, x.shape), (mean, rstd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn2(x, weight, bias, num_groups, eps, act):
    return _fwd_impl(x, weight, bias, num_groups, eps, act)[0]


def _gn2_fwd(x, weight, bias, num_groups, eps, act):
    y, (mean, rstd) = _fwd_impl(x, weight, bias, num_groups, eps, act)
    return y, (x, weight, bias, mean, rstd)


def _gn2_bwd(num_groups, eps, act, res, dh):
    x, weight, bias, mean, rstd = res
    n, c, *spatial = x.shape
    g, cg = num_groups, c // num_groups
    xv, s = _to_view(x)
    dhv, _ = _to_view(dh)
    sb = _sblock(s, n, c)
    cnt = cg * s
    scale, shift = _scale_shift(mean, rstd, weight, bias, cg)
    f32nc = jax.ShapeDtypeStruct((n, c), jnp.float32)
    t1, t2 = _grid_call(
        _tstats_kernel, s, n, c, sb, [xv, dhv, scale, shift],
        [f32nc, f32nc], act=act,
    )
    w = (jnp.ones((c,), jnp.float32) if weight is None
         else weight.astype(jnp.float32))
    wt1 = (t1 * w[None]).reshape(n, g, cg).sum(axis=2)
    wt2 = (t2 * w[None]).reshape(n, g, cg).sum(axis=2)
    m_dxhat = wt1 / cnt
    m_dxhat_xhat = (wt2 - mean * wt1) * rstd / cnt
    repg = lambda a: jnp.repeat(a, cg, axis=1)
    r_c = repg(rstd)
    A = r_c * w[None]
    B = -repg(rstd * rstd * m_dxhat_xhat)
    C = -r_c * repg(m_dxhat) + repg(mean) * (-B)
    dx = _grid_call(
        _dx_kernel, s, n, c, sb, [xv, dhv, scale, shift, A, B, C],
        [jax.ShapeDtypeStruct(xv.shape, x.dtype)], act=act,
    )
    dgamma = (
        ((t2 - repg(mean) * t1) * repg(rstd)).sum(axis=0).astype(weight.dtype)
        if weight is not None else None
    )
    dbeta = t1.sum(axis=0).astype(bias.dtype) if bias is not None else None
    return (_from_view(dx, x.shape), dgamma, dbeta)


_gn2.defvjp(_gn2_fwd, _gn2_bwd)


def supported(x_shape) -> bool:
    if len(x_shape) < 3:
        return False
    n, c, *spatial = x_shape
    s = math.prod(spatial)
    return s >= 256 and _sblock(s, n, c) is not None


def group_norm_act(x, num_groups, weight=None, bias=None, eps: float = 1e-5,
                   act: str | None = None):
    """Fused GroupNorm(+activation), layout-native kernels. Caller should
    check :func:`supported`; falls back to the jnp form otherwise."""
    if not supported(x.shape):
        # call the jnp math directly — general.group_norm would re-dispatch
        # here under LYCORIS_TPU_GN=fused2 and recurse
        from ..functional.general import _group_norm_jnp as _jnp_gn

        y = _jnp_gn(x, num_groups, weight, bias, eps)
        return _act_fwd(y.astype(jnp.float32), act).astype(y.dtype) if act else y
    return _gn2(x, weight, bias, num_groups, eps, act)
