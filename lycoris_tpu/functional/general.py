"""Shared stateless math for all LyCORIS algorithms — TPU-native (pure JAX).

Semantics-parity notes (citations into /root/reference):
- ``factorization`` / ``power2factorization``: host-side integer code, same
  contract as lycoris/functional/general.py:14-81.
- ``rebuild_tucker`` / ``tucker_weight``: einsum rebuilds,
  lycoris/functional/general.py:9-11, 84-92. On TPU these lower to MXU
  matmuls via XLA; no hand kernel needed (they run once per layer per step
  on tiny operands).
- ``apply_dora_scale``: lycoris/functional/general.py:95-108.
- ``FUNC_LIST`` dispatch-by-weight-ndim (general.py:6) becomes
  :func:`op_by_ndim`, implemented with ``lax.conv_general_dilated`` in
  channels-first (torch) layout so that adapter weights and safetensors
  checkpoints stay bit-compatible with reference files.

All tensor code here is jit-traceable; the integer factorizations are
Python-level (static shapes) exactly like the reference.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Precision policy
# ---------------------------------------------------------------------------
#
# JAX defaults matmuls to the fastest MXU mode (single bf16 pass) even for
# float32 operands. Adapter *weight reconstruction* (diff_weight, Cayley,
# tucker/kron rebuilds) operates on tiny factor matrices but feeds merged
# weights, where BASELINE demands max|Δ| <= 1e-3 vs the fp32 reference — so
# it always runs at Precision.HIGHEST (cost is negligible vs model FLOPs).
# Activation-side ops (linear/convnd) follow the input dtype: fp32 inputs get
# exact fp32 math, bf16 inputs ride the native MXU path.

WEIGHT_PRECISION = lax.Precision.HIGHEST


def op_precision(*arrs):
    """Matmul precision for activation ops: exact for fp32 inputs, fast otherwise."""
    if all(a.dtype == jnp.float32 for a in arrs if a is not None):
        return lax.Precision.HIGHEST
    return None


# ---------------------------------------------------------------------------
# Integer factorizations (host-side, static)
# ---------------------------------------------------------------------------


def factorization(dimension: int, factor: int = -1) -> tuple[int, int]:
    """Decompose ``dimension`` into (m, n), m <= n, m*n == dimension.

    ``m`` is the largest divisor of ``dimension`` that is <= ``factor``
    while minimizing m+n (i.e. closest-to-square under the cap). With
    ``factor <= 0`` the cap is the dimension itself (most balanced split).
    Contract matches reference lycoris/functional/general.py:14-56 exactly,
    including the fast path when ``factor`` divides ``dimension``.
    """
    if factor > 0 and (dimension % factor) == 0:
        m = factor
        n = dimension // factor
        if m > n:
            n, m = m, n
        return m, n
    if factor < 0:
        factor = dimension
    m, n = 1, dimension
    length = m + n
    while m < n:
        new_m = m + 1
        while dimension % new_m != 0:
            new_m += 1
        new_n = dimension // new_m
        if new_m + new_n > length or new_m > factor:
            break
        m, n = new_m, new_n
    if m > n:
        n, m = m, n
    return m, n


def power2factorization(dimension: int, factor: int = -1) -> tuple[int | None, int]:
    """Find (m, n) with m even, n a power of two, m*n == dimension, m <= factor.

    Returns (None, 0) when impossible. Matches reference
    lycoris/functional/general.py:59-81 (used by BOFT).
    """
    if factor == -1:
        factor = dimension

    m = n = 0
    while m <= factor:
        m += 2
        while dimension % m != 0 and m < dimension:
            m += 2
        if m > factor:
            break
        if (dimension // m).bit_count() == 1:
            n = dimension // m

    if n == 0:
        return None, n
    return dimension // n, n


# ---------------------------------------------------------------------------
# Tucker rebuilds
# ---------------------------------------------------------------------------


def rebuild_tucker(t: jax.Array, wa: jax.Array, wb: jax.Array) -> jax.Array:
    """einsum("i j ..., i p, j r -> p r ...", t, wa, wb).

    Reference: lycoris/functional/general.py:9-11.
    """
    return jnp.einsum("ij...,ip,jr->pr...", t, wa, wb, precision=WEIGHT_PRECISION)


def tucker_weight(wa: jax.Array, wb: jax.Array, t: jax.Array) -> jax.Array:
    """Reference lycoris/functional/general.py:90-92."""
    temp = jnp.einsum("ij...,jr->ir...", t, wb, precision=WEIGHT_PRECISION)
    return jnp.einsum("ij...,ir->rj...", temp, wa, precision=WEIGHT_PRECISION)


def tucker_weight_from_conv(up: jax.Array, down: jax.Array, mid: jax.Array) -> jax.Array:
    """Reference lycoris/functional/general.py:84-87 (conv kernels with 1x1 up/down)."""
    up = up.reshape(up.shape[0], up.shape[1])
    down = down.reshape(down.shape[0], down.shape[1])
    return jnp.einsum("mn...,im,nj->ij...", mid, up, down, precision=WEIGHT_PRECISION)


# ---------------------------------------------------------------------------
# DoRA
# ---------------------------------------------------------------------------


def apply_dora_scale(org_weight: jax.Array, rebuild: jax.Array, dora_scale: jax.Array, scale) -> jax.Array:
    """Weight-decompose (DoRA) merge, column-norm variant.

    Reference: lycoris/functional/general.py:95-108 (wd_on_out=False path).
    """
    dora_norm_dims = org_weight.ndim - 1
    weight = org_weight + rebuild
    weight = weight.astype(dora_scale.dtype)
    weight_norm = (
        jnp.linalg.norm(
            jnp.swapaxes(weight, 0, 1).reshape(weight.shape[1], -1),
            axis=1,
            keepdims=True,
        )
        .reshape(weight.shape[1], *[1] * dora_norm_dims)
        .swapaxes(0, 1)
    )
    merged_scale1 = weight / weight_norm * dora_scale
    diff_weight = merged_scale1 - org_weight
    return org_weight + diff_weight * scale


def apply_dora_scale_on_out(org_weight: jax.Array, rebuild: jax.Array, dora_scale: jax.Array, scale) -> jax.Array:
    """Weight-decompose (DoRA) merge, row-norm (wd_on_out=True) variant.

    Reference: lycoris/modules/locon.py:239-260 (wd_on_out branch).
    """
    weight = org_weight + rebuild
    weight = weight.astype(dora_scale.dtype)
    dora_norm_dims = org_weight.ndim - 1
    weight_norm = jnp.linalg.norm(weight.reshape(weight.shape[0], -1), axis=1).reshape(
        weight.shape[0], *[1] * dora_norm_dims
    )
    merged_scale1 = weight / weight_norm * dora_scale
    diff_weight = merged_scale1 - org_weight
    return org_weight + diff_weight * scale


# ---------------------------------------------------------------------------
# Channels-first linear / convNd ops (torch-layout; FUNC_LIST equivalent)
# ---------------------------------------------------------------------------


def _normalize_tuple(v, n: int):
    if isinstance(v, (tuple, list)):
        if len(v) == n:
            return tuple(int(x) for x in v)
        if len(v) == 1:
            return tuple(int(v[0]) for _ in range(n))
        raise ValueError(f"expected length-{n} tuple, got {v}")
    return tuple(int(v) for _ in range(n))


def linear(x: jax.Array, weight: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """y = x @ W^T + b with W of shape (out, in) — torch F.linear semantics."""
    y = jnp.matmul(x, weight.T, precision=op_precision(x, weight))
    if bias is not None:
        y = y + bias
    return y


def linear_head_split(
    x: jax.Array, weight: jax.Array, bias: jax.Array | None, heads: int, head_dim: int
) -> jax.Array:
    """Attention projection with the head split fused into the matmul:
    ``(..., T, C_in) -> (..., heads, T, head_dim)``.

    Mathematically ``linear(x, W)`` followed by reshape + transpose, but
    expressed as one einsum so XLA emits the matmul directly in the
    head-major layout the attention kernel consumes — measured on v5e this
    removes the relayout copy that the separate transpose materializes
    (−0.5 ms per projection fwd+bwd at SD shapes)."""
    w3 = weight.reshape(heads, head_dim, weight.shape[-1])
    y = jnp.einsum("...tc,hdc->...htd", x, w3, precision=op_precision(x, weight))
    if bias is not None:
        y = y + bias.reshape(heads, head_dim)[:, None, :]
    return y


def convnd(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride=1,
    padding=0,
    dilation=1,
    groups: int = 1,
) -> jax.Array:
    """Channels-first N-d convolution with torch-layout weight (O, I/g, *k).

    torch F.conv{1,2,3}d semantics on jax arrays; lowers to a single XLA
    convolution (MXU) regardless of N.
    """
    nd = weight.ndim - 2
    stride = _normalize_tuple(stride, nd)
    dilation = _normalize_tuple(dilation, nd)
    if isinstance(padding, str):
        pad = padding.upper()
        if pad not in ("SAME", "VALID"):
            raise ValueError(f"unsupported padding {padding}")
    else:
        p = _normalize_tuple(padding, nd)
        pad = [(pi, pi) for pi in p]
    spatial = "DHW"[-nd:] if nd <= 3 else None
    if spatial is None:
        raise ValueError(f"unsupported conv ndim {nd}")
    lhs_spec = "NC" + spatial
    rhs_spec = "OI" + spatial
    if _dw_shifts_eligible(nd, stride, dilation, groups, pad, weight.shape):
        return _conv2d_dw_shifts(x, weight, bias, tuple(pad))
    dn = lax.conv_dimension_numbers(x.shape, weight.shape, (lhs_spec, rhs_spec, lhs_spec))
    y = lax.conv_general_dilated(
        x,
        weight,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=dn,
        feature_group_count=groups,
        precision=op_precision(x, weight),
    )
    if bias is not None:
        y = y + bias.reshape(1, -1, *[1] * nd)
    return y


conv1d = partial(convnd)
conv2d = partial(convnd)
conv3d = partial(convnd)


# ---------------------------------------------------------------------------
# LYCORIS_TPU_CONV_DW=shifts: conv2d filter gradient as k·k shifted matmuls
# ---------------------------------------------------------------------------
#
# The SD1.5 step profile puts the conv fusions at ~58 % MXU utilization,
# conv-backward bound. XLA lowers the filter gradient as another convolution
# whose tiling at 3×3/64² shapes underutilizes the MXU; the same contraction
# expressed as k·k dense [O, N·H·W]×[N·H·W, I] matmuls (one per kernel tap,
# operands = shifted views of the padded input that fuse into the matmul)
# keeps the systolic array on large clean GEMMs. Forward and dx stay on
# XLA's native convolutions (dx measured fine). Scope: 2-D, stride 1,
# dilation 1, groups 1, odd kernel with SAME-style symmetric padding —
# i.e. every 3×3 in the UNet; everything else uses plain autodiff.


def _conv2d_same_core(x, weight, pad):
    dn = lax.conv_dimension_numbers(x.shape, weight.shape, ("NCHW", "OIHW", "NCHW"))
    return lax.conv_general_dilated(
        x, weight, window_strides=(1, 1), padding=pad,
        dimension_numbers=dn, precision=op_precision(x, weight),
    )


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv2d_dw_shifts(x, weight, bias, pad):
    y = _conv2d_same_core(x, weight, pad)
    if bias is not None:
        y = y + bias.reshape(1, -1, 1, 1)
    return y


def _conv2d_dw_shifts_fwd(x, weight, bias, pad):
    return _conv2d_dw_shifts(x, weight, bias, pad), (x, weight, bias)


def _conv2d_dw_shifts_bwd(pad, res, dy):
    x, weight, bias = res
    o, i_, kh, kw = weight.shape
    (ph, _), (pw, _) = pad
    h, w = x.shape[2], x.shape[3]
    # dx: XLA's native backward-input convolution (via vjp of the core conv)
    _, pullback = jax.vjp(lambda xx: _conv2d_same_core(xx, weight, pad), x)
    (dx,) = pullback(dy)
    # dW: one [O, I] GEMM per kernel tap, contracting (N, H, W); the shifted
    # slices of the padded input fuse into the matmul operand reads
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    taps = []
    for ki in range(kh):
        for kj in range(kw):
            xs = lax.slice(xp, (0, 0, ki, kj), (xp.shape[0], xp.shape[1], ki + h, kj + w))
            taps.append(
                lax.dot_general(
                    dy, xs, (((0, 2, 3), (0, 2, 3)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
    dw = jnp.stack(taps, axis=-1).reshape(o, i_, kh, kw).astype(weight.dtype)
    db = None if bias is None else jnp.sum(dy, axis=(0, 2, 3)).astype(bias.dtype)
    return dx, dw, db


_conv2d_dw_shifts.defvjp(_conv2d_dw_shifts_fwd, _conv2d_dw_shifts_bwd)


def _dw_shifts_eligible(nd, stride, dilation, groups, pad, wshape) -> bool:
    import os as _os

    if _os.environ.get("LYCORIS_TPU_CONV_DW", "") != "shifts":
        return False
    if nd != 2 or groups != 1 or stride != (1, 1) or dilation != (1, 1):
        return False
    if isinstance(pad, str) or len(wshape) != 4:
        return False
    kh, kw = wshape[2], wshape[3]
    if kh * kw <= 1 or kh % 2 == 0 or kw % 2 == 0:
        return False
    return tuple(pad) == ((kh // 2, kh // 2), (kw // 2, kw // 2))


def layer_norm(x: jax.Array, normalized_shape, weight=None, bias=None, eps: float = 1e-5) -> jax.Array:
    """torch F.layer_norm semantics: normalize over the trailing dims.

    Single-trailing-dim affine case dispatches to the fused Pallas kernel
    on TPU (ops/layer_norm.py) — XLA's norm fusions run ~an order of
    magnitude off the bandwidth roofline at SD shapes."""
    if isinstance(normalized_shape, int):
        normalized_shape = (normalized_shape,)
    if len(normalized_shape) == 1 and weight is not None and weight.ndim == 1:
        from ..ops import layer_norm as _ln

        try:
            on_tpu = jax.default_backend() in ("tpu", "axon")
        except Exception:
            on_tpu = False
        if _ln.supported(x.shape, on_tpu):
            return _ln.layer_norm(x, weight, bias, eps)
    axes = tuple(range(x.ndim - len(normalized_shape), x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


def rms_norm(x: jax.Array, normalized_shape, weight=None, bias=None, eps: float = 1e-6) -> jax.Array:
    """RMSNorm (torch nn.RMSNorm / the reference's duck-typed ``_norm``
    modules, lycoris/modules/norms.py:37-44): normalize over the trailing
    dims by the root-mean-square, no mean subtraction.

    ``weight``/``bias`` apply AFTER normalization — with ``weight=dw`` this
    is exactly the reference's norm-delta path ``org_norm(x) * delta_w``
    (norms.py:148-157)."""
    if isinstance(normalized_shape, int):
        normalized_shape = (normalized_shape,)
    axes = tuple(range(x.ndim - len(normalized_shape), x.ndim))
    ms = jnp.mean(jnp.square(x), axis=axes, keepdims=True)
    y = x * lax.rsqrt(ms + eps)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


def group_norm(x: jax.Array, num_groups: int, weight=None, bias=None, eps: float = 1e-5) -> jax.Array:
    """torch F.group_norm semantics (channels-first input (N, C, *spatial)).

    Reshape-free formulation: the naive (N, G, C/G, *spatial) view forces XLA
    to materialize relayout copies of the full activation in the channels-
    minor NCHW layouts convs prefer (profiled at ~65 ms/step on the SD1.5
    UNet — more than attention). Instead: per-CHANNEL sums over spatial
    (layout-native reduction, one fused pass), a tiny (N, C)→(N, G) combine,
    and one output FMA with γ/β folded in. Same math, fp32 statistics.

    (A Pallas multi-kernel GN exists in ops/group_norm.py but measured
    SLOWER in-train — SD1.5 5.79→5.01 steps/s — because its custom-call
    boundaries stop XLA from fusing the surrounding silu/conv epilogues
    into the norm chain; this jnp form stays the production path.)

    ``LYCORIS_TPU_GN=dots`` switches the statistics to MXU dot_generals
    (ops/group_norm.py group_norm_dots): same math, but the per-channel
    spatial sums ride the matrix unit instead of XLA's reduce loops, which
    profile at 21-63 GB/s on the SDXL HWNC conv layouts."""
    import os as _os

    mode = _os.environ.get("LYCORIS_TPU_GN", "auto")
    if mode == "dots" and x.ndim >= 3:
        from ..ops.group_norm import group_norm_dots

        return group_norm_dots(x, num_groups, weight, bias, eps)
    if mode == "fused2" and x.ndim >= 3:
        from ..ops.group_norm_v2 import group_norm_act as _gn2

        return _gn2(x, num_groups, weight, bias, eps)
    return _group_norm_jnp(x, num_groups, weight, bias, eps)


def _group_norm_jnp(x, num_groups, weight=None, bias=None, eps: float = 1e-5):
    """The reshape-free jnp formulation (see :func:`group_norm`). Separate so
    kernel fallbacks can call it WITHOUT re-entering the env-flag dispatch
    (fused2's unsupported-shape fallback would otherwise recurse)."""
    n, c, *spatial = x.shape
    cg = c // num_groups
    sp_axes = tuple(range(2, x.ndim))
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=sp_axes)        # [n, c] — one fused pass over x
    s2 = jnp.sum(xf * xf, axis=sp_axes)   # fuses with s1
    cnt = cg * math.prod(spatial) if spatial else cg
    gs1 = jnp.sum(s1.reshape(n, num_groups, cg), axis=2)
    gs2 = jnp.sum(s2.reshape(n, num_groups, cg), axis=2)
    mean_g = gs1 / cnt
    var_g = gs2 / cnt - mean_g * mean_g
    rstd_g = lax.rsqrt(var_g + eps)
    # per-channel affine: y = x*scale_c + shift_c (γ/β folded, single FMA)
    rep = lambda a: jnp.repeat(a, cg, axis=1)
    scale_c = rep(rstd_g)
    shift_c = rep(-mean_g * rstd_g)
    if weight is not None:
        w = weight.astype(jnp.float32).reshape(1, c)
        scale_c = scale_c * w
        shift_c = shift_c * w
    if bias is not None:
        shift_c = shift_c + bias.astype(jnp.float32).reshape(1, c)
    exp = (n, c, *[1] * len(spatial))
    y = xf * scale_c.reshape(exp) + shift_c.reshape(exp)
    return y.astype(x.dtype)

def group_norm_act(x: jax.Array, num_groups: int, weight=None, bias=None,
                   eps: float = 1e-5, act: str | None = None) -> jax.Array:
    """GroupNorm with an optionally FOLDED activation (the UNet's norm→silu
    chains). Under ``LYCORIS_TPU_GN=fused2`` the act rides inside the Pallas
    kernels (ops/group_norm_v2.py) so the chain costs zero extra passes;
    otherwise it is the plain jnp/dots group_norm followed by the act
    (numerically identical)."""
    import os as _os

    if act not in (None, "silu"):
        raise ValueError(f"unsupported folded act {act!r}")
    if (
        act is not None
        and _os.environ.get("LYCORIS_TPU_GN", "auto") == "fused2"
        and x.ndim >= 3
    ):
        from ..ops.group_norm_v2 import group_norm_act as _gn2

        return _gn2(x, num_groups, weight, bias, eps, act=act)
    y = group_norm(x, num_groups, weight, bias, eps)
    return jax.nn.silu(y) if act == "silu" else y


@jax.custom_vjp
def _geglu_mul_cvjp(h_full: jax.Array) -> jax.Array:
    h, gate = jnp.split(h_full, 2, axis=-1)
    return h * jax.nn.gelu(gate)


def _geglu_mul_fwd(h_full):
    return _geglu_mul_cvjp(h_full), h_full


def _geglu_mul_bwd(h_full, dy):
    import os as _os

    mode = _os.environ.get("LYCORIS_TPU_GEGLU", "off")
    if mode == "dt":
        from ..ops import geglu as _geglu

        if _geglu.supported(h_full.shape):
            # one-pass D-major Pallas kernel: no concat/pad materializes
            # (ops/geglu.py); unsupported small tiers fall through to concat
            return (_geglu.geglu_bwd_dt(h_full, dy),)
    f = h_full.shape[-1] // 2
    h = h_full[..., :f]
    gate = h_full[..., f:]
    g, gprime = jax.jvp(jax.nn.gelu, (gate,), (jnp.ones_like(gate),))
    dh = dy * g
    dgate = dy * h * gprime
    if _os.environ.get("LYCORIS_TPU_GEGLU", "off") == "dus":
        zero_idx = (0,) * h_full.ndim
        out = jnp.zeros_like(h_full)
        out = jax.lax.dynamic_update_slice(out, dh, zero_idx)
        out = jax.lax.dynamic_update_slice(out, dgate, zero_idx[:-1] + (f,))
    else:
        out = jnp.concatenate([dh, dgate], axis=-1)
    return (out,)


_geglu_mul_cvjp.defvjp(_geglu_mul_fwd, _geglu_mul_bwd)


def geglu_mul(h_full: jax.Array) -> jax.Array:
    """GEGLU gate product: ``h * gelu(gate)`` with ``h, gate = split(h_full, 2)``.

    Plain autodiff of the split turns the backward concat of (dh, dgate) into
    XLA pad+maximum fusions — TWO full-width [*, 2F] writes plus a combine
    (profiled 19 ms/step on SDXL b4, ``pad_maximum_fusion``). The custom vjp
    emits an explicit concat instead (``LYCORIS_TPU_GEGLU=concat``)
    or two dynamic_update_slice writes into one buffer (``=dus``).
    Default ``off`` (plain autodiff): dus measured −4% on SD1.5 (5.775 →
    5.543) and −11% on SDXL stacked legs — the zeros+DUS passes lose more
    than the pad+maximum they replace; concat legs crashed the axon compiler
    mid-compile (silent death ~10 min in, no traceback)."""
    import os as _os

    if _os.environ.get("LYCORIS_TPU_GEGLU", "off") == "off":
        h, gate = jnp.split(h_full, 2, axis=-1)
        return h * jax.nn.gelu(gate)
    return _geglu_mul_cvjp(h_full)


# FUNC_LIST equivalent: index by weight ndim (reference general.py:6)
FUNC_LIST = [None, None, linear, convnd, convnd, convnd]


def op_by_ndim(ndim: int):
    """Dispatch helper mirroring reference ``FUNC_LIST[w.dim()]``."""
    if ndim == 2:
        return linear
    if ndim in (3, 4, 5):
        return convnd
    raise ValueError(f"no op for weight ndim {ndim}")


# ---------------------------------------------------------------------------
# Initializers (torch-parity)
# ---------------------------------------------------------------------------


def kaiming_uniform(key: jax.Array, shape, a: float = math.sqrt(5), dtype=jnp.float32) -> jax.Array:
    """torch.nn.init.kaiming_uniform_ parity: U(-b, b), b = sqrt(6/((1+a^2)*fan_in)).

    fan_in for (out, in, *k) tensors = in * prod(k), matching torch's
    _calculate_fan_in_and_fan_out.
    """
    fan_in = shape[1] * math.prod(shape[2:]) if len(shape) > 1 else shape[0]
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def normal_init(key: jax.Array, shape, std: float = 1.0, dtype=jnp.float32) -> jax.Array:
    return jax.random.normal(key, shape, dtype=dtype) * std


def zeros_init(_key, shape, dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(shape, dtype=dtype)
