"""Pallas kernel tests (interpret mode on CPU; real kernels exercised on TPU).

Gate: fused kernels must match the jnp reference path bit-for-bit-ish in
fp32 (SURVEY hard-part #1: kernel numerics ≤ 1e-3; tested at 1e-4).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu.functional import loha as f_loha


@pytest.fixture()
def interpret_pallas(monkeypatch):
    """Force pallas_call into interpreter mode for CPU testing."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # re-import modules under patched pallas_call
    import importlib
    import lycoris_tpu.ops.hada as hada
    import lycoris_tpu.ops.lora_fused as lora_fused

    importlib.reload(hada)
    importlib.reload(lora_fused)
    yield hada
    importlib.reload(hada)
    importlib.reload(lora_fused)


@pytest.mark.parametrize("bwd_mode", ["split", "fused1"])
# (64, 320, 8): I=320 is NOT a multiple of 128 — the tile fallback returns
# the full dim and fused1 must use a static lane slice (SD1.5 crash shape)
@pytest.mark.parametrize("shape", [(64, 256, 8), (128, 384, 4), (64, 320, 8)])
def test_hada_pallas_fwd_bwd(interpret_pallas, shape, bwd_mode, monkeypatch):
    monkeypatch.setenv("LYCORIS_TPU_HADA_BWD", bwd_mode)
    hada = interpret_pallas
    O, I, R = shape
    k = jax.random.key(0)
    ws = [
        jax.random.normal(jax.random.fold_in(k, i), s)
        for i, s in enumerate([(R, I), (O, R), (R, I), (O, R)])
    ]
    ref = f_loha.hada_weight(*ws, 0.5)
    got = hada.hada_weight_pallas(*ws, 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)

    g = jax.random.normal(jax.random.fold_in(k, 9), (O, I))
    gr = jax.grad(lambda *w: jnp.sum(f_loha.hada_weight(*w, 0.5) * g), argnums=(0, 1, 2, 3))(*ws)
    gp = jax.grad(lambda *w: jnp.sum(hada.hada_weight_pallas(*w, 0.5) * g), argnums=(0, 1, 2, 3))(*ws)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "shape",
    [
        (64, 256, 384, 8),
        (32, 128, 512, 4),
        # contraction-tiled paths (tc target 2048): K=4096 → 2 k-steps in the
        # fwd kernel; N=2560 → 2 k-steps (tc=1280) in the dx (nn) kernel
        (16, 128, 4096, 8),
        (16, 2560, 256, 8),
    ],
)
def test_fused_lora_matmul(interpret_pallas, shape):
    from lycoris_tpu.ops import lora_fused

    M, N, K, R = shape
    k = jax.random.key(3)
    x = jax.random.normal(jax.random.fold_in(k, 1), (M, K))
    w = jax.random.normal(jax.random.fold_in(k, 2), (N, K))
    down = jax.random.normal(jax.random.fold_in(k, 3), (R, K))
    up = jax.random.normal(jax.random.fold_in(k, 4), (N, R))
    scale = 0.25

    ref = x @ (w + scale * up @ down).T
    got = lora_fused.fused_lora_matmul(x, w, down, up, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-3)

    g = jax.random.normal(jax.random.fold_in(k, 5), (M, N))

    def loss_ref(x, down, up):
        return jnp.sum((x @ (w + scale * up @ down).T) * g)

    def loss_fused(x, down, up):
        return jnp.sum(lora_fused.fused_lora_matmul(x, w, down, up, scale) * g)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, down, up)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, down, up)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize(
    "shape,bias",
    [
        ((8, 16, 320), True),     # SD1.5 transformer dim (non-128-multiple lanes)
        ((4, 64, 1280), True),    # SDXL level-2 dim
        ((2, 24, 640), False),    # no-bias LN (DiT norms)
        ((72, 256), True),        # 2D input, odd row count -> br=8
    ],
)
def test_fused_layer_norm(interpret_pallas, shape, bias):
    from lycoris_tpu.ops import layer_norm as ln

    c = shape[-1]
    k = jax.random.key(5)
    x = jax.random.normal(jax.random.fold_in(k, 1), shape)
    w = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 2), (c,))
    b = 0.1 * jax.random.normal(jax.random.fold_in(k, 3), (c,)) if bias else None
    g = jax.random.normal(jax.random.fold_in(k, 4), shape)
    eps = 1e-5

    def ref(x, w, b):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps) * w
        return y + b if b is not None else y

    got = ln.layer_norm(x, w, b, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, w, b)),
                               rtol=1e-5, atol=1e-5)

    args = (x, w, b) if bias else (x, w)

    def loss_fused(*a):
        bb = a[2] if bias else None
        return jnp.sum(ln.layer_norm(a[0], a[1], bb, eps) * g)

    def loss_ref(*a):
        bb = a[2] if bias else None
        return jnp.sum(ref(a[0], a[1], bb) * g)

    gr = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    for a, bgrad in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(bgrad), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "shape,groups,bias",
    [
        ((2, 320, 16, 16), 32, True),   # SD resnet GN
        ((2, 64, 8, 8), 8, True),
        ((3, 96, 32), 4, False),        # conv1d activation
    ],
)
def test_group_norm_dots(shape, groups, bias):
    """MXU-dot-statistics GroupNorm (ops/group_norm.py group_norm_dots)
    matches the jnp reference in values and all grads."""
    from lycoris_tpu.ops.group_norm import group_norm_dots
    from lycoris_tpu.functional import general

    n, c = shape[:2]
    k = jax.random.key(11)
    x = 2.0 * jax.random.normal(jax.random.fold_in(k, 1), shape) + 0.5
    w = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 2), (c,))
    b = 0.1 * jax.random.normal(jax.random.fold_in(k, 3), (c,)) if bias else None
    g = jax.random.normal(jax.random.fold_in(k, 4), shape)
    eps = 1e-5

    ref = general.group_norm(x, groups, w, b, eps)
    got = group_norm_dots(x, groups, w, b, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    args = (x, w, b) if bias else (x, w)

    def loss_dots(*a):
        bb = a[2] if bias else None
        return jnp.sum(group_norm_dots(a[0], groups, a[1], bb, eps) * g)

    def loss_ref(*a):
        bb = a[2] if bias else None
        return jnp.sum(general.group_norm(a[0], groups, a[1], bb, eps) * g)

    gr = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    gd = jax.grad(loss_dots, argnums=tuple(range(len(args))))(*args)
    for a, bgrad in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(bgrad), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "shape,groups,bias",
    [
        ((2, 320, 16, 16), 32, True),   # SD resnet GN
        ((2, 64, 8, 8), 8, True),
        ((3, 96, 32, 8), 4, False),
    ],
)
def test_fused_group_norm(interpret_pallas, shape, groups, bias):
    from lycoris_tpu.ops import group_norm as gn
    from lycoris_tpu.functional import general

    n, c = shape[:2]
    k = jax.random.key(9)
    x = jax.random.normal(jax.random.fold_in(k, 1), shape)
    w = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, 2), (c,))
    b = 0.1 * jax.random.normal(jax.random.fold_in(k, 3), (c,)) if bias else None
    g = jax.random.normal(jax.random.fold_in(k, 4), shape)
    eps = 1e-5

    ref = general.group_norm(x, groups, w, b, eps)  # jnp path on CPU
    got = gn.group_norm(x, groups, w, b, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    args = (x, w, b) if bias else (x, w)

    def loss_fused(*a):
        bb = a[2] if bias else None
        return jnp.sum(gn.group_norm(a[0], groups, a[1], bb, eps) * g)

    def loss_ref(*a):
        bb = a[2] if bias else None
        return jnp.sum(general.group_norm(a[0], groups, a[1], bb, eps) * g)

    gr = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    gf = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    for a, bgrad in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(bgrad), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
