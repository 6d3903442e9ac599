"""Functional-core parity tests.

Two gates (SURVEY.md §4):
1. diff-vs-bypass equivalence: ``bypass_forward_diff(x, ...) ≈ op(x, diff_weight(...))``
   per algorithm x layer kind, with the reference's per-dtype MSE epsilons
   (reference test/functional.py:12-16, 52-87).
2. cross-framework goldens: our jnp diff_weight matches the PyTorch
   reference's diff_weight bit-for-bit-ish (<=1e-5) on identical params.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu.functional import locon, loha, lokr, diag_oft, boft, general

EPS = {jnp.float32: 5e-6, jnp.bfloat16: 5e-4}

DIM = 16

LAYER_CASES = {
    "linear": ((DIM, DIM), (1, DIM)),
    "conv1d": ((DIM, DIM, 3), (1, DIM, 16)),
    "conv2d": ((DIM, DIM, 3, 3), (1, DIM, 16, 16)),
    "conv3d": ((DIM, DIM, 3, 3, 3), (1, DIM, 8, 8, 8)),
}


def _op_for(w):
    return general.op_by_ndim(w.ndim)


def _noise_params(key, params, scale=0.01):
    out = []
    for p in params:
        if p is None:
            out.append(None)
        else:
            key, sub = jax.random.split(key)
            out.append(p + jax.random.normal(sub, p.shape, p.dtype) * scale)
    return out


@pytest.mark.parametrize("layer", list(LAYER_CASES))
@pytest.mark.parametrize("algo", ["locon", "loha", "lokr", "diag_oft", "boft"])
def test_diff_vs_bypass(algo, layer, rng):
    mod = {"locon": locon, "loha": loha, "lokr": lokr, "diag_oft": diag_oft, "boft": boft}[algo]
    w_shape, x_shape = LAYER_CASES[layer]
    k1, k2, k3 = jax.random.split(rng, 3)
    w = jax.random.normal(k1, w_shape)
    x = jax.random.normal(k2, x_shape)
    op = _op_for(w)
    y = op(x, w)

    if algo in ("diag_oft", "boft"):
        params = list(mod.weight_gen(w_shape, 4))
        params = _noise_params(k3, params)
        diff_w = mod.diff_weight(w, *params)
        diff_y = mod.bypass_forward_diff(y, *params, need_transpose=w.ndim > 2)
    else:
        if algo == "loha" and w.ndim > 2:
            # loha non-tucker factors a conv weight flattened to (O, I*prod(k));
            # that path is exercised at module level, see test_modules.py
            pytest.skip("loha non-tucker conv handled at module level (flattened)")
        params = list(mod.weight_gen(k3, w_shape, 4, tucker=False))
        params = _noise_params(k3, params)
        diff_w = mod.diff_weight(*params)
        diff_y = mod.bypass_forward_diff(x, y, *params)

    diff_y_from_w = op(x, diff_w.astype(x.dtype))
    mse = jnp.mean((diff_y - diff_y_from_w) ** 2)
    assert float(mse) < EPS[jnp.float32], f"{algo}/{layer} mse={float(mse)}"


@pytest.mark.parametrize("layer", ["conv1d", "conv2d", "conv3d"])
@pytest.mark.parametrize("algo", ["locon", "loha", "lokr"])
def test_diff_vs_bypass_tucker(algo, layer, rng):
    mod = {"locon": locon, "loha": loha, "lokr": lokr}[algo]
    w_shape, x_shape = LAYER_CASES[layer]
    k1, k2, k3 = jax.random.split(rng, 3)
    w = jax.random.normal(k1, w_shape)
    x = jax.random.normal(k2, x_shape)
    op = _op_for(w)
    y = op(x, w)

    params = list(mod.weight_gen(k3, w_shape, 4, tucker=True))
    params = _noise_params(k3, params)
    diff_w = mod.diff_weight(*params)
    diff_y = mod.bypass_forward_diff(x, y, *params)
    diff_y_from_w = op(x, diff_w.astype(x.dtype))
    mse = jnp.mean((diff_y - diff_y_from_w) ** 2)
    assert float(mse) < EPS[jnp.float32], f"{algo}/{layer} tucker mse={float(mse)}"


# ---------------------------------------------------------------------------
# Cross-framework goldens vs the PyTorch reference
# ---------------------------------------------------------------------------


def _t2j(t):
    return jnp.asarray(t.detach().cpu().numpy())


@pytest.mark.parametrize("layer", ["linear", "conv2d"])
@pytest.mark.parametrize("algo", ["locon", "loha", "lokr", "diag_oft", "boft"])
def test_diff_weight_matches_reference(algo, layer, ref):
    import torch

    torch.manual_seed(0)
    from lycoris.functional import locon as r_locon, loha as r_loha, lokr as r_lokr
    from lycoris.functional import diag_oft as r_oft, boft as r_boft

    rmod = {"locon": r_locon, "loha": r_loha, "lokr": r_lokr, "diag_oft": r_oft, "boft": r_boft}[algo]
    jmod = {"locon": locon, "loha": loha, "lokr": lokr, "diag_oft": diag_oft, "boft": boft}[algo]
    w_shape, _ = LAYER_CASES[layer]
    w_t = torch.randn(*w_shape)

    if algo in ("diag_oft", "boft"):
        r_params = list(rmod.weight_gen(w_t, 4))
    else:
        r_params = list(rmod.weight_gen(w_t, 4, tucker=False))
    r_params = [None if p is None else p + torch.randn_like(p) * 0.01 for p in r_params]
    j_params = [None if p is None else _t2j(p) for p in r_params]

    if algo in ("diag_oft", "boft"):
        r_diff = rmod.diff_weight(w_t, *r_params)
        j_diff = jmod.diff_weight(_t2j(w_t), *j_params)
    else:
        if algo == "loha" and len(w_shape) > 2:
            pytest.skip("reference loha non-tucker conv diff is 2D (module-level concern)")
        r_diff = rmod.diff_weight(*r_params)
        j_diff = jmod.diff_weight(*j_params)

    np.testing.assert_allclose(
        np.asarray(j_diff), r_diff.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_factorization_matches_reference(ref):
    from lycoris.functional.general import factorization as rf, power2factorization as rp2

    for dim in [127, 128, 250, 360, 512, 1024, 640, 768, 320, 2048, 1280, 96, 7, 1]:
        for factor in [-1, 2, 4, 8, 16]:
            assert general.factorization(dim, factor) == rf(dim, factor), (dim, factor)
            assert general.power2factorization(dim, factor) == rp2(dim, factor), (dim, factor)


def test_hada_weight_grad_matches_reference(ref):
    """LoHa custom-vjp backward parity against the reference autograd.Function."""
    import torch
    from lycoris.functional.loha import make_weight as r_make_weight

    torch.manual_seed(1)
    O = I = 16
    R = 4
    ws = [torch.randn(R, I), torch.randn(O, R), torch.randn(R, I), torch.randn(O, R)]
    for w in ws:
        w.requires_grad_(True)
    scale = torch.tensor(0.5)
    out = r_make_weight(ws[0], ws[1], ws[2], ws[3], scale)
    g = torch.randn_like(out)
    out.backward(g)
    r_grads = [w.grad.numpy() for w in ws]

    j_ws = [jnp.asarray(w.detach().numpy()) for w in ws]
    g_j = jnp.asarray(g.numpy())

    def f(w1d, w1u, w2d, w2u):
        return loha.hada_weight(w1d, w1u, w2d, w2u, 0.5)

    _, vjp = jax.vjp(f, *j_ws)
    j_grads = vjp(g_j)
    for jg, rg in zip(j_grads, r_grads):
        np.testing.assert_allclose(np.asarray(jg), rg, rtol=1e-4, atol=1e-5)


def test_conv_dw_shifts_grad_parity(monkeypatch):
    """LYCORIS_TPU_CONV_DW=shifts (filter grad as k*k shifted GEMMs) must
    match plain autodiff for 3x3 SAME convs and leave other shapes on the
    autodiff path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lycoris_tpu.functional.general import convnd

    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (2, 8, 16, 16))
    w = jax.random.normal(k2, (12, 8, 3, 3)) * 0.1
    b = jax.random.normal(k3, (12,)) * 0.1
    dy_seed = jax.random.normal(k4, (2, 12, 16, 16))

    def loss(x, w, b):
        return jnp.sum(convnd(x, w, b, stride=1, padding=1) * dy_seed)

    ref = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    monkeypatch.setenv("LYCORIS_TPU_CONV_DW", "shifts")
    got = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    for g, r, name in zip(got, ref, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5, err_msg=name)

    # ineligible shapes (stride 2) still differentiate correctly
    def loss2(x, w):
        return jnp.sum(convnd(x, w, None, stride=2, padding=1) ** 2)

    g2 = jax.grad(loss2)(x, w)
    assert np.isfinite(np.asarray(g2)).all()


@pytest.mark.parametrize("geglu_mode", ["off", "dus", "concat", "dt"])
def test_geglu_mul_matches_split_form(monkeypatch, geglu_mode):
    """geglu_mul must match the naive split+gelu form for values and grads in
    EVERY LYCORIS_TPU_GEGLU mode: 'off' (plain autodiff — the default),
    'dus'/'concat' (the _geglu_mul_cvjp custom vjp with DUS- or concat-based
    backward combine), 'dt' (one-pass D-major Pallas backward, ops/geglu.py,
    interpreter mode on CPU), including under jax.checkpoint."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lycoris_tpu.functional.general import geglu_mul

    monkeypatch.setenv("LYCORIS_TPU_GEGLU", geglu_mode)

    if geglu_mode == "dt":
        from lycoris_tpu.ops import geglu as geglu_op

        monkeypatch.setattr(geglu_op, "_INTERPRET", True)
        # kernel-supported shape (T%512==0, F%256==0); the small-tier
        # fallback (concat) is covered by the unsupported-shape leg below
        x = jax.random.normal(jax.random.key(0), (2, 512, 512), jnp.float32)
        dy = jax.random.normal(jax.random.key(1), (2, 512, 256), jnp.float32)
    else:
        x = jax.random.normal(jax.random.key(0), (3, 17, 64), jnp.float32)
        dy = jax.random.normal(jax.random.key(1), (3, 17, 32), jnp.float32)

    def ref(h):
        a, g = jnp.split(h, 2, axis=-1)
        return a * jax.nn.gelu(g)

    np.testing.assert_allclose(
        np.asarray(geglu_mul(x)), np.asarray(ref(x)), rtol=1e-6, atol=1e-6
    )
    # the dt kernel's interpret-mode gelu' composes in a slightly different
    # op order: 2.7e-6 max abs on O(1) grads — still far under bf16 noise
    atol = 1e-5 if geglu_mode == "dt" else 1e-6
    g1 = jax.grad(lambda h: jnp.sum(geglu_mul(h) * dy))(x)
    g2 = jax.grad(lambda h: jnp.sum(ref(h) * dy))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=atol)

    # under jax.checkpoint (the UNet wraps transformers in remat tiers) the
    # custom vjp must still produce identical grads
    g3 = jax.grad(lambda h: jnp.sum(jax.checkpoint(geglu_mul)(h) * dy))(x)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g2), rtol=1e-5, atol=atol)

    if geglu_mode == "dt":
        # unsupported shape must fall back (concat path) and stay correct
        xs = jax.random.normal(jax.random.key(2), (3, 17, 64), jnp.float32)
        dys = jax.random.normal(jax.random.key(3), (3, 17, 32), jnp.float32)
        gs = jax.grad(lambda h: jnp.sum(geglu_mul(h) * dys))(xs)
        gr = jax.grad(lambda h: jnp.sum(ref(h) * dys))(xs)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                   rtol=1e-5, atol=1e-6)


def test_boft_chain_path_matches_dense(rng):
    """Non-square weight (cols < dim) takes the direct-chain branch of
    functional/boft.py:_rotate_impl — every LAYER_CASES weight is square, so
    without this the branch (and the scale != 1 blend in _scaled_r) had no
    coverage (r4 advisor finding). The chain applied to W must equal the
    dense Q = chain(I) matmul, for both front (weight) and last (bypass)
    layouts and for scale 1.0 / 0.35."""
    k1, k2, k3 = jax.random.split(rng, 3)
    w = jax.random.normal(k1, (32, 8))  # dim=32 > cols=8 -> direct chain
    blocks, _ = boft.weight_gen(w.shape, 4)
    blocks = blocks + jax.random.normal(k2, blocks.shape) * 0.01
    wide = jax.random.normal(k3, (32, 64))  # cols >= dim -> dense-Q branch
    for scale in (1.0, 0.35):
        r = boft._scaled_r(blocks, None, scale)
        q = boft.dense_rotation(r)
        got = boft._rotate_impl(w, blocks, None, scale, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(q @ w),
                                   rtol=1e-5, atol=1e-6)
        # bypass layout: features last, tokens (8) < dim -> moveaxis chain
        got_last = boft._rotate_impl(w.T, blocks, None, scale, True)
        np.testing.assert_allclose(np.asarray(got_last), np.asarray((q @ w).T),
                                   rtol=1e-5, atol=1e-6)
        # wide input exercises the dense branch with the same Q semantics
        got_wide = boft._rotate_impl(wide, blocks, None, scale, False)
        np.testing.assert_allclose(np.asarray(got_wide), np.asarray(q @ wide),
                                   rtol=1e-5, atol=1e-6)


def test_boft_diff_weight_rect_matches_reference(ref):
    """Reference golden on a RECTANGULAR weight: our chain-path diff_weight
    must match the PyTorch reference butterfly loop (boft.py:37-71) on
    identical params — guards the cols < dim branch end to end."""
    import torch
    from lycoris.functional import boft as r_boft

    torch.manual_seed(3)
    w_t = torch.randn(32, 8)
    r_params = [p if p is None else p + torch.randn_like(p) * 0.01
                for p in r_boft.weight_gen(w_t, 4)]
    j_params = [None if p is None else _t2j(p) for p in r_params]
    r_diff = r_boft.diff_weight(w_t, *r_params)
    j_diff = boft.diff_weight(_t2j(w_t), *j_params)
    np.testing.assert_allclose(np.asarray(j_diff), r_diff.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
