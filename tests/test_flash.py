"""Custom flash attention kernel numerics (interpret mode on CPU; the real
kernel runs on TPU through ops/attention.py dispatch).

Gate: fwd matches jax.nn.dot_product_attention and grads match XLA autodiff
of the reference formula at fp32 ≤ 1e-4 (BASELINE kernel-numerics gate 1e-3).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu.ops import flash


@pytest.fixture()
def interp(monkeypatch):
    monkeypatch.setattr(flash, "_INTERPRET", True)
    yield


def _ref_attn(q, k, v, sm_scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    p = jax.nn.softmax(s * sm_scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("shape", [(1, 2, 1024, 40), (2, 1, 1024, 64)])
def test_flash_fwd_matches_reference(interp, shape):
    b, h, t, d = shape
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    sm = 1.0 / d**0.5
    got = flash.flash_attention(q, k, v, sm, 256, 256)
    want = _ref_attn(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_flash_grads_match_reference(interp):
    shape = (1, 2, 1024, 40)
    ks = jax.random.split(jax.random.key(1), 4)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    ct = jax.random.normal(ks[3], shape, jnp.float32)
    sm = 1.0 / shape[-1] ** 0.5

    def loss_ours(q, k, v):
        return jnp.sum(flash.flash_attention(q, k, v, sm, 256, 256) * ct)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attn(q, k, v, sm) * ct)

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_flash_independent_bwd_blocks(interp):
    """bwd tiled differently from fwd (the in-train T1024 dispatch) stays
    within the same gradient gate."""
    shape = (1, 2, 1024, 64)
    ks = jax.random.split(jax.random.key(3), 4)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    ct = jax.random.normal(ks[3], shape, jnp.float32)
    sm = 1.0 / shape[-1] ** 0.5

    def loss_ours(q, k, v):
        o = flash.flash_attention(q, k, v, sm, 256, 1024, 128, 1024)
        return jnp.sum(o * ct)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attn(q, k, v, sm) * ct)

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_flash_bf16_close(interp):
    shape = (1, 1, 1024, 40)
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], shape, jnp.bfloat16)
    k = jax.random.normal(ks[1], shape, jnp.bfloat16)
    v = jax.random.normal(ks[2], shape, jnp.bfloat16)
    sm = 1.0 / shape[-1] ** 0.5
    got = flash.flash_attention(q, k, v, sm)
    want = _ref_attn(q, k, v, sm)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=2e-2, rtol=2e-2
    )


def test_flash_remat_grads_and_fwd_dce(interp):
    """flash_attention_remat under jax.checkpoint with the attn_out/attn_lse
    save policy: grads match the reference formula AND the fwd kernel runs
    exactly once in the grad program (the replayed copy is dead code). The
    plain op re-runs its fwd in the replay to regenerate residuals."""
    shape = (1, 2, 1024, 40)
    ks = jax.random.split(jax.random.key(4), 4)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    ct = jax.random.normal(ks[3], shape, jnp.float32)
    sm = 1.0 / shape[-1] ** 0.5
    policy = jax.checkpoint_policies.save_only_these_names("attn_out", "attn_lse")

    def block(q, k, v):
        return jnp.sum(flash.flash_attention_remat(q, k, v, sm, 256, 256) * ct)

    loss_remat = jax.checkpoint(block, policy=policy)
    g_ours = jax.grad(loss_remat, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(_ref_attn(q, k, v, sm) * ct), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )

    def count_kernels(fn):
        jaxpr = jax.make_jaxpr(jax.grad(fn, argnums=(0, 1, 2)))(q, k, v)
        return str(jaxpr).count("pallas_call")

    assert count_kernels(loss_remat) == 2  # one fwd + one bwd
    plain = jax.checkpoint(
        lambda q, k, v: jnp.sum(flash.flash_attention(q, k, v, sm, 256, 256) * ct),
        policy=policy,
    )
    assert count_kernels(plain) == 3  # fwd + replayed fwd + bwd — the quirk removed


def test_supported_gate():
    assert flash.supported((8, 8, 4096, 40), (8, 8, 4096, 40))
    assert not flash.supported((8, 8, 4096, 40), (8, 8, 77, 40))  # cross-attn
    assert not flash.supported((8, 8, 512, 40), (8, 8, 512, 40))  # short seq
    assert not flash.supported((8, 8, 4096, 160), (8, 8, 4096, 160))  # big d


@pytest.mark.parametrize("shape", [(1, 2, 1024, 40), (2, 1, 1024, 64)])
def test_flash_dt_remat_matches_reference(interp, shape):
    """D-major variant (operands (B, H, D, T)): fwd values and all grads
    match the reference formula; fwd kernel is replay-DCE'd like the
    standard remat op."""
    b, h, t, d = shape
    ks = jax.random.split(jax.random.key(7), 4)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    ct = jax.random.normal(ks[3], shape, jnp.float32)
    sm = 1.0 / d**0.5
    tr = lambda x: jnp.swapaxes(x, -1, -2)

    got = tr(flash.flash_attention_remat_dt(tr(q), tr(k), tr(v), sm, 256, 256))
    want = _ref_attn(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)

    policy = jax.checkpoint_policies.save_only_these_names("attn_out", "attn_lse")

    def block(q, k, v):
        o_t = flash.flash_attention_remat_dt(tr(q), tr(k), tr(v), sm, 256, 256)
        return jnp.sum(tr(o_t) * ct)

    loss_remat = jax.checkpoint(block, policy=policy)
    g_ours = jax.grad(loss_remat, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(_ref_attn(q, k, v, sm) * ct), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b_, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )
    jaxpr = jax.make_jaxpr(jax.grad(loss_remat, argnums=(0, 1, 2)))(q, k, v)
    assert str(jaxpr).count("pallas_call") == 2  # one fwd + one bwd
