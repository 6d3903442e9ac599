"""Env-flag dispatch branches: every shipped flag value routes to the path
it claims, and the alternate-path numerics match.

Closes the VERDICT-r3 #8 gap class ("no dispatch branch ships untested"):
LYCORIS_TPU_FLASH / LYCORIS_TPU_FLASH_DT gate logic (ops/attention.py) and
LYCORIS_TPU_GN modes (functional/general.py group_norm). The kernels
themselves are parity-tested in test_flash.py / test_group_norm_v2.py; this
file tests the DISPATCH — which branch fires for which (flag, shape).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lycoris_tpu.ops import attention as attn_mod


def _record_dispatch(monkeypatch, calls):
    """Force the TPU gate on and stub the kernels to record which fired."""
    from lycoris_tpu.ops import flash

    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)

    def fake_dt(q, k, v, sm_scale, block_q, block_k, block_q_bwd, block_k_bwd):
        calls.append("dt")
        # DT operands are (B, H, D, T); output matches
        return jnp.zeros_like(q)

    def fake_remat(q, k, v, sm_scale, block_q, block_k, block_q_bwd, block_k_bwd):
        calls.append("tmajor")
        return jnp.zeros_like(q)

    monkeypatch.setattr(flash, "flash_attention_remat_dt", fake_dt)
    monkeypatch.setattr(flash, "flash_attention_remat", fake_remat)


def _qkv(t, d, h=2, b=1):
    q = jnp.zeros((b, t, h, d), jnp.bfloat16)
    return q, q, q


def test_flash_dt_default_fires_at_t4096(monkeypatch):
    calls = []
    _record_dispatch(monkeypatch, calls)
    monkeypatch.delenv("LYCORIS_TPU_FLASH_DT", raising=False)
    attn_mod.dot_product_attention(*_qkv(4096, 64))
    assert calls == ["dt"]  # default-on since r4


def test_flash_dt_default_covers_1024(monkeypatch):
    # r5: T1024 joined the dt path (FLASH_DT_MIN_T default 1024 with the
    # 512-block tiling); raising MIN_T still gates it back to T-major
    calls = []
    _record_dispatch(monkeypatch, calls)
    monkeypatch.setenv("LYCORIS_TPU_FLASH_DT", "1")
    attn_mod.dot_product_attention(*_qkv(1024, 64))
    assert calls == ["dt"]
    calls.clear()
    monkeypatch.setenv("LYCORIS_TPU_FLASH_DT_MIN_T", "2048")
    attn_mod.dot_product_attention(*_qkv(1024, 64))
    assert calls == ["tmajor"]


def test_flash_dt_opt_out(monkeypatch):
    calls = []
    _record_dispatch(monkeypatch, calls)
    monkeypatch.setenv("LYCORIS_TPU_FLASH_DT", "0")
    attn_mod.dot_product_attention(*_qkv(4096, 64))
    assert calls == ["tmajor"]


def test_flash_off_goes_xla(monkeypatch):
    calls = []
    _record_dispatch(monkeypatch, calls)
    monkeypatch.setenv("LYCORIS_TPU_FLASH", "off")
    out = attn_mod.dot_product_attention(*_qkv(1024, 64))
    assert calls == []  # XLA path; and it actually computes
    assert out.shape == (1, 1024, 2, 64)


def test_flash_cross_attention_never_dispatches(monkeypatch):
    calls = []
    _record_dispatch(monkeypatch, calls)
    q = jnp.zeros((1, 4096, 2, 64), jnp.bfloat16)
    k = jnp.zeros((1, 77, 2, 64), jnp.bfloat16)
    attn_mod.dot_product_attention(q, k, k)
    assert calls == []


@pytest.mark.parametrize("mode", ["auto", "dots"])
def test_group_norm_env_modes_match(monkeypatch, mode):
    """group_norm through the env flag: 'dots' (MXU statistics) must match
    the default reshape-free jnp form bit-for-tolerance."""
    from lycoris_tpu.functional import general as G

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 6, 6), jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).randn(8), jnp.float32)
    b = jnp.asarray(np.random.RandomState(2).randn(8), jnp.float32)
    ref = G._group_norm_jnp(x, 4, w, b)
    monkeypatch.setenv("LYCORIS_TPU_GN", mode)
    got = G.group_norm(x, 4, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_group_norm_fused2_env_mode_match(monkeypatch):
    """'fused2' routes to the Pallas v2 kernel (interpret mode on CPU)."""
    from lycoris_tpu.functional import general as G
    from lycoris_tpu.ops import group_norm_v2 as gn2

    monkeypatch.setattr(gn2, "_INTERPRET", True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8), jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).randn(8), jnp.float32)
    b = jnp.asarray(np.random.RandomState(2).randn(8), jnp.float32)
    ref = G._group_norm_jnp(x, 4, w, b)
    monkeypatch.setenv("LYCORIS_TPU_GN", "fused2")
    got = G.group_norm(x, 4, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
