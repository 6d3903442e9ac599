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
    # re-import module under patched pallas_call
    import importlib
    import lycoris_tpu.ops.hada as hada

    importlib.reload(hada)
    yield hada
    importlib.reload(hada)


@pytest.mark.parametrize("shape", [(64, 256, 8), (128, 384, 4)])
def test_hada_pallas_fwd_bwd(interpret_pallas, shape):
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
