"""Dropout trio tests — dropout / rank_dropout / module_dropout.

The reference draws host-side torch.rand inside forward (base.py:183-193,
locon.py:198-219); the TPU redesign derives traced masks from an explicit rng
argument (modules/base.py:132-150) so the train step stays one jitted fn.
These tests pin the redesigned semantics:

1. module_dropout: P(delta masked) == p, and the masked branch returns the
   org output EXACTLY (reference skips the adapter entirely).
2. rank_dropout (bypass): rank rows are dropped at rate p, dropped ranks get
   exactly-zero gradients, rank_dropout_scale rescales by 1/mean(keep).
3. rank_dropout (merged/make_weight): out-dim rows of the rebuilt diff weight
   are masked — matching reference locon.py:210-217 (weight.size(0) rows).
4. dropout: elementwise zero rate ≈ p with inverted 1/(1-p) scaling.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu.modules import LayerInfo, LoConModule, LohaModule
from lycoris_tpu.modules.base import dropout as traced_dropout
from lycoris_tpu.modules.base import module_keep, rank_dropout_mask

DIM = 16
N_KEYS = 400


def _keys(n=N_KEYS, seed=123):
    return jax.random.split(jax.random.key(seed), n)


def _module(cls=LoConModule, rng_seed=3, **kw):
    layer = LayerInfo.linear(DIM, DIM)
    w = jax.random.normal(jax.random.key(1), (DIM, DIM))
    mod = cls("t", layer, 1.0, lora_dim=4, alpha=4.0,
              rng=jax.random.key(rng_seed), org_weight=w, **kw)
    # noise the zero-init up factor so the adapter delta is nonzero
    for k in list(mod.params):
        if k in mod.trainable:
            mod.params[k] = jax.random.normal(
                jax.random.fold_in(jax.random.key(9), hash(k) % 2**31),
                mod.params[k].shape, mod.params[k].dtype,
            )
    return mod, w


# -- module_dropout ---------------------------------------------------------


@pytest.mark.parametrize("cls", [LoConModule, LohaModule])
def test_module_dropout_rate_and_exactness(cls):
    p = 0.3
    mod, w = _module(cls, module_dropout=p)
    x = jax.random.normal(jax.random.key(5), (2, DIM))

    # compute both branches INSIDE the same program: the masked branch must
    # equal the org output bit-for-bit (base + (full-base)*0), and eager vs
    # jitted recomputation would differ by fusion noise
    @jax.jit
    def fwd(r):
        out = mod.forward(x, w, params=None, train=True, rng=r)
        base = mod.op(x, w)
        full = mod.forward(x, w, params=None, train=False)
        return out, base, full

    outs, bases, fulls = jax.vmap(fwd)(_keys())
    dropped = jnp.all(outs == bases, axis=(1, 2))
    kept = jnp.all(jnp.isclose(outs, fulls, atol=1e-6), axis=(1, 2))
    rate = float(jnp.mean(dropped.astype(jnp.float32)))
    # every draw must be exactly one of the two branches (reference
    # base.py:183-193 either skips the adapter or runs it — no in-between)
    assert bool(jnp.all(dropped | kept))
    assert abs(rate - p) < 0.08, f"module_dropout rate {rate} vs p={p}"
    assert 0.0 < rate < 1.0  # both branches actually exercised


def test_module_keep_matches_mix():
    """The keep flag the mix uses is the documented one (fold_in 0x6D6F64)."""
    p = 0.5
    mod, w = _module(module_dropout=p)
    x = jax.random.normal(jax.random.key(5), (2, DIM))
    base = mod.op(x, w)
    for key in _keys(16, seed=77):
        keep = float(module_keep(jax.random.fold_in(key, 0x6D6F64), p))
        out = mod.forward(x, w, params=None, train=True, rng=key)
        if keep == 0.0:
            np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
        else:
            assert not np.allclose(np.asarray(out), np.asarray(base))


# -- rank_dropout -----------------------------------------------------------


def test_rank_dropout_bypass_rate_and_grad_mask():
    p = 0.5
    mod, w = _module(rank_dropout=p, bypass_mode=True)
    x = jax.random.normal(jax.random.key(5), (8, DIM))

    def diff_sum(params, key):
        return jnp.sum(
            mod.bypass_forward_diff(x, params=params, train=True, rng=key) ** 2
        )

    grad_fn = jax.jit(jax.grad(diff_sum))
    rates = []
    for key in _keys(64, seed=11):
        mask = rank_dropout_mask(
            jax.random.fold_in(key, 0x72616E6B), mod.lora_dim, p, False
        )
        g = grad_fn(dict(mod.params), key)["lora_up.weight"]  # (out, rank)
        col_zero = np.asarray(jnp.all(g == 0, axis=0))
        np.testing.assert_array_equal(col_zero, np.asarray(mask) == 0)
        rates.append(1 - float(jnp.mean(mask)))
    assert abs(np.mean(rates) - p) < 0.1


def test_rank_dropout_merged_masks_outdim_rows():
    """Merged path masks weight.shape[0] rows (reference locon.py:210-217)."""
    p = 0.5
    mod, w = _module(rank_dropout=p)
    key = jax.random.key(21)
    mask = rank_dropout_mask(jax.random.fold_in(key, 0x72616E6B), DIM, p, False)
    diff, _ = mod.get_diff_weight(train=True, rng=key)
    row_zero = np.asarray(jnp.all(diff == 0, axis=1))
    np.testing.assert_array_equal(row_zero, np.asarray(mask) == 0)


def test_rank_dropout_scale():
    p = 0.5
    key = jax.random.key(33)
    plain = rank_dropout_mask(key, 64, p, scale=False)
    scaled = rank_dropout_mask(key, 64, p, scale=True)
    keep_frac = float(jnp.mean(plain))
    np.testing.assert_allclose(
        np.asarray(scaled), np.asarray(plain) / keep_frac, rtol=1e-6
    )


# -- elementwise dropout ----------------------------------------------------


def test_dropout_rate_and_inverted_scaling():
    p = 0.25
    x = jnp.ones((64, 64))
    outs = jax.vmap(lambda k: traced_dropout(k, x, p))(_keys(64, seed=55))
    zero_rate = float(jnp.mean((outs == 0).astype(jnp.float32)))
    assert abs(zero_rate - p) < 0.02
    # survivors carry the 1/(1-p) inverted scale → expectation preserved
    nz = outs[outs != 0]
    np.testing.assert_allclose(np.asarray(nz), 1.0 / (1 - p), rtol=1e-6)
    assert abs(float(jnp.mean(outs)) - 1.0) < 0.02


def test_dropout_applied_in_bypass_train_only():
    p = 0.9
    mod, w = _module(dropout=p, bypass_mode=True)
    x = jax.random.normal(jax.random.key(5), (4, DIM))
    eval_out = mod.bypass_forward_diff(x, train=False)
    assert float(jnp.mean((eval_out == 0).astype(jnp.float32))) < 0.1
    train_out = mod.bypass_forward_diff(x, train=True, rng=jax.random.key(6))
    assert float(jnp.mean((train_out == 0).astype(jnp.float32))) > 0.5
