"""Dense-dW-free merged backward (functional/merged.py): factored adapter
cotangents must equal plain autodiff through the merged weight, at f32 on
CPU (exact reordering — tolerance only for summation order).

Covers LoCon (scalar on/off) and LoKr (all four w1/w2 decomposition combos)
on linear layers, for both the plain-linear op and the head-split projection
op, plus the wrapper-level integration (interceptor train step grads with
LYCORIS_TPU_FACTORED_GRAD on vs off).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu.functional.general import linear, linear_head_split
from lycoris_tpu.functional.merged import factored_merged_apply
from lycoris_tpu.modules import LayerInfo, LoConModule, LokrModule

OUT, IN = 24, 16


def _grads(module, mult, x, ct, use_factored, apply_kind="linear"):
    w = jax.random.normal(jax.random.key(9), (OUT, IN), jnp.float32) * 0.1
    b = jax.random.normal(jax.random.key(10), (OUT,), jnp.float32) * 0.1
    theta = dict(module.params)

    if apply_kind == "linear":
        apply_fn = lambda xx, ww, bb: linear(xx, ww.astype(xx.dtype), bb)
        dx_fn = lambda g, ww: jnp.matmul(g, ww.astype(g.dtype))
        dy2d_fn = lambda g: g.reshape(-1, OUT)
    else:  # head-split: OUT = 4 heads x 6
        apply_fn = lambda xx, ww, bb: linear_head_split(
            xx, ww.astype(xx.dtype), bb, 4, 6
        )
        dx_fn = lambda g, ww: jnp.einsum(
            "...htd,hdc->...tc", g, ww.astype(g.dtype).reshape(4, 6, IN)
        )
        dy2d_fn = lambda g: jnp.moveaxis(g, -3, -2).reshape(-1, OUT)

    def loss_dense(th):
        w_m, b_m = module.get_merged_weight(w, b, params=th, multiplier=mult)
        return jnp.sum(apply_fn(x, w_m, b_m) * ct)

    def loss_fact(th):
        recon_fn, dtheta_fn = module.factored_merged_fns(mult)
        y = factored_merged_apply(
            x, w, b, th, recon_fn=recon_fn, dtheta_fn=dtheta_fn,
            apply_fn=apply_fn, dx_fn=dx_fn, dy2d_fn=dy2d_fn,
        )
        return jnp.sum(y * ct)

    fn = loss_fact if use_factored else loss_dense
    val, g = jax.value_and_grad(fn)(theta)
    return val, {k: g[k] for k in module.trainable}


def _compare(module, mult=0.7, apply_kind="linear"):
    if apply_kind == "linear":
        x = jax.random.normal(jax.random.key(1), (3, 5, IN), jnp.float32)
        ct_shape = (3, 5, OUT)
    else:
        x = jax.random.normal(jax.random.key(1), (3, 5, IN), jnp.float32)
        ct_shape = (3, 4, 5, 6)
    ct = jax.random.normal(jax.random.key(2), ct_shape, jnp.float32)

    v_d, g_d = _grads(module, mult, x, ct, False, apply_kind)
    v_f, g_f = _grads(module, mult, x, ct, True, apply_kind)
    np.testing.assert_allclose(v_d, v_f, rtol=1e-5)
    assert g_d.keys() == g_f.keys() and g_d, "no trainable grads compared"
    for k in g_d:
        np.testing.assert_allclose(
            np.asarray(g_d[k]), np.asarray(g_f[k]), rtol=2e-4, atol=1e-5,
            err_msg=f"grad mismatch for {k}",
        )


def _noise(module, rng=3):
    """Init leaves the up/zero factor at 0 — noise every trainable param so
    gradients exercise the full chain."""
    ks = jax.random.split(jax.random.key(rng), len(module.params))
    for i, k in enumerate(sorted(module.params)):
        if k in module.trainable:
            module.params[k] = module.params[k] + 0.1 * jax.random.normal(
                ks[i], module.params[k].shape, module.params[k].dtype
            )
    return module


LI = LayerInfo.linear(OUT, IN)


@pytest.mark.parametrize("use_scalar", [False, True])
@pytest.mark.parametrize("apply_kind", ["linear", "head_split"])
def test_locon_factored_grads(use_scalar, apply_kind):
    m = _noise(LoConModule("t", LI, lora_dim=4, alpha=2, use_scalar=use_scalar,
                           rng=jax.random.key(0)))
    assert m.factored_merged_fns(1.0) is not None
    _compare(m, apply_kind=apply_kind)


@pytest.mark.parametrize("lokr_pack", ["einsum", "packed", "hybrid"])
@pytest.mark.parametrize("decompose_both", [False, True])
@pytest.mark.parametrize("full_matrix", [False, True])
@pytest.mark.parametrize("apply_kind", ["linear", "head_split"])
def test_lokr_factored_grads(monkeypatch, lokr_pack, decompose_both,
                             full_matrix, apply_kind):
    # both LYCORIS_TPU_LOKR_PACK branches (merged.py lokr_dtheta: factored
    # rank-3 einsums — the measured default — vs the 2D-packed kron(W1,I_r)
    # rewrite) must match plain autodiff; the branch only dispatches when w2
    # is decomposed (full_matrix=False legs)
    monkeypatch.setenv("LYCORIS_TPU_LOKR_PACK", lokr_pack)
    # decompose_both only triggers when lora_dim < max(out_l, in_m)/2
    dim = 1 if decompose_both else 2
    m = _noise(LokrModule("t", LI, lora_dim=dim, alpha=2, factor=4,
                          decompose_both=decompose_both,
                          full_matrix=full_matrix, rng=jax.random.key(0)))
    assert m.factored_merged_fns(1.0) is not None
    _compare(m, apply_kind=apply_kind)


@pytest.mark.parametrize("decompose_both", [False, True])
@pytest.mark.parametrize("full_matrix", [False, True])
def test_lokr_dw1_batched_matches_flat(monkeypatch, decompose_both, full_matrix):
    """LYCORIS_TPU_LOKR_DW1=batched (n-batched dW1 contraction + n-sum,
    merged.py _dw1) is an exact reordering of the flat (n,k)-contracted
    einsum — factored grads must agree across all w1 decomposition combos."""
    dim = 1 if decompose_both else 2
    m = _noise(LokrModule("t", LI, lora_dim=dim, alpha=2, factor=4,
                          decompose_both=decompose_both,
                          full_matrix=full_matrix, rng=jax.random.key(0)))
    x = jax.random.normal(jax.random.key(1), (3, 5, IN), jnp.float32)
    ct = jax.random.normal(jax.random.key(2), (3, 5, OUT), jnp.float32)

    monkeypatch.setenv("LYCORIS_TPU_LOKR_DW1", "flat")
    _, g_flat = _grads(m, 0.7, x, ct, True)
    monkeypatch.setenv("LYCORIS_TPU_LOKR_DW1", "batched")
    _, g_bat = _grads(m, 0.7, x, ct, True)
    assert g_flat.keys() == g_bat.keys() and g_flat
    for k in g_flat:
        np.testing.assert_allclose(
            np.asarray(g_flat[k]), np.asarray(g_bat[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"dw1 batched/flat mismatch for {k}",
        )


def test_lokr_use_scalar_grads():
    m = _noise(LokrModule("t", LI, lora_dim=2, alpha=2, factor=4,
                          use_scalar=True, rng=jax.random.key(0)))
    _compare(m)


def test_unsupported_configs_fall_back():
    conv = LayerInfo.conv(2, OUT, IN, 3, padding=1)
    assert LoConModule("t", conv, lora_dim=4, rng=jax.random.key(0)
                       ).factored_merged_fns(1.0) is None
    assert LoConModule("t", LI, lora_dim=4, weight_decompose=True,
                       rng=jax.random.key(0)).factored_merged_fns(1.0) is None
    assert LokrModule("t", LI, lora_dim=2, factor=4, rank_dropout=0.5,
                      rng=jax.random.key(0)).factored_merged_fns(1.0) is None


def test_worth_factoring_gate(monkeypatch):
    from lycoris_tpu.functional.merged import worth_factoring

    # SD1.5-scale layers stay on the dense path, SDXL-scale go factored
    assert not worth_factoring(320, 320)
    assert not worth_factoring(2560, 320)
    assert not worth_factoring(640, 640)
    assert worth_factoring(1280, 1280)
    assert worth_factoring(10240, 1280)
    assert worth_factoring(5120, 640)
    assert worth_factoring(24, 16, threshold=0)

    # shipped default threshold is 1024 (wrapper.py LYCORIS_TPU_FACTORED_MIN):
    # the harmonic-[512,1024) tiers (square-1280, 640-tier ff) flip dense
    assert not worth_factoring(1280, 1280, threshold=1024)
    assert not worth_factoring(5120, 640, threshold=1024)
    assert worth_factoring(10240, 1280, threshold=1024)
    assert worth_factoring(1280, 5120, threshold=1024)

    # opt-in absolute-FLOPs gate (LYCORIS_TPU_FACTORED_GFLOP; default 0 =
    # disabled, measured-rejected at 25: SDXL 1.3117 vs 1.3437 for plain
    # threshold-1024): with G=25, square 1280 at T=4096 (13.4 GFLOP dense
    # dW) flips dense while the fat ff contractions (>=53 GFLOP) stay.
    assert worth_factoring(1280, 1280, n_tokens=4096)  # default: disabled
    monkeypatch.setenv("LYCORIS_TPU_FACTORED_GFLOP", "25")
    assert not worth_factoring(1280, 1280, n_tokens=4096)
    assert worth_factoring(10240, 1280, n_tokens=4096)
    assert worth_factoring(1280, 5120, n_tokens=4096)
    assert worth_factoring(5120, 640, n_tokens=16384)
    assert not worth_factoring(1280, 2048, n_tokens=308)  # cross-attn kv
    # n_tokens=None keeps the harmonic-only behavior regardless of G
    assert worth_factoring(1280, 1280, n_tokens=None)


def test_wrapper_train_grads_match(monkeypatch):
    """End-to-end: interceptor train-step grads with the factored path on
    equal the dense-autodiff grads with it off."""
    import flax.linen as nn

    from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(OUT, name="fc1")(x)
            x = nn.gelu(x)
            return nn.Dense(IN, name="fc2")(x)

    model = Tiny()
    x = jax.random.normal(jax.random.key(0), (4, IN), jnp.float32)
    variables = model.init(jax.random.key(1), x)
    graph = ModelGraph.from_linen(model, variables, x)
    LycorisNetwork.apply_preset({"target_name": [".*fc.*"]})
    net = create_lycoris(graph, 1.0, linear_dim=4, linear_alpha=2.0,
                         algo="lokr", factor=4, rng=jax.random.key(2))
    LycorisNetwork.reset_preset()
    assert len(net.loras) == 2
    trainable = net.trainable_params()
    buffers = {
        ln: {k: v for k, v in net.lora_map[ln].params.items()
             if k not in sub}
        for ln, sub in trainable.items()
    }

    monkeypatch.setenv("LYCORIS_TPU_FACTORED_MIN", "0")  # tiny test dims
    monkeypatch.setenv("LYCORIS_TPU_FACTORED_GFLOP", "0")  # r4 N-aware gate

    def loss(tree, factored):
        monkeypatch.setenv("LYCORIS_TPU_FACTORED_GRAD", "1" if factored else "0")
        full = {ln: {**buffers[ln], **sub} for ln, sub in tree.items()}
        y = net(variables, x, adapter_params=full, train=True,
                merged_forward=True, model=model)
        return jnp.sum(y * y)

    g_on = jax.grad(lambda t: loss(t, True))(trainable)
    g_off = jax.grad(lambda t: loss(t, False))(trainable)
    flat_on = jax.tree_util.tree_leaves_with_path(g_on)
    flat_off = dict(jax.tree_util.tree_leaves_with_path(g_off))
    assert flat_on, "no grads produced"
    for path, leaf in flat_on:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_off[path]), rtol=2e-4, atol=1e-5,
            err_msg=f"wrapper grad mismatch at {jax.tree_util.keystr(path)}",
        )
