"""Module layer (L1) tests — mirrors reference test/module.py grid.

Gates:
1. zero-init no-op: at init every algo's forward == org forward.
2. bypass vs rebuild equivalence on noised params (the fused-path numerics
   gate, reference test/functional.py analog at module level).
3. state-dict round trip through get_module/make_module autodetection.
4. gradients flow to trainable params.
5. cross-framework goldens: merged weight matches the PyTorch reference
   module bit-for-bit-ish on identical params (BASELINE max|Δ| ≤ 1e-3 gate,
   tested at 1e-5).
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu.modules import (
    LayerInfo,
    LoConModule,
    LohaModule,
    LokrModule,
    IA3Module,
    FullModule,
    NormModule,
    DiagOFTModule,
    ButterflyOFTModule,
    GLoRAModule,
    DyLoraModule,
    get_module,
    make_module,
)

DIM = 16

LAYERS = {
    "linear": (LayerInfo.linear(DIM, DIM), (2, DIM)),
    "conv1d": (LayerInfo.conv(1, DIM, DIM, 3, padding=1), (2, DIM, 8)),
    "conv2d": (LayerInfo.conv(2, DIM, DIM, 3, padding=1), (2, DIM, 8, 8)),
    "conv3d": (LayerInfo.conv(3, DIM, DIM, 3, padding=1), (2, DIM, 4, 4, 4)),
}

ALGOS = {
    "locon": LoConModule,
    "loha": LohaModule,
    "lokr": LokrModule,
    "ia3": IA3Module,
    "full": FullModule,
    "diag_oft": DiagOFTModule,
    "boft": ButterflyOFTModule,
    "glora": GLoRAModule,
    "dylora": DyLoraModule,
}


def _make(algo, layer_info, w, **kw):
    cls = ALGOS[algo]
    return cls("test", layer_info, 1.0, lora_dim=4, alpha=1.0,
               rng=jax.random.key(42), org_weight=w, **kw)


def _noise(mod, key, scale=0.01):
    out = dict(mod.params)
    for k, v in out.items():
        if k in mod.trainable or k in ("lokr_w2", "lora_up.weight", "hada_w2_a", "weight", "diff"):
            key, sub = jax.random.split(key)
            out[k] = v + jax.random.normal(sub, v.shape, v.dtype) * scale
    return out


@pytest.mark.parametrize("layer", list(LAYERS))
@pytest.mark.parametrize("algo", list(ALGOS))
def test_zero_init_noop(algo, layer, rng):
    layer_info, x_shape = LAYERS[layer]
    k1, k2 = jax.random.split(rng)
    w = jax.random.normal(k1, layer_info.shape)
    x = jax.random.normal(k2, x_shape)
    mod = _make(algo, layer_info, w)
    base = layer_info.op(x, w)
    out = mod.forward(x, org_weight=w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("layer", ["linear", "conv2d"])
@pytest.mark.parametrize("algo", ["locon", "loha", "lokr", "ia3", "glora", "diag_oft", "boft"])
def test_bypass_vs_rebuild(algo, layer, rng):
    layer_info, x_shape = LAYERS[layer]
    k1, k2, k3 = jax.random.split(rng, 3)
    w = jax.random.normal(k1, layer_info.shape)
    x = jax.random.normal(k2, x_shape)
    mod = _make(algo, layer_info, w)
    params = _noise(mod, k3)
    rebuilt = mod.forward(x, org_weight=w, params=params)
    org_forward = lambda z: layer_info.op(z, w)
    bypassed = mod.bypass_forward(x, params=params, scale=1.0, org_forward=org_forward)
    mse = float(jnp.mean((rebuilt - bypassed) ** 2))
    assert mse < 5e-6, f"{algo}/{layer} bypass mse={mse}"


@pytest.mark.parametrize("layer", ["linear", "conv2d"])
@pytest.mark.parametrize(
    "algo", ["locon", "loha", "lokr", "ia3", "full", "glora", "diag_oft", "boft"]
)
def test_state_dict_roundtrip(algo, layer, rng):
    layer_info, x_shape = LAYERS[layer]
    k1, k2, k3 = jax.random.split(rng, 3)
    w = jax.random.normal(k1, layer_info.shape)
    x = jax.random.normal(k2, x_shape)
    mod = _make(algo, layer_info, w)
    params = _noise(mod, k3)
    sd = {f"test.{k}": np.asarray(v) for k, v in mod.custom_state_dict(params).items()}

    cls, extracted = get_module(sd, "test")
    assert cls is ALGOS[algo] or (algo == "ia3" and cls is not None), f"detected {cls}"
    mod2 = make_module(cls, extracted, "test", layer_info)
    assert mod2 is not None

    m1 = mod.get_merged_weight(w, params=params)[0]
    m2 = mod2.get_merged_weight(w)[0]
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("algo", list(ALGOS))
def test_grad_flows(algo, rng):
    layer_info, x_shape = LAYERS["linear"]
    k1, k2, k3 = jax.random.split(rng, 3)
    w = jax.random.normal(k1, layer_info.shape)
    x = jax.random.normal(k2, x_shape)
    mod = _make(algo, layer_info, w)
    params = _noise(mod, k3)

    def loss(p):
        full = dict(params)
        full.update(p)
        return jnp.sum(mod.forward(x, org_weight=w, params=full, train=True, rng=k3) ** 2)

    train_p = {k: params[k] for k in mod.trainable}
    grads = jax.grad(loss)(train_p)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in flat)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0, f"{algo}: no gradient signal"


def test_norm_module(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    for li, x_shape in [
        (LayerInfo.layer_norm(DIM), (2, DIM)),
        (LayerInfo.group_norm(4, DIM), (2, DIM, 8, 8)),
        (LayerInfo.rms_norm(DIM, bias=True), (2, DIM)),
    ]:
        w = jnp.ones(li.shape)
        b = jnp.zeros((li.dim,))
        x = jax.random.normal(k2, x_shape)
        mod = NormModule("test", li, 1.0, rng=k1)
        base = li.op(x, w, b)
        out = mod.forward(x, org_weight=w, org_bias=b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=1e-5, atol=1e-5)
        # noised
        params = dict(mod.params)
        params["w_norm"] = params["w_norm"] + 0.1
        out2 = mod.forward(x, org_weight=w, org_bias=b, params=params)
        merged_w, merged_b = mod.get_merged_weight(w, b, params=params)
        expect = li.op(x, merged_w, merged_b)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(expect), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# tucker / use_scalar axes (reference test/module.py sweeps wd×tucker×scalar)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("algo", ["locon", "loha", "lokr"])
def test_tucker_conv(algo, rng):
    layer_info, x_shape = LAYERS["conv2d"]
    k1, k2, k3 = jax.random.split(rng, 3)
    w = jax.random.normal(k1, layer_info.shape)
    x = jax.random.normal(k2, x_shape)
    if algo == "lokr":
        # rank must stay below max(b,d)/2=2 or w2 is forced full (no tucker),
        # mirroring the reference's forced-full branch (lokr.py:114-136)
        mod = ALGOS[algo]("test", layer_info, 1.0, lora_dim=1, alpha=1.0,
                          rng=jax.random.key(42), org_weight=w, use_tucker=True)
    else:
        mod = _make(algo, layer_info, w, use_tucker=True)
    assert mod.tucker

    # zero-init no-op
    out = mod.forward(x, org_weight=w)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(layer_info.op(x, w)), rtol=1e-5, atol=1e-5
    )

    # noised: bypass == rebuild, and state-dict round trip preserves tucker
    params = _noise_tucker(mod, k3)
    rebuilt = mod.forward(x, org_weight=w, params=params)
    bypassed = mod.bypass_forward(
        x, params=params, scale=1.0, org_forward=lambda z: layer_info.op(z, w)
    )
    assert float(jnp.mean((rebuilt - bypassed) ** 2)) < 5e-6

    sd = {f"test.{k}": np.asarray(v) for k, v in mod.custom_state_dict(params).items()}
    cls, extracted = get_module(sd, "test")
    mod2 = make_module(cls, extracted, "test", layer_info)
    assert mod2.tucker
    m1 = mod.get_merged_weight(w, params=params)[0]
    m2 = mod2.get_merged_weight(w)[0]
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-4, atol=1e-5)


def _noise_tucker(mod, key, scale=0.01):
    out = dict(mod.params)
    for k, v in out.items():
        if jnp.issubdtype(v.dtype, jnp.floating) and k != "alpha":
            key, sub = jax.random.split(key)
            out[k] = v + jax.random.normal(sub, v.shape, v.dtype) * scale
    return out


def test_locon_use_scalar(rng):
    """use_scalar: kaiming up + trainable 0-init scalar; custom_state_dict
    folds the scalar into lora_up.weight (locon.py:150-161, 262-271)."""
    layer_info, x_shape = LAYERS["linear"]
    k1, k2 = jax.random.split(rng)
    w = jax.random.normal(k1, layer_info.shape)
    x = jax.random.normal(k2, x_shape)
    mod = _make("locon", layer_info, w, use_scalar=True)
    assert "scalar" in mod.trainable
    assert float(mod.params["scalar"]) == 0.0
    assert float(jnp.abs(mod.params["lora_up.weight"]).sum()) > 0  # kaiming, not zeros

    # scalar=0 → still a no-op at init
    out = mod.forward(x, org_weight=w)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(layer_info.op(x, w)), rtol=1e-5, atol=1e-5
    )

    params = dict(mod.params)
    params["scalar"] = jnp.asarray(0.7)
    sd = {f"test.{k}": np.asarray(v) for k, v in mod.custom_state_dict(params).items()}
    assert "test.scalar" not in sd  # folded away
    cls, extracted = get_module(sd, "test")
    mod2 = make_module(cls, extracted, "test", layer_info)
    m1 = mod.get_merged_weight(w, params=params)[0]
    m2 = mod2.get_merged_weight(w)[0]
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# bf16 dtype grid (reference test/module.py runs cpu/cuda × fp32/fp16/bf16)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("algo", ["locon", "loha", "lokr", "diag_oft", "boft"])
def test_bf16_module(algo, rng):
    layer_info, x_shape = LAYERS["linear"]
    k1, k2, k3 = jax.random.split(rng, 3)
    w = jax.random.normal(k1, layer_info.shape, jnp.bfloat16)
    x = jax.random.normal(k2, x_shape, jnp.bfloat16)
    cls = ALGOS[algo]
    mod = cls("test", layer_info, 1.0, lora_dim=4, alpha=1.0,
              rng=jax.random.key(42), org_weight=w, dtype=jnp.bfloat16)
    base = layer_info.op(x, w)
    out = mod.forward(x, org_weight=w)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(base, np.float32), rtol=2e-2, atol=2e-2
    )
    params = _noise(mod, k3)
    grads = jax.grad(
        lambda p: jnp.sum(
            mod.forward(x, org_weight=w, params={**dict(mod.params), **p}).astype(jnp.float32) ** 2
        )
    )({k: params[k] for k in mod.trainable})
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads))


# ---------------------------------------------------------------------------
# Cross-framework goldens (merged weight vs PyTorch reference modules)
# ---------------------------------------------------------------------------

TORCH_LAYER = {
    "linear": lambda torch: torch.nn.Linear(DIM, DIM),
    "conv2d": lambda torch: torch.nn.Conv2d(DIM, DIM, 3, 1, 1),
}
REF_ALGO = {
    "locon": ("lycoris.modules.locon", "LoConModule"),
    "loha": ("lycoris.modules.loha", "LohaModule"),
    "lokr": ("lycoris.modules.lokr", "LokrModule"),
    "diag_oft": ("lycoris.modules.diag_oft", "DiagOFTModule"),
    "boft": ("lycoris.modules.boft", "ButterflyOFTModule"),
}


@pytest.mark.parametrize("algo", ["locon", "loha", "lokr"])
def test_tucker_merged_weight_matches_reference(algo, ref):
    """Tucker-mode goldens: reference conv module with use_tucker=True, its
    state dict loaded by our detector, merged weights must agree. (The
    reference's own loader mis-infers rank on tucker LoKr files — we load its
    SAVED format correctly, which is the direction real files flow.)"""
    import importlib
    import torch

    torch.manual_seed(0)
    t_layer = TORCH_LAYER["conv2d"](torch)
    mod_path, cls_name = REF_ALGO[algo]
    r_cls = getattr(importlib.import_module(mod_path), cls_name)
    alpha = 4.0 if algo in ("loha", "lokr") else 1.0
    # lokr: rank must stay under max(b,d)/2 or w2 goes full and tucker is moot
    dim = 1 if algo == "lokr" else 4
    alpha = 1.0 if algo == "lokr" else alpha
    r_mod = r_cls("test", t_layer, 1.0, lora_dim=dim, alpha=alpha, use_tucker=True)
    with torch.no_grad():
        for p in r_mod.parameters():
            p.add_(torch.randn_like(p) * 0.01)

    li = LayerInfo.conv(2, DIM, DIM, 3, padding=1)
    w = jnp.asarray(t_layer.weight.detach().numpy())
    sd = {f"test.{k}": v.detach().numpy() for k, v in r_mod.state_dict().items()}
    assert any("t1" in k or "t2" in k or "mid" in k for k in sd), sd.keys()
    cls, extracted = get_module(sd, "test")
    j_mod = make_module(cls, extracted, "test", li)
    assert j_mod.tucker

    r_merged = (
        r_mod.get_merged_weight(multiplier=1.0, shape=t_layer.weight.shape)[0]
        .detach()
        .numpy()
    )
    j_merged = np.asarray(j_mod.get_merged_weight(w)[0])
    assert np.max(np.abs(j_merged - r_merged)) <= 1e-3  # BASELINE gate
    np.testing.assert_allclose(j_merged, r_merged, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("layer", ["linear", "conv2d"])
@pytest.mark.parametrize("algo", ["locon", "loha", "lokr", "diag_oft", "boft"])
def test_merged_weight_matches_reference(algo, layer, ref):
    import importlib
    import torch

    torch.manual_seed(0)
    t_layer = TORCH_LAYER[layer](torch)
    mod_path, cls_name = REF_ALGO[algo]
    r_cls = getattr(importlib.import_module(mod_path), cls_name)
    # loha/lokr: use alpha=rank so the reference's merge double-scale quirk
    # (loha.py:228-233, fixed in ours per SURVEY §7) is invisible and both
    # frameworks compute the same merged weight
    alpha = 4.0 if algo in ("loha", "lokr") else 1.0
    r_mod = r_cls("test", t_layer, 1.0, lora_dim=4, alpha=alpha)

    # noise every param, push through both frameworks
    with torch.no_grad():
        for p in r_mod.parameters():
            p.add_(torch.randn_like(p) * 0.01)

    if layer == "linear":
        li = LayerInfo.linear(DIM, DIM)
    else:
        li = LayerInfo.conv(2, DIM, DIM, 3, padding=1)
    w = jnp.asarray(t_layer.weight.detach().numpy())

    sd = {f"test.{k}": v.detach().numpy() for k, v in r_mod.state_dict().items()}
    cls, extracted = get_module(sd, "test")
    j_mod = make_module(cls, extracted, "test", li)
    assert j_mod is not None

    # NOTE: reference get_merged_weight crashes for conv LoHa unless shape is
    # passed explicitly (merge_to always passes it, base.py:326-342)
    r_merged = (
        r_mod.get_merged_weight(multiplier=1.0, shape=t_layer.weight.shape)[0]
        .detach()
        .numpy()
    )
    j_merged = np.asarray(j_mod.get_merged_weight(w)[0])
    assert np.max(np.abs(j_merged - r_merged)) <= 1e-3  # BASELINE gate
    np.testing.assert_allclose(j_merged, r_merged, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("layer", ["linear", "conv2d"])
@pytest.mark.parametrize("algo", ["locon", "loha", "lokr", "ia3", "glora", "diag_oft", "boft"])
def test_bypass_bf16_activations(algo, layer, rng):
    """Bypass path with bf16 activations over f32 adapter params — the
    in-train configuration (weight_dtype=bf16, adapters f32). lax.conv
    rejects mixed operand dtypes, so every bypass op must cast its factors
    to the activation dtype (r4 LoKr-conv bypass bench crash)."""
    layer_info, x_shape = LAYERS[layer]
    k1, k2, k3 = jax.random.split(rng, 3)
    w = jax.random.normal(k1, layer_info.shape, jnp.bfloat16)
    x = jax.random.normal(k2, x_shape, jnp.bfloat16)
    mod = _make(algo, layer_info, w)
    params = _noise(mod, k3)
    org_forward = lambda z: layer_info.op(z, w)
    bypassed = mod.bypass_forward(x, params=params, scale=1.0, org_forward=org_forward)
    assert bypassed.dtype == jnp.bfloat16
    rebuilt = mod.forward(x, org_weight=w, params=params)
    mse = float(jnp.mean((rebuilt.astype(jnp.float32) - bypassed.astype(jnp.float32)) ** 2))
    assert mse < 5e-2, f"{algo}/{layer} bf16 bypass mse={mse}"
