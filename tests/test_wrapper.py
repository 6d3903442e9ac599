"""Wrapper (L2) tests — mirrors reference test/wrapper.py.

Gates:
1. full lifecycle on a 6-layer flax TestNetwork
   (conv3d→groupnorm→conv2d→conv1d→layernorm→linear, reference
   test/wrapper.py:37-57): apply → no-op at init → noised params change the
   output → merge_to parity → save/load round trip →
   create_lycoris_from_weights autodetection.
2. multi-adapter stacking: deltas additive (test/wrapper.py:233-287).
3. targeting parity vs the PyTorch reference: same torch fixture, same
   preset → identical lora_name sets and state-dict shapes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from lycoris_tpu import (
    LycorisNetwork,
    ModelGraph,
    create_lycoris,
    create_lycoris_from_weights,
)
from lycoris_tpu.models import layers as L


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


class TestNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        # x: (B, 4, 4, 8, 8) channels-first 3D
        h = L.Conv3d(4, kernel_size=(1, 3, 3), padding=(0, 1, 1), name="conv3d")(x)
        h = L.GroupNorm(2, 4, name="gnorm")(h)
        h = h[:, :, 0]  # (B, 4, 8, 8)
        h = L.Conv2d(4, kernel_size=3, padding=1, name="conv2d")(h)
        h = h.reshape(h.shape[0], 4, -1)
        h = L.Conv1d(4, kernel_size=3, padding=1, name="conv1d")(h)
        h = h.reshape(h.shape[0], -1)
        h = L.LayerNorm(256, name="lnorm")(h)
        return L.Linear(16, name="linear")(h)


ALGOS = ["lora", "loha", "lokr", "full", "ia3", "glora", "dylora", "diag-oft", "boft"]


def _build():
    model = TestNet()
    x = jnp.ones((2, 4, 4, 8, 8))
    variables = model.init(jax.random.key(0), x)
    graph = ModelGraph.from_linen(model, variables, x)
    return model, variables, x, graph


@pytest.mark.parametrize("algo", ALGOS)
def test_lifecycle(algo, rng):
    model, variables, x, graph = _build()
    net = create_lycoris(
        graph, 1.0, linear_dim=4, linear_alpha=1.0, algo=algo, train_norm=True, rng=rng
    )
    assert len(net.loras) >= 4, f"{algo}: only {len(net.loras)} modules"

    base = model.apply(variables, x)
    out0 = net(variables, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), rtol=2e-5, atol=2e-5)

    # noise the trainable params; output must change and merge must agree
    tree = net.params_tree()
    key = rng
    for ln, p in tree.items():
        for k in list(p):
            if k in net.lora_map[ln].trainable:
                key, sub = jax.random.split(key)
                p[k] = p[k] + jax.random.normal(sub, p[k].shape, p[k].dtype) * 0.01

    out1 = net(variables, x, adapter_params=tree)
    assert float(jnp.max(jnp.abs(out1 - base))) > 1e-6, f"{algo}: adapters are no-ops"

    merged_params = net.merge_to(1.0, adapter_params=tree)
    out_merged = model.apply({"params": merged_params}, x)
    np.testing.assert_allclose(
        np.asarray(out_merged), np.asarray(out1), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize("algo", ["lora", "loha", "lokr"])
def test_save_load_from_weights(algo, rng, tmp_path):
    model, variables, x, graph = _build()
    net = create_lycoris(graph, 1.0, linear_dim=4, linear_alpha=1.0, algo=algo, rng=rng)
    tree = net.params_tree()
    key = rng
    for ln, p in tree.items():
        for k in list(p):
            if k in net.lora_map[ln].trainable:
                key, sub = jax.random.split(key)
                p[k] = p[k] + jax.random.normal(sub, p[k].shape, p[k].dtype) * 0.01
    net.set_params_tree(tree)

    f = str(tmp_path / "adapter.safetensors")
    net.save_weights(f, dtype=np.float32, metadata={"ss_network_module": "lycoris_tpu"})

    net2, sd = create_lycoris_from_weights(1.0, f, graph)
    assert len(net2.loras) == len([l for l in net.loras if l.custom_state_dict()])
    out1 = net(variables, x)
    out2 = net2(variables, x, model=model)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("algo", ["lora", "loha", "lokr", "ia3", "glora", "boft"])
def test_merged_forward_fast_path(algo, rng):
    """The one-matmul (W+ΔW) fast path must equal the delta-over-base path."""
    model, variables, x, graph = _build()
    net = create_lycoris(graph, 1.0, 4, 1.0, algo=algo, rng=rng)
    tree = net.params_tree()
    key = rng
    for ln, p in tree.items():
        for k in list(p):
            if k in net.lora_map[ln].trainable:
                key, sub = jax.random.split(key)
                p[k] = p[k] + jax.random.normal(sub, p[k].shape, p[k].dtype) * 0.01
    out_delta = net(variables, x, adapter_params=tree)
    out_merged = net(variables, x, adapter_params=tree, merged_forward=True)
    np.testing.assert_allclose(
        np.asarray(out_merged), np.asarray(out_delta), rtol=1e-3, atol=1e-4
    )


def test_stacking(rng):
    model, variables, x, graph = _build()
    k1, k2 = jax.random.split(rng)
    net1 = create_lycoris(graph, 1.0, 4, 1.0, algo="lora", rng=k1)
    net2 = create_lycoris(graph, 1.0, 4, 1.0, algo="loha", rng=k2)

    def noised(net, key):
        tree = net.params_tree()
        for ln, p in tree.items():
            for k in list(p):
                if k in net.lora_map[ln].trainable:
                    key, sub = jax.random.split(key)
                    p[k] = p[k] + jax.random.normal(sub, p[k].shape, p[k].dtype) * 0.01
        net.set_params_tree(tree)
        return tree

    noised(net1, k1)
    noised(net2, k2)

    base = model.apply(variables, x)
    out1 = net1(variables, x)
    out2 = net2(variables, x)

    # stacked: compose interceptors (inner-first ordering like the wrapper stack)
    with nn.intercept_methods(net1.interceptor()), nn.intercept_methods(net2.interceptor()):
        out12 = model.apply(variables, x)

    d1 = np.asarray(out1 - base)
    d2 = np.asarray(out2 - base)
    d12 = np.asarray(out12 - base)
    # delta-over-base stacking: the composed delta ≈ sum of deltas up to the
    # second-order terms introduced by the norm layers between adapted convs
    np.testing.assert_allclose(d12, d1 + d2, rtol=2e-1, atol=2e-3)
    assert np.abs(d1).max() > 1e-5 and np.abs(d2).max() > 1e-5
    assert np.abs(d12 - d1).max() > 1e-6 and np.abs(d12 - d2).max() > 1e-6


@pytest.mark.parametrize("algo", ["lora", "loha", "lokr"])
def test_multiplier_scaling(algo, rng):
    """multiplier interpolates the delta linearly (set_multiplier parity)."""
    model, variables, x, graph = _build()
    net = create_lycoris(graph, 1.0, 4, 1.0, algo=algo, rng=rng)
    tree = net.params_tree()
    key = rng
    for ln, p in tree.items():
        for k in list(p):
            if k in net.lora_map[ln].trainable:
                key, sub = jax.random.split(key)
                p[k] = p[k] + jax.random.normal(sub, p[k].shape, p[k].dtype) * 0.005
    base = model.apply(variables, x)
    d_full = np.asarray(net(variables, x, adapter_params=tree) - base)
    d_half = np.asarray(net(variables, x, adapter_params=tree, multiplier=0.5) - base)
    d_zero = np.asarray(net(variables, x, adapter_params=tree, multiplier=0.0) - base)
    np.testing.assert_allclose(d_zero, 0, atol=1e-5)
    # deltas are small → the composed map is near-linear in the multiplier
    np.testing.assert_allclose(d_half, d_full / 2, rtol=5e-2, atol=1e-4)

    net.set_multiplier(0.5)
    d_set = np.asarray(net(variables, x, adapter_params=tree) - base)
    np.testing.assert_allclose(d_set, d_half, rtol=1e-5, atol=1e-6)
    net.set_multiplier(1.0)


def test_name_algo_map(rng):
    model, variables, x, graph = _build()
    LycorisNetwork.apply_preset(
        {
            "target_module": [],
            "name_algo_map": {
                "linear": {"algo": "lokr", "factor": 4},
                "conv.*": {"algo": "lora", "dim": 8},
            },
        }
    )
    net = LycorisNetwork(graph, lora_dim=4, alpha=1.0, network_module="lora", rng=rng)
    names = {l.lora_name: type(l).__name__ for l in net.loras}
    assert names.get("lycoris_linear") == "LokrModule"
    assert names.get("lycoris_conv2d") == "LoConModule"
    assert names.get("lycoris_conv1d") == "LoConModule"
    assert names.get("lycoris_conv3d") == "LoConModule"
    assert "lycoris_lnorm" not in names
    up = net.lora_map["lycoris_conv2d"].params["lora_down.weight"]
    assert up.shape[0] == 8  # dim override


def test_exclude_name(rng):
    model, variables, x, graph = _build()
    LycorisNetwork.apply_preset({"exclude_name": ["linear"]})
    net = LycorisNetwork(graph, lora_dim=4, alpha=1.0, network_module="lora", rng=rng)
    names = {l.lora_name for l in net.loras}
    assert "lycoris_linear" not in names
    assert "lycoris_conv2d" in names


# ---------------------------------------------------------------------------
# Targeting parity vs the PyTorch reference on an identical torch fixture
# ---------------------------------------------------------------------------


def _torch_fixture():
    import torch.nn as tnn

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attn = tnn.Linear(32, 32)
            self.mlp = tnn.Sequential(tnn.Linear(32, 64), tnn.GELU(), tnn.Linear(64, 32))
            self.norm = tnn.LayerNorm(32)

    class Tiny(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = tnn.Conv2d(4, 32, 3, 1, 1)
            self.blocks = tnn.ModuleList([Block() for _ in range(2)])
            self.conv_out = tnn.Conv2d(32, 4, 3, 1, 1)

    return Tiny()


@pytest.mark.parametrize("algo", ["lora", "loha", "lokr"])
def test_targeting_parity_with_reference(algo, ref):
    import torch

    torch.manual_seed(0)
    t_model = _torch_fixture()

    from lycoris import create_lycoris as ref_create

    preset = {"target_module": ["Block"], "target_name": ["conv_in"]}
    # reference network
    from lycoris.wrapper import LycorisNetwork as RefNet

    RefNet.apply_preset(preset)
    r_net = ref_create(t_model, 1.0, linear_dim=4, linear_alpha=1.0, algo=algo, preset="full")
    r_net.apply_to()  # reference registers modules into state_dict on apply
    RefNet.apply_preset({"target_module": ["Linear", "Conv1d", "Conv2d", "Conv3d", "GroupNorm", "LayerNorm"]})
    r_keys = {k: tuple(v.shape) for k, v in r_net.state_dict().items()}
    r_net.restore()

    # ours on the same torch model — but the reference's create_lycoris call
    # above consumed the preset, so re-apply for ours
    LycorisNetwork.apply_preset(preset)
    j_net = create_lycoris(ModelGraph.from_torch(t_model), 1.0, linear_dim=4, linear_alpha=1.0, algo=algo, preset="full")
    j_keys = {k: tuple(np.asarray(v).shape) for k, v in j_net.state_dict().items()}

    assert set(j_keys) == set(r_keys), (
        f"key mismatch:\n ours-only: {sorted(set(j_keys) - set(r_keys))}\n "
        f"ref-only: {sorted(set(r_keys) - set(j_keys))}"
    )
    for k in r_keys:
        assert j_keys[k] == r_keys[k] or np.prod(j_keys[k] or (1,)) == np.prod(
            r_keys[k] or (1,)
        ), f"{k}: {j_keys[k]} vs {r_keys[k]}"
