"""DoRA (weight-decompose) and DyLoRA file-compat coverage.

Reference parity targets:
- DoRA: ``dora_wd=True`` adds a trainable ``dora_scale`` (row/col norms of the
  org weight, locon.py:107-129), forward applies the norm-rescale
  (locon.py:239-260), and saved files round-trip with the scale restored.
- DyLoRA: ``custom_state_dict`` concatenates blocks into standard
  ``lora_up/lora_down`` keys and the saved file is DETECTED AS LoCon
  (dylora.py:84-95; DyLoRA declares no weight_list).
"""

import os
import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris, create_lycoris_from_weights
from lycoris_tpu.models import layers as L
from lycoris_tpu.modules.locon import LoConModule


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = L.Linear(48, name="fc1")(x)
        h = jax.nn.silu(h)
        h = L.Conv2d(16, (3, 3), padding=1, name="conv")(
            h.reshape(h.shape[0], 3, 4, 4)
        )
        return h.reshape(h.shape[0], -1)


def _setup(rng, algo, **kw):
    model = Net()
    x = jax.random.normal(rng, (2, 24))
    variables = model.init(jax.random.key(0), x)
    graph = ModelGraph.from_linen(model, variables, x)
    net = create_lycoris(graph, 1.0, 4, 4.0, algo=algo, rng=rng, **kw)
    key = rng
    for lora in net.loras:
        for k in sorted(lora.trainable):
            key, sub = jax.random.split(key)
            lora.params[k] = lora.params[k] + jax.random.normal(
                sub, lora.params[k].shape, lora.params[k].dtype
            ) * 0.03
    return model, variables, x, graph, net


@pytest.mark.parametrize("algo", ["lora", "loha", "lokr"])
def test_dora_forward_merge_roundtrip(algo, rng):
    model, variables, x, graph, net = _setup(rng, algo, dora_wd=True)
    assert all(getattr(l, "wd", False) for l in net.loras)
    sd = net.state_dict()
    scale_keys = [k for k in sd if k.endswith(".dora_scale")]
    assert len(scale_keys) == len(net.loras)

    base_out = model.apply(variables, x)
    adapted = net(variables, x, model=model)
    assert not np.allclose(np.asarray(adapted), np.asarray(base_out), atol=1e-5)

    # merged weights reproduce the decomposed forward
    merged = net.merge_to(1.0)
    merged_out = model.apply({"params": merged}, x)
    np.testing.assert_allclose(
        np.asarray(merged_out), np.asarray(adapted), rtol=2e-4, atol=2e-5
    )

    # file round-trip restores weight_decompose mode and the exact forward
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "dora.safetensors")
        net.save_weights(path)
        net2, _ = create_lycoris_from_weights(1.0, path, graph)
        assert all(getattr(l, "wd", False) for l in net2.loras)
        out2 = net2(variables, x, model=model)
        np.testing.assert_allclose(
            np.asarray(out2), np.asarray(adapted), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize("algo", ["lora", "loha"])
def test_dora_on_input_roundtrip(algo, rng):
    """wd_on_output=False stores a (1, in_dim) scale; load must re-infer the
    flag from the stored shape (reference crashes here: it copies into the
    default on-out buffer, locon.py make_module_from_state_dict)."""
    model, variables, x, graph, net = _setup(rng, algo, dora_wd=True, wd_on_output=False)
    assert all(not l.wd_on_out for l in net.loras)
    adapted = net(variables, x, model=model)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "dora_in.safetensors")
        net.save_weights(path)
        net2, _ = create_lycoris_from_weights(1.0, path, graph)
        assert all(l.wd and not l.wd_on_out for l in net2.loras)
        out2 = net2(variables, x, model=model)
        np.testing.assert_allclose(
            np.asarray(out2), np.asarray(adapted), rtol=1e-5, atol=1e-6
        )


def test_dora_merged_forward_interceptor(rng):
    """merged_forward=True (one-matmul fast path) must match the delta path
    under DoRA too — the rescale acts on W+ΔW, not on the delta alone."""
    model, variables, x, _, net = _setup(rng, "lora", dora_wd=True)
    ref = net(variables, x, model=model, merged_forward=False)
    fast = net(variables, x, model=model, merged_forward=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_dylora_file_loads_as_locon(rng):
    model, variables, x, graph, net = _setup(rng, "dylora", block_size=2)
    sd = net.state_dict()
    # saved grammar is plain LoCon: lora_up/lora_down/alpha, no dylora markers
    suffixes = {k.split(".", 1)[1] for k in sd}
    assert suffixes == {"alpha", "lora_up.weight", "lora_down.weight"}

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "dylora.safetensors")
        net.save_weights(path)
        net2, _ = create_lycoris_from_weights(1.0, path, graph)
        assert all(isinstance(l, LoConModule) for l in net2.loras)
        # LoCon semantics on the concatenated factors: ΔW = (α/r)·up@down
        for lora in net2.loras:
            src = net.lora_map[lora.lora_name]
            up = np.asarray(src.params["lora_up.weight"])
            down = np.asarray(src.params["lora_down.weight"]).reshape(up.shape[1], -1)
            expect = (4.0 / 4) * (up @ down)
            got = np.asarray(lora.get_diff_weight()[0]).reshape(expect.shape)
            np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
        out2 = net2(variables, x, model=model)
        assert np.isfinite(np.asarray(out2)).all()
