"""Analogs of reference test/compile.py and test/restore.py:
- jit vs eager parity of the adapted forward (torch.compile analog);
- quantized base + lokr bypass under jit (test/compile.py:27-65);
- onfly_merge / onfly_restore round trip (base.py:344-374 semantics)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
from lycoris_tpu.models import layers as L
from lycoris_tpu.utils.quant import Int8Linear


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = L.Linear(64, name="fc1")(x)
        h = jax.nn.silu(h)
        return L.Linear(32, name="fc2")(h)


def _noised_net(graph, algo, rng, **kw):
    net = create_lycoris(graph, 1.0, 4, 1.0, algo=algo, rng=rng, **kw)
    key = rng
    for lora in net.loras:
        for k in list(lora.params):
            if k in lora.trainable:
                key, sub = jax.random.split(key)
                lora.params[k] = lora.params[k] + jax.random.normal(sub, lora.params[k].shape) * 0.02
    return net


@pytest.mark.parametrize("algo", ["lokr", "loha"])
def test_jit_matches_eager(algo, rng):
    model = Net()
    x = jax.random.normal(rng, (4, 32))
    variables = model.init(jax.random.key(0), x)
    graph = ModelGraph.from_linen(model, variables, x)
    net = _noised_net(graph, algo, rng)
    tree = net.params_tree()

    eager = net(variables, x, adapter_params=tree)
    jitted = jax.jit(
        lambda v, xx, ap: net(v, xx, adapter_params=ap, model=model)
    )(variables, x, tree)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager), rtol=1e-5, atol=1e-6)


def test_quant_bypass_under_jit(rng):
    """reference test/compile.py: int8 base + lokr bypass, compiled ≈ eager."""

    class QNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = Int8Linear(64, name="fc1")(x)
            return Int8Linear(32, name="fc2")(h)

    model = QNet()
    x = jax.random.normal(rng, (4, 32), jnp.bfloat16)
    variables = model.init(jax.random.key(0), x)
    graph = ModelGraph.from_linen(model, variables, x)
    net = _noised_net(graph, "lokr", rng, factor=4)
    assert all(l.bypass_mode for l in net.loras)
    tree = net.params_tree()
    eager = net(variables, x, adapter_params=tree)
    jitted = jax.jit(lambda v, xx, ap: net(v, xx, adapter_params=ap, model=model))(
        variables, x, tree
    )
    np.testing.assert_allclose(
        np.asarray(jitted, np.float32), np.asarray(eager, np.float32), rtol=1e-2, atol=1e-2
    )


def test_onfly_merge_restore(rng):
    model = Net()
    x = jax.random.normal(rng, (4, 32))
    variables = model.init(jax.random.key(0), x)
    graph = ModelGraph.from_linen(model, variables, x)
    net = _noised_net(graph, "lokr", rng)

    base_out = model.apply(variables, x)
    adapted = net(variables, x)

    merged_params = net.onfly_merge(1.0)
    merged_out = model.apply({"params": merged_params}, x)
    np.testing.assert_allclose(np.asarray(merged_out), np.asarray(adapted), rtol=1e-4, atol=1e-5)

    restored = net.onfly_restore()
    restored_out = model.apply({"params": restored}, x)
    np.testing.assert_allclose(np.asarray(restored_out), np.asarray(base_out), rtol=1e-6)
