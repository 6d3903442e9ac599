"""QLyCORIS: int8 quantized base + forced bypass adapters."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
from lycoris_tpu.utils.quant import Int8Linear, quantize_int8, dequantize_int8


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


def test_int8_roundtrip():
    w = jax.random.normal(jax.random.key(0), (64, 32))
    q, scale = quantize_int8(w)
    back = dequantize_int8(q, scale, jnp.float32)
    assert float(jnp.max(jnp.abs(back - w))) < float(jnp.max(jnp.abs(w))) / 100


class QNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = Int8Linear(64, name="fc1")(x)
        return Int8Linear(32, name="fc2", use_bias=False)(h)


def test_quant_layers_force_bypass(rng):
    model = QNet()
    x = jnp.ones((2, 32), jnp.bfloat16)
    variables = model.init(rng, x)
    graph = ModelGraph.from_linen(model, variables, x)
    net = create_lycoris(graph, 1.0, linear_dim=4, linear_alpha=1.0, algo="lokr", rng=rng)
    assert len(net.loras) == 2
    assert all(l.bypass_mode for l in net.loras)

    base = model.apply(variables, x)
    out0 = net(variables, x)
    np.testing.assert_allclose(np.asarray(out0, np.float32), np.asarray(base, np.float32),
                               rtol=1e-2, atol=1e-2)

    # noised adapters change the output through the bypass path
    tree = net.params_tree()
    for ln, p in tree.items():
        for k in list(p):
            if k in net.lora_map[ln].trainable:
                p[k] = p[k] + 0.05
    out1 = net(variables, x, adapter_params=tree)
    assert float(jnp.max(jnp.abs(out1.astype(jnp.float32) - base.astype(jnp.float32)))) > 1e-3


def test_full_algo_rejects_quant(rng):
    model = QNet()
    x = jnp.ones((2, 32), jnp.bfloat16)
    variables = model.init(rng, x)
    graph = ModelGraph.from_linen(model, variables, x)
    with pytest.raises(ValueError, match="Quant"):
        create_lycoris(graph, 1.0, linear_dim=4, linear_alpha=1.0, algo="full", rng=rng)
