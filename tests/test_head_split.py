"""Head-split projection parity (models/layers.py Linear.head_split).

The attention q/k/v projections emit (B, H, T, D) directly (transpose fused
into the matmul). Adapters must be oblivious: the graph LayerAdapter converts
at the layer boundary (out_from_cf/out_to_cf) and the merged fast path uses
native_op. Every wrapper path — merged, delta (interceptor), bypass algos —
must equal the plain Linear + reshape + transpose formulation.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lycoris_tpu.models.layers as L
from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris

H, D = 4, 8
C = H * D
B, T = 2, 16


class SplitNet(nn.Module):
    """to_q with head_split; downstream consumes (B, H, T, D)."""

    @nn.compact
    def __call__(self, x):
        q = L.Linear(C, use_bias=True, name="to_q", head_split=(H, D))(x)
        return q.transpose(0, 2, 1, 3).reshape(B, T, C)


class PlainNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        q = L.Linear(C, use_bias=True, name="to_q")(x)
        return q  # reshape->transpose->inverse == identity


def _nets(algo, **kw):
    rng = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (B, T, C))
    split, plain = SplitNet(), PlainNet()
    vs = split.init(rng, x)
    vp = plain.init(rng, x)
    # same underlying weights
    vp = jax.tree_util.tree_map(lambda a, b: b, vp, vs)
    nets = []
    for model, variables in ((split, vs), (plain, vp)):
        LycorisNetwork.reset_preset()
        LycorisNetwork.apply_preset({"target_name": [".*to_q.*"]})
        g = ModelGraph.from_linen(model, variables, x)
        net = create_lycoris(g, 1.0, linear_dim=4, linear_alpha=2.0, algo=algo,
                             rng=jax.random.key(7), **kw)
        LycorisNetwork.reset_preset()
        nets.append((model, variables, net))
    return x, nets


def _randomize(net):
    """Give the adapters nonzero params (same draw for both nets)."""
    k = jax.random.key(11)
    for lora in net.loras:
        for i, name in enumerate(sorted(lora.trainable)):
            p = lora.params[name]
            lora.params[name] = 0.02 * jax.random.normal(
                jax.random.fold_in(k, i), p.shape, p.dtype
            )


@pytest.mark.parametrize("algo", ["lora", "loha", "ia3"])
@pytest.mark.parametrize("merged", [True, False])
def test_head_split_wrapper_parity(algo, merged):
    x, nets = _nets(algo)
    outs = []
    for model, variables, net in nets:
        _randomize(net)
        y = net(variables, x, model=model, merged_forward=merged)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)


def test_head_split_merge_to_parity():
    x, nets = _nets("lokr", factor=4)
    outs = []
    for model, variables, net in nets:
        _randomize(net)
        merged = net.merge_to(1.0)
        y = model.apply({"params": merged}, x)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)


def test_head_split_layer_matches_plain():
    x = jax.random.normal(jax.random.key(2), (B, T, C))
    lin = L.Linear(C, use_bias=True, head_split=(H, D))
    v = lin.init(jax.random.key(3), x)
    y = lin.apply(v, x)
    assert y.shape == (B, H, T, D)
    w = v["params"]["weight"]
    b = v["params"]["bias"]
    ref = (x @ w.T + b).reshape(B, T, H, D).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5)
