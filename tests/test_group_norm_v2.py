"""Layout-native fused GroupNorm(+SiLU) v2 kernels (ops/group_norm_v2.py):
parity vs the jnp reference form, both directions, interpret mode on CPU.

Semantics pinned: torch F.group_norm (+ optional fused silu); grads of
(x, γ, β) match autodiff of the jnp form ≤1e-4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lycoris_tpu.ops.group_norm_v2 as gnv2
from lycoris_tpu.functional.general import group_norm as gn_jnp


@pytest.fixture(autouse=True)
def interpret():
    gnv2._INTERPRET = True
    yield
    gnv2._INTERPRET = False


@pytest.mark.parametrize("shape,groups", [
    ((2, 64, 16, 16), 32),
    ((3, 96, 32, 8), 32),  # cg=3, uneven N
    ((2, 160, 32, 32), 32),  # s=1024 -> multi-block grid (accumulation path)
])
@pytest.mark.parametrize("act", [None, "silu"])
def test_gn_v2_fwd_bwd_parity(shape, groups, act):
    n, c, h, w_ = shape
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, shape, jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(k2, (c,), jnp.float32)
    beta = 0.1 * jax.random.normal(k3, (c,), jnp.float32)
    dy = jax.random.normal(k4, shape, jnp.float32)

    def ref(x, gamma, beta):
        y = gn_jnp(x, groups, gamma, beta)
        if act == "silu":
            y = jax.nn.silu(y)
        return y

    def ours(x, gamma, beta):
        return gnv2.group_norm_act(x, groups, gamma, beta, act=act)

    y_ref = ref(x, gamma, beta)
    y = ours(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) * dy), argnums=(0, 1, 2))(x, gamma, beta)
    g = jax.grad(lambda *a: jnp.sum(ours(*a) * dy), argnums=(0, 1, 2))(x, gamma, beta)
    for got, want, name in zip(g, g_ref, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_gn_v2_bf16_and_no_affine():
    x = jax.random.normal(jax.random.key(1), (2, 64, 16, 16), jnp.bfloat16)
    y = gnv2.group_norm_act(x, 32, None, None, act="silu")
    want = jax.nn.silu(gn_jnp(x, 32).astype(jnp.float32)).astype(jnp.bfloat16)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )
    # grads flow (no affine: only dx)
    g = jax.grad(lambda x: jnp.sum(
        gnv2.group_norm_act(x, 32, None, None, act="silu").astype(jnp.float32)))(x)
    assert jnp.all(jnp.isfinite(g.astype(jnp.float32)))


def test_gn_v2_fallback_small_spatial():
    # spatial < 256 falls back to the jnp path (still correct)
    x = jax.random.normal(jax.random.key(2), (2, 64, 8, 8), jnp.float32)
    y = gnv2.group_norm_act(x, 32, None, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(gn_jnp(x, 32)), rtol=1e-5, atol=1e-5)


def test_norm_module_on_act_folded_gn():
    """GroupNorm(act='silu') layers: NormModule must produce
    act(gn_{w+dw}(x)) — act applied once on the summed pre-activation — and
    merge_to must agree with the live forward."""
    import flax.linen as nn

    from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
    from lycoris_tpu.models import layers as L

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = L.GroupNorm(4, 32, act="silu", name="gn")(x)
            h = L.Conv2d(32, kernel_size=1, name="pw")(h)
            return h

    model = Net()
    x = jax.random.normal(jax.random.key(3), (2, 32, 16, 16))
    variables = model.init(jax.random.key(0), x)
    graph = ModelGraph.from_linen(model, variables, x)
    try:
        net = create_lycoris(graph, 1.0, linear_dim=4, linear_alpha=1.0,
                             algo="lora", train_norm=True, rng=jax.random.key(1))
        names = {l.lora_name: l for l in net.loras}
        assert "lycoris_gn" in names
        assert names["lycoris_gn"].layer.act == "silu"

        base = model.apply(variables, x)
        out0 = net(variables, x)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(base), rtol=2e-5, atol=2e-5)

        tree = net.params_tree()
        tree["lycoris_gn"]["w_norm"] = tree["lycoris_gn"]["w_norm"] + 0.2
        tree["lycoris_gn"]["b_norm"] = tree["lycoris_gn"]["b_norm"] - 0.1
        out1 = net(variables, x, adapter_params=tree)
        assert float(jnp.max(jnp.abs(out1 - base))) > 1e-4

        merged = net.merge_to(1.0, adapter_params=tree)
        out_m = model.apply({"params": merged}, x)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out1), rtol=1e-4, atol=1e-5)
    finally:
        LycorisNetwork.reset_preset()
