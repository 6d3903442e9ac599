"""SDXL-topology UNet path: depth-0 down block (no attention), deeper mid,
added-cond embedding — on a tiny config."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
from lycoris_tpu.models.unet import UNet2DConditionModel, UNetConfig


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


def _sdxl_tiny():
    return UNetConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        transformer_depth=(0, 2),   # SDXL signature: first block has no attn
        mid_transformer_depth=2,
        context_dim=32,
        num_heads=2,
        norm_groups=8,
        addition_embed_dim=16,
    )


def test_sdxl_topology_forward(rng):
    cfg = _sdxl_tiny()
    model = UNet2DConditionModel(cfg)
    x = jnp.ones((2, 4, 16, 16))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.ones((2, 6, cfg.context_dim))
    added = jnp.ones((2, cfg.addition_embed_dim))
    variables = model.init(rng, x, t, ctx, added)
    out = model.apply(variables, x, t, ctx, added)
    assert out.shape == x.shape
    # added_cond changes the output through add_embedding
    out2 = model.apply(variables, x, t, ctx, added * 2)
    assert float(jnp.max(jnp.abs(out2 - out))) > 1e-6
    # block 0 has no attention modules
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = {"/".join(str(k.key) for k in path) for path, _ in flat}
    assert not any("down_blocks_0_attentions" in n for n in names)
    assert any("down_blocks_1_attentions_0" in n for n in names)
    assert any("add_embedding" in n for n in names)


def test_sdxl_topology_lokr_wrap(rng):
    cfg = _sdxl_tiny()
    model = UNet2DConditionModel(cfg)
    x = jnp.ones((2, 4, 16, 16))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.ones((2, 6, cfg.context_dim))
    added = jnp.ones((2, cfg.addition_embed_dim))
    variables = model.init(rng, x, t, ctx, added)
    graph = ModelGraph.from_linen(model, variables, x, t, ctx, added)
    LycorisNetwork.apply_preset({"target_module": ["Transformer2DModel"]})
    net = create_lycoris(graph, 1.0, 4, 1.0, algo="lokr", factor=4, rng=rng)
    assert len(net.loras) > 10
    out = net(variables, x, t, ctx, added)
    base = model.apply(variables, x, t, ctx, added)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "tier",
    [
        "attn_out",
        "attn_ff",
        "attn_ff_norm",
        "attn_ff_norm_geglu",
        "attn_ff_qkv",
        "attn_ff_qkv_norm",
    ],
)
def test_remat_tiers_match_no_remat_grads(rng, tier):
    """Named-save remat tiers are a pure memory/recompute trade: loss and
    grads must equal the no-remat graph bit-for-bit-ish at fp32."""
    x = jnp.linspace(-1, 1, 2 * 4 * 16 * 16).reshape(2, 4, 16, 16)
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.linspace(0, 1, 2 * 6 * 32).reshape(2, 6, 32)
    added = jnp.ones((2, 16))

    def loss_fn(cfg_remat):
        cfg = dataclasses.replace(_sdxl_tiny(), remat=cfg_remat)
        model = UNet2DConditionModel(cfg)
        variables = model.init(rng, x, t, ctx, added)

        def loss(params):
            out = model.apply({"params": params}, x, t, ctx, added)
            return jnp.mean(out**2)

        params = variables["params"]
        return jax.jit(jax.value_and_grad(loss))(params)

    l0, g0 = loss_fn(False)
    l1, g1 = loss_fn(tier)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
