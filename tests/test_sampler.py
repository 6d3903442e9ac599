"""DDIM sampler: one jitted loop; merged vs live-adapter parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
from lycoris_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from lycoris_tpu.sampler import make_ddim_sampler


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


def test_ddim_merged_equals_live_adapters(rng):
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(cfg)
    x = jax.random.normal(rng, (2, 4, 8, 8))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 6, cfg.context_dim))
    variables = model.init(jax.random.key(0), x, t, ctx)
    graph = ModelGraph.from_linen(model, variables, x, t, ctx)
    net = create_lycoris(graph, 1.0, 4, 1.0, algo="lokr", factor=4, rng=rng)
    tree = net.params_tree()
    key = rng
    for ln, p in tree.items():
        for k in list(p):
            if k in net.lora_map[ln].trainable:
                key, sub = jax.random.split(key)
                p[k] = p[k] + jax.random.normal(sub, p[k].shape, p[k].dtype) * 0.01
    net.set_params_tree(tree)

    live = make_ddim_sampler(
        lambda p, xx, tt, cc: net({"params": p}, xx, tt, cc, adapter_params=tree,
                                  model=model, merged_forward=True),
        num_inference_steps=4, guidance_scale=1.0,
    )
    merged_params = net.merge_to(1.0, adapter_params=tree)
    merged = make_ddim_sampler(
        lambda p, xx, tt, cc: model.apply({"params": p}, xx, tt, cc),
        num_inference_steps=4, guidance_scale=1.0,
    )

    out_live = jax.jit(live)(variables["params"], x, ctx)
    out_merged = jax.jit(merged)(merged_params, x, ctx)
    assert out_live.shape == x.shape
    assert np.isfinite(np.asarray(out_live)).all()
    np.testing.assert_allclose(
        np.asarray(out_merged), np.asarray(out_live), rtol=5e-2, atol=5e-3
    )


def test_cfg_path(rng):
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(cfg)
    x = jax.random.normal(rng, (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (1, 6, cfg.context_dim))
    unc = jnp.zeros_like(ctx)
    variables = model.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32), ctx)
    sampler = make_ddim_sampler(
        lambda p, xx, tt, cc: model.apply({"params": p}, xx, tt, cc),
        num_inference_steps=3, guidance_scale=5.0,
    )
    out = jax.jit(sampler)(variables["params"], x, ctx, unc)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
