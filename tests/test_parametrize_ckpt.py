"""Parametrize API + trainer checkpoint/resume tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu.modules import LoConModule, LohaModule, LokrModule, FullModule


@pytest.mark.parametrize("cls", [LoConModule, LohaModule, LokrModule])
def test_parametrize_api(cls, rng):
    w = jax.random.normal(rng, (16, 16))
    mod = cls.parametrize(w, 1.0, 4, 1.0, rng=rng)
    out0 = mod.parametrize_forward(w)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(w), rtol=1e-5, atol=1e-6)
    # noised adapter params change the parametrized value
    params = dict(mod.params)
    for k in mod.trainable:
        params[k] = params[k] + 0.01
    out1 = mod.parametrize_forward(w, params=params)
    assert float(jnp.max(jnp.abs(out1 - w))) > 1e-6


def test_parametrize_rejects_full(rng):
    w = jax.random.normal(rng, (8, 8))
    with pytest.raises(RuntimeError):
        FullModule.parametrize(w, 1.0)


def test_trainer_checkpoint_roundtrip(tmp_path, rng):
    from lycoris_tpu import ModelGraph, create_lycoris
    from lycoris_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
    from lycoris_tpu.trainer import DiffusionTrainer

    cfg = tiny_unet_config()
    model = UNet2DConditionModel(cfg)
    x = jnp.ones((8, 4, 8, 8))
    t = jnp.zeros((8,), jnp.int32)
    ctx = jnp.ones((8, 6, cfg.context_dim))
    variables = model.init(rng, x, t, ctx)
    graph = ModelGraph.from_linen(model, variables, x, t, ctx)
    net = create_lycoris(graph, 1.0, 4, 1.0, algo="lokr", factor=4, rng=rng)

    tr = DiffusionTrainer(model, variables, net, lr=1e-3, weight_dtype=jnp.float32)
    batch = {"latents": x, "context": ctx}
    for i in range(2):
        tr.train_step(batch, jax.random.fold_in(rng, i))
    tr.save_checkpoint(str(tmp_path / "ckpt"))

    tr2 = DiffusionTrainer(model, variables, net, lr=1e-3, weight_dtype=jnp.float32)
    tr2.load_checkpoint(str(tmp_path / "ckpt"))
    assert tr2.step == 2
    a = jax.tree_util.tree_leaves(jax.device_get(tr.adapter_params))
    b = jax.tree_util.tree_leaves(jax.device_get(tr2.adapter_params))
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    # resumed training proceeds identically
    l1 = float(tr.train_step(batch, jax.random.fold_in(rng, 99)))
    l2 = float(tr2.train_step(batch, jax.random.fold_in(rng, 99)))
    assert l1 == pytest.approx(l2, rel=1e-5)
