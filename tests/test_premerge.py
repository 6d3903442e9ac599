"""premerge train mode: traced merge-then-run must equal interceptor mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
from lycoris_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from lycoris_tpu.trainer import DiffusionTrainer


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


def test_premerge_matches_interceptor(rng):
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(cfg)
    x = jax.random.normal(rng, (8, 4, 8, 8))
    t = jnp.zeros((8,), jnp.int32)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (8, 6, cfg.context_dim))
    variables = model.init(jax.random.key(0), x, t, ctx)
    graph = ModelGraph.from_linen(model, variables, x, t, ctx)
    net = create_lycoris(graph, 1.0, 4, 1.0, algo="lokr", factor=4, rng=rng)
    batch = {"latents": x, "context": ctx}
    key = jax.random.key(9)

    tr_a = DiffusionTrainer(model, variables, net, lr=1e-3, weight_dtype=jnp.float32,
                            merge_mode="interceptor")
    tr_b = DiffusionTrainer(model, variables, net, lr=1e-3, weight_dtype=jnp.float32,
                            merge_mode="premerge")
    for i in range(3):
        la = float(tr_a.train_step(batch, jax.random.fold_in(key, i)))
        lb = float(tr_b.train_step(batch, jax.random.fold_in(key, i)))
        assert la == pytest.approx(lb, rel=1e-4), (i, la, lb)
