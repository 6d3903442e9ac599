"""GSPMD sharding correctness tests (SURVEY §2.4 — net-new TPU subsystem).

Gates:
1. data-parallel train loss == single-device loss (same rng) — the GSPMD
   program must be numerically equivalent, collectives included.
2. model-axis sharding specs: big frozen weights get a 'model' dim, small
   ones replicate; specs are valid for their shapes.
3. shard_batch places batches on the data axis.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
from lycoris_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from lycoris_tpu.parallel import sharding as shd
from lycoris_tpu.trainer import DiffusionTrainer


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


def _setup(batch=8):
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(cfg)
    rng = jax.random.key(0)
    latents = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 4, 8, 8))
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 6, cfg.context_dim))
    variables = model.init(rng, latents, t, ctx)
    graph = ModelGraph.from_linen(model, variables, latents, t, ctx)
    net = create_lycoris(graph, 1.0, 4, 1.0, algo="lokr", factor=4, rng=rng)
    return model, variables, net, {"latents": latents, "context": ctx}


def test_dp_matches_single_device():
    model, variables, net, batch = _setup()
    rng = jax.random.key(3)

    mesh1 = shd.make_mesh(devices=jax.devices()[:1])
    tr1 = DiffusionTrainer(model, variables, net, lr=1e-3, mesh=mesh1, weight_dtype=jnp.float32)
    losses1 = [float(tr1.train_step(batch, jax.random.fold_in(rng, i))) for i in range(3)]

    mesh8 = shd.make_mesh()
    tr8 = DiffusionTrainer(model, variables, net, lr=1e-3, mesh=mesh8, weight_dtype=jnp.float32)
    losses8 = [float(tr8.train_step(batch, jax.random.fold_in(rng, i))) for i in range(3)]

    np.testing.assert_allclose(losses8, losses1, rtol=1e-4)


def test_base_param_specs():
    mesh = shd.make_mesh(data=4, model=2)
    big = jnp.zeros((1024, 512))
    small = jnp.zeros((16, 16))
    odd = jnp.zeros((513, 7))  # nothing divisible by 2 on the biggest axis? 513 no, 7 no
    assert shd.base_param_spec(big, mesh) == P("model", None)
    assert shd.base_param_spec(small, mesh) == P()
    # odd-but-big tensor: falls back to any divisible axis or replication
    spec = shd.base_param_spec(jnp.zeros((514, 512)), mesh)
    assert spec in (P("model", None), P(None, "model"))
    assert shd.base_param_spec(odd, mesh) == P()


def test_shard_batch_layout():
    mesh = shd.make_mesh()
    batch = {"x": jnp.zeros((8, 3)), "y": jnp.zeros((8,))}
    sharded = shd.shard_batch(batch, mesh)
    for v in jax.tree_util.tree_leaves(sharded):
        assert v.sharding.spec[0] == "data"
