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
    # big enough to shard but with NO axis divisible by model=2 → replicate
    indivisible = jnp.zeros((513, 7, 129))
    assert shd.base_param_spec(big, mesh) == P("model", None)
    assert shd.base_param_spec(small, mesh) == P()
    # biggest axis (514) is divisible: sharded on some divisible axis
    spec = shd.base_param_spec(jnp.zeros((514, 512)), mesh)
    assert spec in (P("model", None), P(None, "model"))
    assert shd.base_param_spec(indivisible, mesh) == P()


def test_shard_batch_layout():
    mesh = shd.make_mesh()
    batch = {"x": jnp.zeros((8, 3)), "y": jnp.zeros((8,))}
    sharded = shd.shard_batch(batch, mesh)
    for v in jax.tree_util.tree_leaves(sharded):
        assert v.sharding.spec[0] == "data"


def test_driver_dryrun_multichip():
    """The driver-graded artifact: __graft_entry__.dryrun_multichip must pass
    even when the parent env points at a TPU plugin (MULTICHIP_r01 regression).
    """
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    # simulate the axon env the driver runs under
    old = {k: os.environ.get(k) for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")}
    os.environ["JAX_PLATFORMS"] = "axon"
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    try:
        g.dryrun_multichip(8)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_shard_base_reduces_per_device_footprint():
    """SURVEY §7 build item 7 / VERDICT r1 item 10: sharding the frozen base
    over (1,8) must actually cut per-device param bytes ~8x, and the sharded
    step must still run. Uses an SDXL-shaped (scaled-down) config so the big
    tensors clear the min_size sharding threshold."""
    from lycoris_tpu.models.unet import UNetConfig

    cfg = UNetConfig(
        block_out_channels=(128, 256),
        layers_per_block=1,
        transformer_depth=(0, 2),
        mid_transformer_depth=2,
        context_dim=256,
        num_heads=4,
        norm_groups=32,
    )
    model = UNet2DConditionModel(cfg)
    rng = jax.random.key(0)
    batch = 8
    latents = jax.random.normal(rng, (batch, 4, 16, 16))
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jax.random.normal(rng, (batch, 6, cfg.context_dim))
    variables = model.init(rng, latents, t, ctx)
    graph = ModelGraph.from_linen(model, variables, latents, t, ctx)
    net = create_lycoris(graph, 1.0, 4, 1.0, algo="lokr", factor=4, rng=rng)

    mesh = shd.make_mesh(data=1, model=8)
    tr = DiffusionTrainer(
        model, variables, net, lr=1e-3, mesh=mesh,
        weight_dtype=jnp.float32, shard_base=True,
    )

    def per_device_bytes(tree):
        total = 0
        for x in jax.tree_util.tree_leaves(tree):
            shard_shape = x.sharding.shard_shape(x.shape)
            total += int(np.prod(shard_shape)) * x.dtype.itemsize
        return total

    replicated_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tr.base_params)
    )
    sharded_bytes = per_device_bytes(tr.base_params)
    # big tensors dominate: per-device footprint must be well under half of
    # replicated (ideal is 1/8 + small replicated leaves)
    assert sharded_bytes < replicated_bytes / 3, (sharded_bytes, replicated_bytes)

    loss = tr.train_step({"latents": latents, "context": ctx}, jax.random.key(1))
    assert jnp.isfinite(float(loss))
