"""End-to-end slice: tiny UNet + adapters + jitted train step on the
8-device CPU mesh (SURVEY §7 build step 5/7)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
from lycoris_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from lycoris_tpu.parallel import sharding as shd
from lycoris_tpu.trainer import DiffusionTrainer


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


def _tiny_setup(algo="lokr", batch=8):
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(cfg)
    rng = jax.random.key(0)
    latents = jnp.ones((batch, 4, 8, 8))
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.ones((batch, 6, cfg.context_dim))
    variables = model.init(rng, latents, t, ctx)
    graph = ModelGraph.from_linen(model, variables, latents, t, ctx)
    net = create_lycoris(graph, 1.0, linear_dim=4, linear_alpha=1.0, algo=algo,
                         preset="attn-mlp", factor=4, rng=rng)
    # attn-mlp preset has no standalone target_module key; fall back covers it
    batch_data = {"latents": latents, "context": ctx}
    return model, variables, net, batch_data


def test_unet_forward_and_wrap():
    model, variables, net, batch = _tiny_setup()
    assert len(net.loras) > 10
    out = net({"params": variables["params"]}, batch["latents"],
              jnp.zeros((8,), jnp.int32), batch["context"], model=model)
    assert out.shape == batch["latents"].shape


@pytest.mark.parametrize("algo", ["lokr", "loha"])
def test_train_step_decreases_loss(algo):
    model, variables, net, batch = _tiny_setup(algo)
    mesh = shd.make_mesh()  # all 8 cpu devices on data axis
    tr = DiffusionTrainer(model, variables, net, lr=1e-2, mesh=mesh,
                          weight_dtype=jnp.float32)
    rng = jax.random.key(7)
    losses = [float(tr.train_step(batch, jax.random.fold_in(rng, i))) for i in range(12)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses


def test_train_step_model_sharded():
    """tp-ish: frozen base sharded over a 2-wide model axis, 4-wide data.

    The sharded step must agree NUMERICALLY with the plain replicated
    trainer (same batch, same rng) — XLA inserts the all-gathers, so only
    reduction order may differ."""
    model, variables, net, batch = _tiny_setup("lokr")
    rng = jax.random.key(3)

    mesh = shd.make_mesh(data=4, model=2)
    tr = DiffusionTrainer(model, variables, net, lr=1e-3, mesh=mesh,
                          weight_dtype=jnp.float32, shard_base=True)
    sharded = [float(tr.train_step(batch, jax.random.fold_in(rng, i)))
               for i in range(3)]
    assert np.isfinite(sharded).all()

    model, variables, net, batch = _tiny_setup("lokr")
    mesh1 = shd.make_mesh(data=1, model=1)
    tr1 = DiffusionTrainer(model, variables, net, lr=1e-3, mesh=mesh1,
                           weight_dtype=jnp.float32)
    plain = [float(tr1.train_step(batch, jax.random.fold_in(rng, i)))
             for i in range(3)]
    np.testing.assert_allclose(sharded, plain, rtol=1e-4)


def test_auto_layout_matches_plain_jit():
    """Layout.AUTO AOT path produces the same loss trajectory as plain jit
    (base params relocated into the executable's preferred layouts must be
    numerically transparent)."""
    losses = {}
    for auto in (False, True):
        model, variables, net, batch = _tiny_setup("lokr")
        tr = DiffusionTrainer(model, variables, net, lr=1e-2,
                              weight_dtype=jnp.float32, auto_layout=auto)
        rng = jax.random.key(5)
        losses[auto] = [
            float(tr.train_step(batch, jax.random.fold_in(rng, i))) for i in range(4)
        ]
        if auto:
            assert tr._compiled is not None  # the AOT executable actually ran
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_auto_layout_inplace_matches_plain_jit(monkeypatch):
    """LYCORIS_TPU_RELAYOUT_INPLACE=1 relayouts tensor-by-tensor, freeing each
    source buffer (zero-budget path for SDXL-sized param trees). Must be
    numerically transparent and must actually take the AOT path even with a
    zero budget (which would otherwise decline)."""
    monkeypatch.setenv("LYCORIS_TPU_RELAYOUT_INPLACE", "1")
    monkeypatch.setenv("LYCORIS_TPU_RELAYOUT_BUDGET_GB", "0")
    model, variables, net, batch = _tiny_setup("lokr")
    tr = DiffusionTrainer(model, variables, net, lr=1e-2,
                          weight_dtype=jnp.float32, auto_layout=True)
    rng = jax.random.key(5)
    inplace = [float(tr.train_step(batch, jax.random.fold_in(rng, i))) for i in range(4)]
    assert tr._compiled is not None

    monkeypatch.delenv("LYCORIS_TPU_RELAYOUT_INPLACE")
    monkeypatch.delenv("LYCORIS_TPU_RELAYOUT_BUDGET_GB")
    model, variables, net, batch = _tiny_setup("lokr")
    tr = DiffusionTrainer(model, variables, net, lr=1e-2,
                          weight_dtype=jnp.float32, auto_layout=False)
    plain = [float(tr.train_step(batch, jax.random.fold_in(rng, i))) for i in range(4)]
    np.testing.assert_allclose(inplace, plain, rtol=1e-6)


def test_auto_layout_fallback_on_layout_rejection():
    """If the AOT executable rejects the relayouted base params (persistent
    compile cache canonicalization mismatch — see trainer.auto_layout doc),
    train_step must fall back to the plain jit path and keep training."""
    model, variables, net, batch = _tiny_setup("lokr")
    tr = DiffusionTrainer(model, variables, net, lr=1e-3,
                          weight_dtype=jnp.float32, auto_layout=True)
    rng = jax.random.key(2)
    shapes = jax.tree_util.tree_map(jnp.shape, batch)

    def rejecting_executable(*a, **k):
        raise ValueError(
            "Computation was compiled for input layouts that disagree with "
            "the layouts of arguments passed to it."
        )

    tr._compiled = rejecting_executable
    tr._compiled_shapes = shapes
    loss = tr.train_step(batch, rng)
    assert np.isfinite(float(loss))
    assert tr._compiled is None and not tr.auto_layout  # fell back for good
    loss2 = tr.train_step(batch, jax.random.fold_in(rng, 1))
    assert np.isfinite(float(loss2))


def test_trained_adapters_merge():
    model, variables, net, batch = _tiny_setup("lokr")
    tr = DiffusionTrainer(model, variables, net, lr=1e-2, weight_dtype=jnp.float32)
    rng = jax.random.key(11)
    for i in range(3):
        tr.train_step(batch, jax.random.fold_in(rng, i))
    tr.sync_to_network()
    t = jnp.zeros((8,), jnp.int32)
    out_adapted = net({"params": variables["params"]}, batch["latents"], t,
                      batch["context"], model=model)
    merged = net.merge_to(1.0)
    out_merged = model.apply({"params": merged}, batch["latents"], t, batch["context"])
    np.testing.assert_allclose(
        np.asarray(out_merged), np.asarray(out_adapted), rtol=2e-2, atol=2e-4
    )


def test_flat_optimizer_matches_tree(monkeypatch):
    """LYCORIS_TPU_FLAT_OPT=1 runs adam over one flat vector (r3 profile:
    ~10 ms/step of per-leaf optimizer chains); adam is elementwise so the
    loss trajectory must match the per-leaf mode exactly, and sync_to_network
    must still land per-module trees."""
    model, variables, net, batch = _tiny_setup("lokr")
    rng = jax.random.key(9)
    tr = DiffusionTrainer(model, variables, net, lr=1e-2,
                          weight_dtype=jnp.float32, auto_layout=False)
    plain = [float(tr.train_step(batch, jax.random.fold_in(rng, i))) for i in range(4)]

    monkeypatch.setenv("LYCORIS_TPU_FLAT_OPT", "1")
    model, variables, net, batch = _tiny_setup("lokr")
    tr2 = DiffusionTrainer(model, variables, net, lr=1e-2,
                           weight_dtype=jnp.float32, auto_layout=False)
    assert tr2._unravel is not None and tr2.adapter_params.ndim == 1
    flat = [float(tr2.train_step(batch, jax.random.fold_in(rng, i))) for i in range(4)]
    np.testing.assert_allclose(flat, plain, rtol=1e-6)

    tr2.sync_to_network()
    tree = tr2.adapter_tree()
    some = next(iter(tree))
    for k, v in tree[some].items():
        np.testing.assert_allclose(
            np.asarray(net.lora_map[some].params[k]), np.asarray(v), rtol=1e-6)
