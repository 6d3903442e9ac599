"""Max-norm regularization tests (reference test/module.py:88-92 exercises
apply_max_norm in every grid case; kohya calls it per train step,
reference kohya.py:637-650).

Gates:
1. per-algo: a module whose effective weight exceeds the limit is flagged and
   rescaled to ≤ limit; re-applying is then a no-op (ratio ≈ 1).
2. under the limit nothing changes.
3. non-supporting algos return the (params, None, None) base no-op.
4. the traced wrapper pass works under jit and matches the eager one.
5. DiffusionTrainer(scale_weight_norms=…) applies it per step: stats are
   populated and post-step module norms sit under the limit.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu.modules import (
    LayerInfo,
    LoConModule,
    LohaModule,
    LokrModule,
    IA3Module,
    FullModule,
    DiagOFTModule,
    ButterflyOFTModule,
)

DIM = 16

ALGOS = {
    "locon": LoConModule,
    "loha": LohaModule,
    "lokr": LokrModule,
    "diag_oft": DiagOFTModule,
    "boft": ButterflyOFTModule,
}

LAYERS = {
    "linear": LayerInfo.linear(DIM, DIM),
    "conv2d": LayerInfo.conv(2, DIM, DIM, 3, padding=1),
}


def _noised_module(algo, layer_info, key, scale=2.0):
    w = jax.random.normal(key, layer_info.shape)
    mod = ALGOS[algo](
        "test", layer_info, 1.0, lora_dim=4, alpha=4.0,
        rng=jax.random.key(7), org_weight=w,
    )
    # blow up every float param so the effective weight norm clears any
    # reasonable limit (zero-init factors become large too)
    for k, v in mod.params.items():
        if k == "alpha" or not jnp.issubdtype(v.dtype, jnp.floating):
            continue
        key, sub = jax.random.split(key)
        mod.params[k] = jax.random.normal(sub, v.shape, v.dtype) * scale
    return mod


@pytest.mark.parametrize("layer", list(LAYERS))
@pytest.mark.parametrize("algo", list(ALGOS))
def test_apply_max_norm_scales_down(algo, layer, rng):
    mod = _noised_module(algo, LAYERS[layer], rng)
    _, _, norm0 = mod.apply_max_norm(1e9)  # huge limit: reports current norm
    limit = float(norm0) / 4
    new_p, scaled, norm = mod.apply_max_norm(limit)
    assert bool(scaled), f"{algo}/{layer}: norm {float(norm0)} > {limit} not flagged"
    assert float(norm) <= limit * (1 + 1e-3)
    # re-apply on the updated params: the recomputed norm must sit at/under
    # the limit (ratio ≈ 1 — per-factor ratio splits like lokr's **(1/n)
    # must compose back to the full ratio)
    _, _, norm2 = mod.apply_max_norm(limit, new_p)
    assert float(norm2) <= limit * (1 + 1e-3), f"{algo}/{layer}: re-norm {float(norm2)}"


@pytest.mark.parametrize("algo", list(ALGOS))
def test_apply_max_norm_noop_under_limit(algo, rng):
    mod = _noised_module(algo, LAYERS["linear"], rng)
    _, _, norm0 = mod.apply_max_norm(1e9)
    new_p, scaled, _ = mod.apply_max_norm(float(norm0) * 10)
    assert not bool(scaled)
    for k, v in mod.params.items():
        np.testing.assert_array_equal(np.asarray(new_p[k]), np.asarray(v))


def test_apply_max_norm_unsupported_returns_none(rng):
    w = jax.random.normal(rng, (DIM, DIM))
    for cls, kw in ((IA3Module, {}), (FullModule, {})):
        mod = cls("t", LAYERS["linear"], 1.0, lora_dim=4, alpha=1.0,
                  rng=jax.random.key(0), org_weight=w, **kw)
        _, scaled, norm = mod.apply_max_norm(0.001)
        assert scaled is None and norm is None


def _tiny_net(algo, rng, batch=8):
    from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
    from lycoris_tpu.models.unet import UNet2DConditionModel, tiny_unet_config

    LycorisNetwork.reset_preset()
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(cfg)
    latents = jnp.ones((batch, 4, 8, 8))
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.ones((batch, 6, cfg.context_dim))
    variables = model.init(rng, latents, t, ctx)
    graph = ModelGraph.from_linen(model, variables, latents, t, ctx)
    net = create_lycoris(graph, 1.0, linear_dim=4, linear_alpha=2.0,
                         algo=algo, factor=4, rng=rng)
    return model, variables, net, (latents, t, ctx)


def test_traced_matches_eager(rng):
    model, variables, net, _ = _tiny_net("lokr", rng)
    # noise the adapter params so norms are nonzero
    tree = net.params_tree()
    key = rng
    for ln, sub in tree.items():
        for k, v in sub.items():
            if k == "alpha" or not jnp.issubdtype(v.dtype, jnp.floating):
                continue
            key, s = jax.random.split(key)
            tree[ln][k] = jax.random.normal(s, v.shape, v.dtype)
    net.set_params_tree(tree)
    limit = 0.05

    upd, flags, norms = jax.jit(
        lambda t: net.apply_max_norm_traced(t, limit)
    )(net.params_tree())
    _, keys_scaled, mean_norm, max_norm = net.apply_max_norm_regularization(limit)
    assert int(jnp.sum(flags)) == keys_scaled
    if keys_scaled:
        assert float(jnp.mean(norms)) == pytest.approx(mean_norm, rel=1e-5)
        assert float(jnp.max(norms)) == pytest.approx(max_norm, rel=1e-5)
    assert int(jnp.sum(flags)) > 0  # the noise must actually trigger scaling


@pytest.mark.parametrize("algo", ["lokr", "loha"])
def test_trainer_scale_weight_norms(algo, rng):
    from lycoris_tpu.trainer import DiffusionTrainer

    model, variables, net, (latents, t, ctx) = _tiny_net(algo, rng)
    limit = 1e-5  # tiny: first optimizer step already exceeds it
    tr = DiffusionTrainer(
        model, variables, net, lr=0.1, weight_dtype=jnp.float32,
        scale_weight_norms=limit,
    )
    batch = {"latents": latents, "context": ctx}
    tr.train_step(batch, jax.random.key(1))
    tr.train_step(batch, jax.random.key(2))
    count, mean_norm, max_norm = tr.max_norm_stats
    assert float(count) > 0
    assert np.isfinite(float(mean_norm)) and np.isfinite(float(max_norm))
    assert float(max_norm) <= limit * (1 + 1e-3)

    # post-step invariant: every supporting module's recomputed norm ≤ limit
    tr.sync_to_network()
    _, keys_scaled, _, post_max = net.apply_max_norm_regularization(limit)
    if keys_scaled:  # fp-exact boundary re-flags are fine; magnitude must hold
        assert post_max <= limit * (1 + 1e-3)
