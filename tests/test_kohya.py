"""kohya trainer-contract tests (L3) — dual-tree targeting, network_args
parsing, LoRA+ groups, multi-TE prefixes, save/load with model hash.
(reference test/kohya.py needs a real SDXL checkpoint; we use tiny in-memory
flax fixtures instead, same as the wrapper fake-model tests.)"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu import ModelGraph
from lycoris_tpu.kohya import (
    LycorisNetworkKohya,
    create_network,
    create_network_from_weights,
)
from lycoris_tpu.models.clip import CLIPTextModel, tiny_clip_config
from lycoris_tpu.models.unet import UNet2DConditionModel, tiny_unet_config


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetworkKohya.reset_preset()


def _fixtures(n_te=1):
    rng = jax.random.key(0)
    ucfg = tiny_unet_config()
    unet = UNet2DConditionModel(ucfg)
    x = jnp.ones((2, 4, 8, 8))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.ones((2, 6, ucfg.context_dim))
    uvars = unet.init(rng, x, t, ctx)
    ugraph = ModelGraph.from_linen(unet, uvars, x, t, ctx)

    tes = []
    for i in range(n_te):
        ccfg = tiny_clip_config()
        te = CLIPTextModel(ccfg)
        ids = jnp.zeros((2, 8), jnp.int32)
        tvars = te.init(jax.random.fold_in(rng, i), ids)
        tes.append(ModelGraph.from_linen(te, tvars, ids))
    return ugraph, tes, (unet, uvars, x, t, ctx)


def test_create_network_dual_tree():
    ugraph, tes, _ = _fixtures(1)
    net = create_network(1.0, 4, 1.0, None, tes[0], ugraph, algo="lokr",
                         preset="attn-mlp", factor=4)
    assert len(net.unet_loras) > 0
    assert len(net.text_encoder_loras) > 0
    unet_names = {l.lora_name for l in net.unet_loras}
    te_names = {l.lora_name for l in net.text_encoder_loras}
    assert all(n.startswith("lora_unet_") for n in unet_names)
    assert all(n.startswith("lora_te_") for n in te_names)


def test_multi_te_prefixes():
    ugraph, tes, _ = _fixtures(2)
    net = create_network(1.0, 4, 1.0, None, tes, ugraph, algo="lora", preset="attn-mlp")
    te_names = {l.lora_name for l in net.text_encoder_loras}
    assert any(n.startswith("lora_te1_") for n in te_names)
    assert any(n.startswith("lora_te2_") for n in te_names)


def test_loraplus_param_groups():
    ugraph, tes, _ = _fixtures(1)
    net = create_network(
        1.0, 4, 1.0, None, tes[0], ugraph, algo="lora",
        preset="attn-mlp", loraplus_lr_ratio="4",
    )
    net.apply_to(apply_text_encoder=True, apply_unet=True)
    groups, descriptions = net.prepare_optimizer_params(1e-5, 1e-4, 1e-4)
    assert len(groups) == 4  # te lora/plus + unet lora/plus
    plus = [g for g, d in zip(groups, descriptions) if "plus" in d]
    assert plus and all("lora_up" in k for g in plus for k in g["params"])
    lora = [g for g, d in zip(groups, descriptions) if "plus" not in d]
    assert all("lora_up" not in k for g in lora for k in g["params"])
    # LoRA+ lr = base lr * ratio
    unet_plus = [g for g, d in zip(groups, descriptions) if d == "unet plus"][0]
    assert unet_plus["lr"] == pytest.approx(4e-4)


def test_string_network_args_coercion():
    ugraph, tes, _ = _fixtures(1)
    net = create_network(
        1.0, 4, 1.0, None, tes[0], ugraph,
        algo="lokr", preset="attn-mlp",
        use_tucker="True", full_matrix="False", factor="4", conv_dim="8",
    )
    assert len(net.loras) > 0


def test_save_load_roundtrip(tmp_path):
    ugraph, tes, (unet, uvars, x, t, ctx) = _fixtures(1)
    net = create_network(1.0, 4, 1.0, None, tes[0], ugraph, algo="loha", preset="attn-mlp")
    net.apply_to(apply_text_encoder=True, apply_unet=True)

    key = jax.random.key(5)
    for lora in net.loras:
        for k in list(lora.params):
            if k in lora.trainable:
                key, sub = jax.random.split(key)
                lora.params[k] = lora.params[k] + jax.random.normal(sub, lora.params[k].shape) * 0.01

    f = str(tmp_path / "kohya.safetensors")
    net.save_weights(f, metadata={"ss_network_module": "lycoris_tpu.kohya"})
    import safetensors

    with safetensors.safe_open(f, framework="numpy") as sf:
        meta = sf.metadata()
    assert "sshs_model_hash" in meta

    net2, sd = create_network_from_weights(1.0, f, None, tes[0], ugraph)
    assert len(net2.loras) == len(net.loras)
    m1 = net.merge_to()
    m2 = net2.merge_to()
    w1 = jax.tree_util.tree_leaves(m1["lora_unet"])
    w2 = jax.tree_util.tree_leaves(m2["lora_unet"])
    for a, b in zip(w1, w2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_apply_flags_trim():
    ugraph, tes, _ = _fixtures(1)
    net = create_network(1.0, 4, 1.0, None, tes[0], ugraph, algo="lora", preset="attn-mlp")
    n_unet = len(net.unet_loras)
    net.apply_to(apply_text_encoder=False, apply_unet=True)
    assert net.text_encoder_loras == []
    assert len(net.loras) == n_unet


def test_trainer_callback_surface():
    """kohya's train_network.py invokes these unconditionally (reference
    kohya.py:733-747) — the drop-in contract needs them callable."""
    ugraph, tes, _ = _fixtures(1)
    net = create_network(1.0, 4, 1.0, None, tes[0], ugraph, algo="lora", preset="attn-mlp")
    assert not getattr(net, "gradient_checkpointing", False)
    net.enable_gradient_checkpointing()
    assert net.gradient_checkpointing is True
    net.prepare_grad_etc()
    net.on_epoch_start()
    net.on_step_start()
    assert net.get_trainable_params()
