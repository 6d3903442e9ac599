"""DiT (Flux-style) fixture tests — mirrors the reference's fake-model
wrapper tests (test/wrapper.py:395-862): preset targeting on DiT block class
names, exact lora_name coverage, fnmatch and exclusion behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
from lycoris_tpu.models.dit import FluxTransformer2D, tiny_dit_config


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


def _build():
    cfg = tiny_dit_config()
    model = FluxTransformer2D(cfg)
    img = jnp.ones((2, 16, cfg.in_channels))
    txt = jnp.ones((2, 4, cfg.context_dim))
    t = jnp.zeros((2,), jnp.int32)
    variables = model.init(jax.random.key(0), img, txt, t)
    graph = ModelGraph.from_linen(model, variables, img, txt, t)
    return model, variables, (img, txt, t), graph


def test_dit_block_targeting(rng):
    model, variables, args, graph = _build()
    LycorisNetwork.apply_preset(
        {"target_module": ["DoubleStreamBlock", "SingleStreamBlock"]}
    )
    net = create_lycoris(graph, 1.0, 4, 1.0, algo="lokr", factor=4, rng=rng)
    names = {l.lora_name for l in net.loras}
    # every double block contributes img/txt attn qkv+proj and mlps
    assert "lycoris_double_blocks_0_img_attn_qkv" in names
    assert "lycoris_double_blocks_1_txt_mlp_2" in names
    assert "lycoris_single_blocks_0_linear1" in names
    assert "lycoris_single_blocks_1_linear2" in names
    # nothing outside the blocks
    assert not any("img_in" in n or "final_proj" in n for n in names)

    out0 = net(variables, *args)
    base = model.apply(variables, *args)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), rtol=2e-5, atol=2e-5)


def test_dit_fnmatch_and_exclude(rng):
    model, variables, args, graph = _build()
    LycorisNetwork.apply_preset(
        {
            "target_module": [],
            "target_name": ["single_blocks_*"],
            "use_fnmatch": True,
            "exclude_name": ["single_blocks_1*"],
        }
    )
    net = create_lycoris(graph, 1.0, 4, 1.0, algo="lora", rng=rng)
    names = {l.lora_name for l in net.loras}
    assert names, "no modules created"
    assert all(n.startswith("lycoris_single_blocks_0") for n in names), names


def test_dit_module_algo_map(rng):
    model, variables, args, graph = _build()
    LycorisNetwork.apply_preset(
        {
            "target_module": ["DoubleStreamBlock", "SingleStreamBlock"],
            "module_algo_map": {
                "SingleStreamBlock": {"algo": "loha", "dim": 8},
            },
        }
    )
    net = create_lycoris(graph, 1.0, 4, 1.0, algo="lokr", factor=4, rng=rng)
    by_name = {l.lora_name: type(l).__name__ for l in net.loras}
    assert by_name["lycoris_single_blocks_0_linear1"] == "LohaModule"
    assert by_name["lycoris_double_blocks_0_img_attn_qkv"] == "LokrModule"
    # dim override applied within the mapped scope
    loha = net.lora_map["lycoris_single_blocks_0_linear1"]
    assert loha.lora_dim == 8
