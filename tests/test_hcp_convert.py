"""HCP ⇄ webui converter parity vs the reference tool."""

import sys

import numpy as np
import pytest


def _ref_converter(ref):
    import types

    # the reference tool imports hcpdiff's checkpoint manager at module level;
    # stub it (we only exercise the pure key-conversion classes)
    if "hcpdiff" not in sys.modules:
        hcp = types.ModuleType("hcpdiff")
        ckpt = types.ModuleType("hcpdiff.ckpt_manager")
        ckpt.auto_manager = lambda *a, **k: None
        hcp.ckpt_manager = ckpt
        sys.modules["hcpdiff"] = hcp
        sys.modules["hcpdiff.ckpt_manager"] = ckpt
    sys.path.insert(0, "/root/reference/tools")
    import importlib

    mod = importlib.import_module("batch_hcp_convert")
    return mod


def _webui_lora_sd():
    rng = np.random.default_rng(0)
    sd = {}
    for name in [
        "lora_unet_down_blocks_0_attentions_1_transformer_blocks_0_attn1_to_q",
        "lora_unet_mid_block_attentions_0_proj_out",
        "lora_te_text_model_encoder_layers_3_self_attn_q_proj",
    ]:
        sd[f"{name}.lora_down.weight"] = rng.normal(size=(4, 16)).astype(np.float32)
        sd[f"{name}.lora_up.weight"] = rng.normal(size=(16, 4)).astype(np.float32)
        sd[f"{name}.alpha"] = np.asarray(4.0, np.float32)
    return sd


@pytest.mark.parametrize("auto_scale", [False, True])
def test_roundtrip_and_parity(ref, auto_scale):
    import torch

    from lycoris_tpu.utils.hcp_convert import LoraConverter

    ref_mod = _ref_converter(ref)
    sd = _webui_lora_sd()
    sd_torch = {k: torch.tensor(v) for k, v in sd.items()}

    ours = LoraConverter()
    theirs = ref_mod.LoraConverter()

    j_unet, j_te = ours.convert_from_webui(dict(sd), "lora", auto_scale, sdxl=False)
    r_unet, r_te = theirs.convert_from_webui(dict(sd_torch), "lora", auto_scale, sdxl=False)
    assert set(j_unet["lora"]) == set(r_unet["lora"])
    assert set(j_te["lora"]) == set(r_te["lora"])
    for k in j_unet["lora"]:
        np.testing.assert_allclose(j_unet["lora"][k], r_unet["lora"][k].numpy(), rtol=1e-6)

    # round trip back to webui
    back = ours.convert_to_webui(j_unet["lora"], j_te["lora"], "lora", auto_scale, sdxl=False)
    r_back = theirs.convert_to_webui(r_unet["lora"], r_te["lora"], "lora", auto_scale, sdxl=False)
    assert set(back) == set(r_back) == set(sd)
    if not auto_scale:
        for k in sd:
            np.testing.assert_allclose(back[k], sd[k], rtol=1e-6)


def test_base_converter(ref):
    from lycoris_tpu.utils.hcp_convert import BaseConverter

    rng = np.random.default_rng(1)
    base_unet = {"conv_in.weight": rng.normal(size=(4, 4)).astype(np.float32),
                 "conv_in.bias": rng.normal(size=(4,)).astype(np.float32)}
    ft_unet = {k: v + 0.1 for k, v in base_unet.items()}
    conv = BaseConverter(base_unet, {}, save_fp16=False)
    out = conv.convert_to_webui(ft_unet, {})
    assert "lora_unet_conv_in.diff" in out and "lora_unet_conv_in.diff_b" in out
    np.testing.assert_allclose(out["lora_unet_conv_in.diff"], 0.1, atol=1e-6)
