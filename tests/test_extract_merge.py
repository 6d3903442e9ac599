"""Extract (batched SVD) + merge toolchain tests (SURVEY §7 step 8).

Gates:
1. low-rank round trip: a base model perturbed by an exactly-rank-r delta is
   recovered by extract_diff(fixed, r) and merge() reproduces the tuned model.
2. cross-framework: key set matches the reference extract_diff on identical
   torch fixtures.
3. rank-mode selection parity (threshold/ratio/quantile) vs reference
   extract_linear.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lycoris_tpu.graph import ModelGraph
from lycoris_tpu.utils.extract import extract_diff, extract_linear, extract_conv
from lycoris_tpu.utils.merge import merge, convert_diffusers_name_to_compvis


def _torch_pair(rank=4, seed=0):
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(32, 64)
            self.conv1 = tnn.Conv2d(16, 32, 3, 1, 1)
            self.conv_pw = tnn.Conv2d(32, 32, 1)
            self.norm = tnn.LayerNorm(64)

    base = Net()
    db = Net()
    db.load_state_dict(base.state_dict())
    with torch.no_grad():
        # exactly-rank-r perturbations
        db.fc1.weight += torch.randn(64, rank) @ torch.randn(rank, 32) * 0.02
        d = torch.randn(32, rank) @ torch.randn(rank, 16 * 9) * 0.02
        db.conv1.weight += d.reshape(32, 16, 3, 3)
        db.conv_pw.weight += (torch.randn(32, rank) @ torch.randn(rank, 32) * 0.02).reshape(32, 32, 1, 1)
        db.norm.weight += 0.05
        db.norm.bias += 0.01
    return base, db


def test_extract_round_trip_and_merge():
    base, db = _torch_pair(rank=4)
    sd = extract_diff([], [], base, db, mode="fixed", linear_mode_param=4,
                      conv_mode_param=4, small_conv=False)
    names = {k.rsplit(".", 1)[0] for k in sd}
    assert "lora_unet_fc1" in names
    assert "lora_unet_conv1" in names
    # norms only extract in mode="full" (reference behavior)
    assert "lora_unet_norm" not in names
    sd_full = extract_diff([], [], base, db, mode="full")
    assert "lora_unet_norm.w_norm" in sd_full and "lora_unet_norm.b_norm" in sd_full

    # merge back onto base -> should approximate db
    merged_trees, count = merge([], base, dict(sd), scale=1.0)
    assert count >= 3
    merged = merged_trees["lora_unet"]
    import torch

    for name, mod in [("fc1", db.fc1), ("conv1", db.conv1), ("conv_pw", db.conv_pw)]:
        got = np.asarray(merged[name]["weight"])
        want = mod.weight.detach().numpy()
        assert np.max(np.abs(got - want)) < 5e-3, f"{name}: {np.max(np.abs(got - want))}"


def test_extract_keys_match_reference(ref):
    base, db = _torch_pair(rank=4, seed=1)
    j_sd = extract_diff([], [], base, db, mode="fixed", linear_mode_param=4,
                        conv_mode_param=4, small_conv=True)

    from lycoris.utils import extract_diff as ref_extract_diff

    r_sd = ref_extract_diff([], [], base, db, mode="fixed", linear_mode_param=4,
                            conv_mode_param=4, small_conv=True)
    assert set(j_sd) == set(r_sd), (
        f"ours-only: {sorted(set(j_sd) - set(r_sd))}; ref-only: {sorted(set(r_sd) - set(j_sd))}"
    )
    for k in r_sd:
        assert tuple(j_sd[k].shape) == tuple(r_sd[k].shape), k


@pytest.mark.parametrize("mode,param", [("fixed", 4), ("threshold", 0.05), ("ratio", 0.3), ("quantile", 0.7)])
def test_rank_mode_parity(ref, mode, param):
    import torch

    torch.manual_seed(2)
    w = torch.randn(64, 8) @ torch.randn(8, 48) * 0.1

    from lycoris.utils import extract_linear as ref_extract_linear

    r_out, r_mode = ref_extract_linear(w, mode, param)
    j_out, j_mode = extract_linear(jnp.asarray(w.numpy()), mode, param)
    assert r_mode == j_mode
    if r_mode == "low rank":
        rA, rB, rdiff = r_out
        jA, jB, jdiff = j_out
        assert rA.shape == jA.shape and rB.shape == jB.shape
        # rebuild parity (SVD sign ambiguity means factors may differ)
        np.testing.assert_allclose(
            np.asarray(jB @ jA), (rB @ rA).numpy(), rtol=1e-3, atol=1e-4
        )


def test_compvis_key_conversion(ref):
    from lycoris.utils import convert_diffusers_name_to_compvis as ref_conv

    keys = [
        "lora_unet_conv_in",
        "lora_unet_conv_out",
        "lora_unet_time_embedding_linear_1",
        "lora_unet_time_embedding_linear_2",
        "lora_unet_down_blocks_0_attentions_1_proj_in",
        "lora_unet_down_blocks_2_resnets_1_conv2",
        "lora_unet_mid_block_attentions_0_proj_out",
        "lora_unet_mid_block_resnets_1_conv1",
        "lora_unet_up_blocks_3_attentions_0_transformer_blocks_0_attn1_to_q",
        "lora_unet_up_blocks_1_resnets_2_time_emb_proj",
        "lora_unet_down_blocks_1_downsamplers_0_conv",
        "lora_unet_up_blocks_2_upsamplers_0_conv",
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj",
    ]
    for k in keys:
        assert convert_diffusers_name_to_compvis(k) == ref_conv(k), k
