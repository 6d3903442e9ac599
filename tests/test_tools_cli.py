"""End-to-end CLI tests: extract_locon -> merge round trip on raw
checkpoints, bundle pack/unpack CLI, hcp convert CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tool(name, *args):
    env = dict(os.environ)
    env["LYCORIS_FORCE_CPU"] = "1"  # keep tool subprocesses off the TPU
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", name), *args],
        capture_output=True, text=True, env=env, timeout=300,
    )


@pytest.fixture(scope="module")
def ckpt_pair(tmp_path_factory):
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("ckpts")
    rng = np.random.default_rng(0)
    base = {
        "blocks.0.fc.weight": rng.normal(size=(64, 32)).astype(np.float32),
        "blocks.0.fc.bias": rng.normal(size=(64,)).astype(np.float32),
        "blocks.0.conv.weight": rng.normal(size=(32, 16, 3, 3)).astype(np.float32),
    }
    db = dict(base)
    db["blocks.0.fc.weight"] = base["blocks.0.fc.weight"] + (
        rng.normal(size=(64, 4)) @ rng.normal(size=(4, 32)) * 0.02
    ).astype(np.float32)
    db["blocks.0.conv.weight"] = base["blocks.0.conv.weight"] + (
        rng.normal(size=(32, 4)) @ rng.normal(size=(4, 16 * 9)) * 0.02
    ).reshape(32, 16, 3, 3).astype(np.float32)
    bp, dp = str(d / "base.safetensors"), str(d / "db.safetensors")
    save_file(base, bp)
    save_file(db, dp)
    return bp, dp, d, base, db


def test_extract_then_merge_cli(ckpt_pair):
    from safetensors.numpy import load_file

    bp, dp, d, base, db = ckpt_pair
    adapter = str(d / "adapter.safetensors")
    r = run_tool("extract_locon.py", bp, dp, adapter, "--mode", "fixed",
                 "--linear_dim", "4", "--conv_dim", "4", "--disable_cp")
    assert r.returncode == 0, r.stderr[-2000:]
    sd = load_file(adapter)
    assert "lora_unet_blocks_0_fc.lora_down.weight" in sd

    merged_path = str(d / "merged.safetensors")
    r = run_tool("merge.py", bp, adapter, merged_path, "--weight", "1.0")
    assert r.returncode == 0, r.stderr[-2000:]
    merged = load_file(merged_path)
    np.testing.assert_allclose(
        merged["blocks.0.fc.weight"], db["blocks.0.fc.weight"], atol=5e-3
    )
    np.testing.assert_allclose(
        merged["blocks.0.conv.weight"], db["blocks.0.conv.weight"], atol=5e-3
    )
    # untouched tensors pass through
    np.testing.assert_array_equal(merged["blocks.0.fc.bias"], base["blocks.0.fc.bias"])


def test_bundle_cli(ckpt_pair, tmp_path):
    from safetensors.numpy import load_file, save_file

    bp, dp, d, base, db = ckpt_pair
    emb = str(tmp_path / "myemb.safetensors")
    save_file({"emb_params": np.ones((2, 8), np.float32)}, emb)
    lora = str(d / "adapter.safetensors")
    if not os.path.exists(lora):
        pytest.skip("extract test must run first")
    out = str(tmp_path / "bundle.safetensors")
    r = run_tool("pack_bundle.py", lora, emb, "-o", out)
    assert r.returncode == 0, r.stderr[-2000:]
    sd = load_file(out)
    assert "bundle_emb.myemb.emb_params" in sd


def test_hcp_cli(ckpt_pair, tmp_path):
    from safetensors.numpy import load_file

    bp, dp, d, base, db = ckpt_pair
    lora = str(d / "adapter.safetensors")
    if not os.path.exists(lora):
        pytest.skip("extract test must run first")
    dst = str(tmp_path / "hcp")
    r = run_tool("batch_hcp_convert.py", "from_webui", "--src", lora, "--dst_dir", dst)
    assert r.returncode == 0, r.stderr[-2000:]
    files = os.listdir(dst)
    assert any(f.startswith("unet-") for f in files)
