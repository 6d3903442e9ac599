"""Bundle pack/unpack round trip (reference tools/pack_bundle.py format)."""

import numpy as np

from lycoris_tpu.utils.bundle import (
    extract_step,
    pack_bundle,
    pair_loras_with_embeddings,
    unpack_bundle,
)


def test_pack_unpack_roundtrip():
    lora = {"lora_unet_x.lora_up.weight": np.ones((4, 2))}
    embs = {
        "myemb": {"string_to_param": {"*": np.ones((2, 768))}},
        "flat": {"emb_params": np.zeros((1, 768))},
    }
    packed = pack_bundle(dict(lora), embs)
    assert "bundle_emb.myemb.string_to_param.*" in packed
    assert "bundle_emb.flat.emb_params" in packed

    unpacked, out_embs = unpack_bundle(packed, emb_format=".pt")
    assert set(unpacked) == set(lora)
    assert out_embs["myemb"]["string_to_param"]["*"].shape == (2, 768)
    assert out_embs["myemb"]["name"] == "myemb"

    _, flat_embs = unpack_bundle(pack_bundle(dict(lora), embs), emb_format=".safetensors")
    assert "*" in flat_embs["myemb"]


def test_step_pairing():
    assert extract_step("/a/b/net-000005.safetensors") == ("net", 5)
    assert extract_step("/a/b/net.safetensors") == ("net", "")
    pairs = pair_loras_with_embeddings(
        ["x-10.safetensors", "x-20.safetensors"],
        ["e-10.safetensors", "e-20.safetensors", "e-30.safetensors"],
    )
    assert pairs[10]["embs"] == ["e-10.safetensors"]
    assert pairs[20]["embs"] == ["e-20.safetensors"]
