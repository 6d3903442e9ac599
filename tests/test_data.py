"""Native shard loader tests: header parsing, batch assembly, parity with
the numpy fallback, epoch shuffling determinism."""

import numpy as np
import pytest

from lycoris_tpu.data import ShardDataset, parse_safetensors_header


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("shards")
    rng = np.random.default_rng(0)
    items = {}
    for s in range(3):
        sd = {}
        for i in range(10):
            name = f"latents_{s}_{i}"
            sd[name] = rng.normal(size=(4, 8, 8)).astype(np.float32)
            items[name] = sd[name]
        save_file(sd, str(d / f"shard-{s}.safetensors"))
    return d, items


def test_header_parse(shards):
    d, items = shards
    import os

    f = os.path.join(str(d), sorted(os.listdir(d))[0])
    header, base = parse_safetensors_header(f)
    assert base > 8
    key = next(k for k in header if k != "__metadata__")
    assert header[key]["dtype"] == "F32"


def test_native_epoch_matches_fallback(shards):
    d, items = shards
    ds = ShardDataset.from_dir(str(d), key_prefix="latents")
    assert len(ds) == 30 and ds.shape == (4, 8, 8)

    native = list(ds.epoch(batch_size=4, seed=7))
    order = np.random.default_rng(7).permutation(len(ds)).astype(np.int64)
    fallback = list(ds._epoch_numpy(order, 4))
    assert len(native) == len(fallback) == 7
    got = sorted(native, key=lambda b: b.sum())
    want = sorted(fallback, key=lambda b: b.sum())
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_epoch_covers_data(shards):
    d, items = shards
    ds = ShardDataset.from_dir(str(d), key_prefix="latents")
    seen = np.concatenate([b.reshape(-1) for b in ds.epoch(batch_size=5, seed=1)])
    all_vals = np.concatenate([v.reshape(-1) for v in items.values()])
    np.testing.assert_allclose(np.sort(seen), np.sort(all_vals))
