"""Base-weight sharding memory-footprint tests (SURVEY §7 build item 7).

Proves ``shard_base=True`` actually reduces per-device parameter bytes —
not just that the specs parse:

1. materialized: on a (1, 8) mesh ``shard_base_params`` stores exactly 1/8
   of each big tensor per device (``addressable_shards`` inspection).
2. SDXL-config UNet (abstract, no 10 GB materialization on the CPU mesh):
   per-device bytes under the real ``NamedSharding.shard_shape`` division
   land near total/8 — the multi-chip memory headroom for bigger SDXL
   batches that one 16 GB chip doesn't have.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lycoris_tpu.parallel import sharding as shd
from jax.sharding import NamedSharding


def test_shard_base_params_materialized_footprint():
    mesh = shd.make_mesh(data=1, model=8)
    params = {
        "big": jnp.zeros((1024, 512)),   # sharded: dim0 divisible by 8
        "small": jnp.zeros((16,)),        # replicated: under min_size
    }
    sharded, specs = shd.shard_base_params(params, mesh, min_size=2**12)
    big = sharded["big"]
    assert len(big.addressable_shards) == 8
    per_dev = big.addressable_shards[0].data.nbytes
    assert per_dev == big.nbytes // 8, (per_dev, big.nbytes)
    # distinct shards, not 8 replicas
    assert {tuple(s.index) for s in big.addressable_shards} != {tuple(big.addressable_shards[0].index)} or True
    assert len({str(s.index) for s in big.addressable_shards}) == 8
    small = sharded["small"]
    assert small.addressable_shards[0].data.nbytes == small.nbytes


def test_sdxl_unet_sharded_param_bytes():
    from lycoris_tpu.models.unet import UNet2DConditionModel, sdxl_config

    mesh = shd.make_mesh(data=1, model=8)
    cfg = sdxl_config(dtype=jnp.bfloat16)
    model = UNet2DConditionModel(cfg)
    rng = jax.random.key(0)
    latents = jax.ShapeDtypeStruct((1, 4, 128, 128), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((1, 77, cfg.context_dim), jnp.bfloat16)
    variables = jax.eval_shape(model.init, rng, latents, t, ctx)
    params = variables["params"]

    leaves = jax.tree_util.tree_leaves(params)
    total = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in leaves)
    assert total > 4e9, f"SDXL-config UNet should be >2B params, got {total/2:.2e}"

    sharded = 0
    worst_big_ratio = 0.0
    for x in leaves:
        spec = shd.base_param_spec(x, mesh)
        # the REAL GSPMD division this sharding produces per device
        shard_shape = NamedSharding(mesh, spec).shard_shape(x.shape)
        nbytes = int(np.prod(shard_shape)) * x.dtype.itemsize
        sharded += nbytes
        full = int(np.prod(x.shape)) * x.dtype.itemsize
        if full >= 2**20:  # every ≥1 MiB tensor must actually split 8-way
            worst_big_ratio = max(worst_big_ratio, nbytes / full)
    assert worst_big_ratio <= 1 / 8 + 1e-9, f"a big tensor stayed replicated ({worst_big_ratio})"
    # aggregate: within 2x of the ideal 1/8 (small replicated leaves allowed)
    assert sharded <= total / 4, f"per-device {sharded/2**30:.2f} GiB vs total {total/2**30:.2f} GiB"
    ratio = sharded / total
    print(f"[shard-memory] per-device/total = {ratio:.4f} (ideal 0.125)")
