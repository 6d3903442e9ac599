"""Collective accounting for the sharded train step (VERDICT r1 weak #6).

The DP/model-parallel cost model is implicit in GSPMD's partitioning; these
tests pin it down by counting collectives in the OPTIMIZED HLO of the real
``DiffusionTrainer`` step on the 8-device CPU mesh:

1. pure DP (8, 1): gradient sync exists (≥1 all-reduce) and there are NO
   per-layer weight all-gathers — replicated base params must not be
   re-materialized collectively.
2. data×model (4, 2): sharded base params imply weight all-gathers (the
   ZeRO-3-style implicit cost); their count must stay bounded by the
   number of sharded leaves (no quadratic blow-up or per-use re-gather
   beyond XLA's CSE).

Reference analog: none (single-GPU reference, SURVEY §2.4); this pins the
net-new TPU distributed semantics.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
from lycoris_tpu.models.unet import UNet2DConditionModel, tiny_unet_config
from lycoris_tpu.parallel import sharding as shd
from lycoris_tpu.trainer import DiffusionTrainer


@pytest.fixture(autouse=True)
def reset_preset():
    yield
    LycorisNetwork.reset_preset()


def _trainer(mesh, shard_base=False, batch=8):
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(cfg)
    rng = jax.random.key(0)
    latents = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 4, 8, 8))
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 6, cfg.context_dim))
    variables = model.init(rng, latents, t, ctx)
    graph = ModelGraph.from_linen(model, variables, latents, t, ctx)
    net = create_lycoris(graph, 1.0, 4, 1.0, algo="lokr", factor=4, rng=rng)
    tr = DiffusionTrainer(
        model, variables, net, lr=1e-3, mesh=mesh,
        weight_dtype=jnp.float32, shard_base=shard_base,
    )
    batch_d = shd.shard_batch({"latents": latents, "context": ctx}, mesh)
    return tr, batch_d


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1, "f64": 8}


def _shape_bytes(sig: str) -> int:
    """Bytes of the first shape in an HLO result signature like
    ``f32[64,4,3,3]{...}`` or a tuple thereof."""
    m = re.search(r"(\w+)\[([\d,]*)\]", sig)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def _collective_counts(tr, batch, big_bytes=2**20):
    lowered = tr._step_fn.lower(
        tr.adapter_params, tr.adapter_buffers, tr.opt_state,
        tr.base_params, batch, jax.random.key(1),
    )
    hlo = lowered.compile().as_text()
    counts = {
        kind: len(re.findall(rf"\b{kind}(?:-start)?\(", hlo))
        for kind in ("all-reduce", "all-gather", "reduce-scatter", "collective-permute")
    }
    # big all-gathers: result tensor ≥ big_bytes (weight rematerialization);
    # small ones are loss/stat/grad-sync plumbing
    big = 0
    for line in hlo.splitlines():
        m = re.search(r"=\s*(.+?)\s+all-gather(?:-start)?\(", line)
        if m and _shape_bytes(m.group(1)) >= big_bytes:
            big += 1
    counts["all-gather-big"] = big
    return counts


def test_dp_collectives_are_grad_sync_only():
    mesh = shd.make_mesh(data=8, model=1)
    tr, batch = _trainer(mesh)
    counts = _collective_counts(tr, batch)
    # gradient sync must exist; XLA may keep it as one fused all-reduce or a
    # few (it groups by dtype/shape class)
    assert counts["all-reduce"] >= 1, counts
    n_grad_leaves = len(jax.tree_util.tree_leaves(tr.adapter_params))
    assert counts["all-reduce"] <= n_grad_leaves + 2, counts
    # replicated base weights must NOT be all-gathered every layer
    assert counts["all-gather"] == 0, counts


def test_data_model_collectives_bounded():
    mesh = shd.make_mesh(data=4, model=2)
    tr, batch = _trainer(mesh, shard_base=True)
    counts = _collective_counts(tr, batch)
    assert counts["all-reduce"] >= 1, counts
    # sharded base leaves are all-gathered at use (fwd + bwd replay ≈ ≤4 per
    # leaf); observed on the tiny fixture: 36 total gathers but only the
    # LARGE ones move weight-scale bytes — the rest are KB-scale grad/stat
    # replication plumbing. Bound the expensive class per sharded leaf.
    leaves = jax.tree_util.tree_leaves(tr.base_params)
    n_sharded = sum(
        1 for x in leaves if any(d is not None for d in tuple(x.sharding.spec))
    )
    assert n_sharded >= 1, "fixture must shard at least one base leaf"
    assert counts["all-gather-big"] <= 4 * n_sharded, (n_sharded, counts)

    # and the step still runs to a finite loss on the mesh
    loss = float(tr.train_step({k: v for k, v in batch.items()}, jax.random.key(2)))
    assert jnp.isfinite(loss)
