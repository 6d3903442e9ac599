"""Multi-chip sharding evidence: collective counts + per-device memory for
the GSPMD train step on a virtual 8-device mesh (VERDICT r3 task 9).

Single-chip SDXL tops out at batch 4 on 16 GB (b8 OOMs by ~1.4 GiB —
docs/Guidelines.md "SDXL specifics"). `DiffusionTrainer(shard_base=True)`
shards every frozen base tensor ≥ 64 KiB over the mesh's model axis
(parallel/sharding.py:48-71), so the per-device base footprint divides by
the model-axis size while adapters/optimizer stay replicated (they are
tiny). This script compiles the REAL SDXL step on an 8-CPU-device mesh and
prints, per configuration:
  - optimized-HLO collective counts (≥1 MiB operands, the test_collectives
    counting rule) — the all-gathers that rematerialize sharded weights ride
    ICI on real hardware;
  - XLA's per-device memory analysis (argument + output + temp + generated
    code), i.e. the number the 16 GB HBM budget actually sees.

Usage (scrubbed CPU env, like the other probes):
  LYCORIS_FORCE_CPU=1 XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/profiling/multichip_evidence.py
Env: EV_BATCH (default 8), EV_DATA/EV_MODEL mesh shape (default 2x4),
EV_SDXL=1 (default).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("LYCORIS_FORCE_CPU", "1")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("BENCH_SDXL", os.environ.get("EV_SDXL", "1"))
os.environ.setdefault("BENCH_BATCH", os.environ.get("EV_BATCH", "8"))
os.environ.setdefault("BENCH_REMAT", "attn_ff")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    import re

    from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
    from lycoris_tpu.models.unet import UNet2DConditionModel, sd15_config, sdxl_config
    from lycoris_tpu.parallel import sharding as shd
    from lycoris_tpu.trainer import DiffusionTrainer

    data = int(os.environ.get("EV_DATA", "2"))
    model_ax = int(os.environ.get("EV_MODEL", "4"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    use_sdxl = os.environ.get("BENCH_SDXL", "1") == "1"
    cfg = (sdxl_config if use_sdxl else sd15_config)(
        dtype=jnp.bfloat16, remat=os.environ.get("BENCH_REMAT", "attn_ff"))
    latent_hw = 128 if use_sdxl else 64
    ctx_dim = cfg.context_dim
    model = UNet2DConditionModel(cfg)
    rng = jax.random.key(0)
    latents = jnp.zeros((batch, 4, latent_hw, latent_hw), jnp.bfloat16)
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, 77, ctx_dim), jnp.bfloat16)
    variables = jax.eval_shape(lambda: model.init(rng, latents, t, ctx))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        variables)
    graph = ModelGraph.from_linen(model, variables, latents, t, ctx)
    LycorisNetwork.apply_preset({"target_module": ["Transformer2DModel"]})
    net = create_lycoris(graph, 1.0, linear_dim=8, linear_alpha=4.0,
                         algo="lokr", factor=8, rng=rng)
    LycorisNetwork.reset_preset()

    mesh = shd.make_mesh(data=data, model=model_ax)
    tr = DiffusionTrainer(model, variables, net, lr=1e-4, mesh=mesh,
                          weight_dtype=jnp.bfloat16, shard_base=True,
                          auto_layout=False)
    # concrete (device-placed, sharded) trees — lowering with bare
    # ShapeDtypeStructs loses the input shardings, GSPMD partitions nothing,
    # and the collective counts silently read zero (first b8 run's mistake)
    batch_data = shd.shard_batch({"latents": latents, "context": ctx}, mesh)
    print(f"[evidence] lowering+compiling {('sdxl' if use_sdxl else 'sd15')} "
          f"b{batch} on ({data},{model_ax}) mesh...", file=sys.stderr)
    lowered = tr._step_fn.lower(
        tr.adapter_params, tr.adapter_buffers, tr.opt_state,
        tr.base_params, batch_data, rng)
    if os.environ.get("EV_SMOKE") == "1":
        # smoke mode (tests/test_profiling_tools.py): construction + trace +
        # lowering is where the r4 launch crash lived; skip the slow compile
        print(json.dumps({"smoke": True, "model": "sdxl" if use_sdxl else "sd15",
                          "batch": batch, "mesh": [data, model_ax]}))
        return
    compiled = lowered.compile()

    hlo = compiled.as_text()
    dtype_bytes = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2,
                   "s16": 2, "u16": 2, "f32": 4, "s32": 4, "u32": 4,
                   "f64": 8, "s64": 8, "u64": 8}
    counts = {}
    for kind in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        total = big = big_bytes = 0
        # e.g. "%all-gather.3 = bf16[640,640]{1,0} all-gather(...)". Post-
        # scheduling HLO commonly emits async pairs (all-gather-start /
        # all-gather-done): match the -start form too (the -done only consumes
        # the start's tuple, so counting starts alone avoids double-counting),
        # and don't cap the result-type string — large tuples overflow any
        # fixed window (r4 advisor finding: counts silently read as zero).
        for m in re.finditer(rf"^\s*%?\S+ = (.*?) {kind}(-start)?\(", hlo, re.M):
            arrays = re.findall(r"([a-z]+\d*)\[([0-9,]*)\]", m.group(1))
            # an async start's result tuple is (inputs..., outputs...): keep
            # the output half so bytes aren't double the sync-form equivalent
            if m.group(2) and len(arrays) % 2 == 0:
                arrays = arrays[len(arrays) // 2:]
            nbytes = 0
            for dt, dims in arrays:
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                nbytes += n * dtype_bytes.get(dt, 4)
            total += 1
            if nbytes >= 2**20:
                big += 1
                big_bytes += nbytes
        if total == 0 and f" {kind}" in hlo:
            print(f"[evidence] WARNING: '{kind}' appears in HLO text but the "
                  "counter matched nothing — regex drift?", file=sys.stderr)
        counts[kind] = {"count": total, "count_ge_1MiB": big,
                        "MiB_ge_1MiB": round(big_bytes / 2**20, 1)}
    mem = compiled.memory_analysis()
    out = {
        "model": "sdxl" if use_sdxl else "sd15",
        "batch": batch,
        "mesh": [data, model_ax],
        "collectives": counts,
        "per_device_bytes": {
            "arguments": getattr(mem, "argument_size_in_bytes", None),
            "output": getattr(mem, "output_size_in_bytes", None),
            "temp": getattr(mem, "temp_size_in_bytes", None),
            "generated_code": getattr(mem, "generated_code_size_in_bytes", None),
        },
        "per_device_total_gib": round(
            (getattr(mem, "argument_size_in_bytes", 0)
             + getattr(mem, "temp_size_in_bytes", 0)
             + getattr(mem, "output_size_in_bytes", 0)) / 2**30, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
