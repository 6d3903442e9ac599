"""Benchmark: adapter fine-tune steps/sec on one TPU chip.

Reference baseline (BASELINE.md / docs/Guidelines.md:54-84): SD1.x, batch 8,
RTX 4090 — LoRA attn-mlp dim8 trains 49622 steps in ~4h ⇒ ~3.45 it/s.
This bench runs the equivalent workload TPU-natively: an SD1.5-config UNet
(bf16, channels-first), 64x64 latents (512px), batch 8, LoKr factor=8
adapters on the attn-mlp preset, jitted DDPM eps-MSE train step.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "steps/sec/chip", "vs_baseline": N}
``vs_baseline`` is our steps/sec over the reference's 3.45 it/s (same batch,
same model scale, per accelerator). Env knobs: BENCH_ALGO (lokr|loha|lora),
BENCH_BATCH, BENCH_ITERS, BENCH_SDXL=1 for the SDXL config at 1024px scale.
"""

import faulthandler
import json
import os
import signal
import sys

faulthandler.register(signal.SIGUSR1)

import jax
import jax.numpy as jnp

# persistent compile cache: repeated bench runs skip the multi-minute compile
jax.config.update("jax_compilation_cache_dir", "/tmp/lycoris_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


# RTX4090, SD1.5, batch 8, 49622 steps (docs/Guidelines.md:59-84): per-algo
# attn-mlp rows — LoRA dim8 4h, LoHa dim16 4h10m, LoKr full factor8 3h40m
REFERENCE_IT_PER_S = {"lora": 3.45, "loha": 3.31, "lokr": 3.76}


def main():
    algo = os.environ.get("BENCH_ALGO", "lokr")
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    use_sdxl = os.environ.get("BENCH_SDXL", "0") == "1"

    from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
    from lycoris_tpu.models.unet import UNet2DConditionModel, sd15_config, sdxl_config
    from lycoris_tpu.parallel import sharding as shd
    from lycoris_tpu.trainer import DiffusionTrainer

    LycorisNetwork.reset_preset()
    merged = os.environ.get("BENCH_MERGED", "1") == "1"
    # defaults: SD1.5 fits batch 8 without remat once flash attention frees
    # the T^2 activations (measured 4.09 vs 3.39 steps/s); SDXL needs remat but
    # only on the transformer blocks (b2: 2.03 vs 1.94 full-remat steps/s;
    # remat=0 OOMs at 18.5G/15.75G)
    remat_env = os.environ.get("BENCH_REMAT", "transformer" if use_sdxl else "0")
    remat = {"0": False, "1": True, "transformer": "transformer"}.get(remat_env, remat_env)
    if use_sdxl:
        cfg = sdxl_config(dtype=jnp.bfloat16, remat=remat)
        latent_hw = 128
    else:
        cfg = sd15_config(dtype=jnp.bfloat16, remat=remat)
        latent_hw = 64

    model = UNet2DConditionModel(cfg)
    rng = jax.random.key(0)
    latents = jnp.zeros((batch, 4, latent_hw, latent_hw), jnp.bfloat16)
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, 77, cfg.context_dim), jnp.bfloat16)

    print(f"[bench] init {'sdxl' if use_sdxl else 'sd15'} unet...", file=sys.stderr)
    variables = jax.eval_shape(lambda r: model.init(r, latents, t, ctx), rng)
    # materialize params without a full random init pass (zeros are fine for
    # a throughput bench), directly in the train dtype: creating fp32 zeros
    # first would transiently hold 2x the params in HBM (OOMs SDXL on 16GB)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        variables,
    )

    graph = ModelGraph.from_linen(model, variables, latents, t, ctx)
    # attn-mlp workload: adapt ONLY the transformer blocks, matching the
    # reference's benchmark row (docs/Guidelines.md:62 "LoRA attn-mlp dim8")
    LycorisNetwork.apply_preset({"target_module": ["Transformer2DModel"]})
    net = create_lycoris(
        graph, 1.0, linear_dim=8, linear_alpha=4.0,
        algo=algo, factor=8, rng=rng,
    )
    LycorisNetwork.reset_preset()
    n_mod = len(net.loras)
    print(f"[bench] {n_mod} adapter modules ({algo})", file=sys.stderr)

    mesh = shd.make_mesh()
    merge_mode = os.environ.get("BENCH_MERGE_MODE", "interceptor")
    tr = DiffusionTrainer(model, variables, net, lr=1e-4, mesh=mesh,
                          weight_dtype=jnp.bfloat16, merged_forward=merged,
                          merge_mode=merge_mode)
    batch_data = {"latents": latents, "context": ctx}

    print("[bench] compiling + warmup...", file=sys.stderr)
    steps_per_sec, loss = tr.benchmark(batch_data, rng, warmup=3, iters=iters)
    n_chips = max(1, len(jax.devices()))
    per_chip = steps_per_sec / 1.0  # mesh is single-chip on the bench runner

    result = {
        "metric": f"{'sdxl' if use_sdxl else 'sd15'}-{algo}-attnmlp-dim8-b{batch} train steps/sec/chip",
        "value": round(per_chip, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": round(per_chip / REFERENCE_IT_PER_S.get(algo, 3.45), 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
