"""Profile the SD1.5 LoKr b8 train step: trace 3 steps, bucket device time by op kind.

Usage: python /tmp/profile_step.py [outdir]
Env: same knobs as bench.py (BENCH_ALGO, BENCH_BATCH, BENCH_SDXL, ...).
"""

import os
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/lycoris_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_trace"


def build_trainer():
    from lycoris_tpu import LycorisNetwork, ModelGraph, create_lycoris
    from lycoris_tpu.models.unet import UNet2DConditionModel, sd15_config, sdxl_config
    from lycoris_tpu.parallel import sharding as shd
    from lycoris_tpu.trainer import DiffusionTrainer

    algo = os.environ.get("BENCH_ALGO", "lokr")
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    use_sdxl = os.environ.get("BENCH_SDXL", "0") == "1"
    remat_env = os.environ.get("BENCH_REMAT", "transformer" if use_sdxl else "0")
    remat = {"0": False, "1": True, "transformer": "transformer"}.get(remat_env, remat_env)
    LycorisNetwork.reset_preset()
    if use_sdxl:
        cfg = sdxl_config(dtype=jnp.bfloat16, remat=remat); latent_hw = 128
    else:
        cfg = sd15_config(dtype=jnp.bfloat16, remat=remat); latent_hw = 64
    model = UNet2DConditionModel(cfg)
    rng = jax.random.key(0)
    latents = jnp.zeros((batch, 4, latent_hw, latent_hw), jnp.bfloat16)
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, 77, cfg.context_dim), jnp.bfloat16)
    variables = jax.eval_shape(model.init, rng, latents, t, ctx)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        variables)
    graph = ModelGraph.from_linen(model, variables, latents, t, ctx)
    LycorisNetwork.apply_preset({"target_module": ["Transformer2DModel"]})
    net = create_lycoris(graph, 1.0, linear_dim=8, linear_alpha=4.0, algo=algo,
                         factor=int(os.environ.get("BENCH_FACTOR", "8")), rng=rng,
                         bypass_mode=os.environ.get("BENCH_BYPASS", "0") == "1")
    LycorisNetwork.reset_preset()
    tr = DiffusionTrainer(model, variables, net, lr=1e-4, mesh=shd.make_mesh(),
                          weight_dtype=jnp.bfloat16,
                          merged_forward=os.environ.get("BENCH_MERGED", "1") == "1",
                          merge_mode=os.environ.get("BENCH_MERGE_MODE", "interceptor"))
    return tr, {"latents": latents, "context": ctx}


def main():
    tr, batch = build_trainer()
    rng = jax.random.key(0)
    print("[prof] warmup/compile...", file=sys.stderr)
    for i in range(3):
        loss = tr.train_step(batch, jax.random.fold_in(rng, i))
    float(loss)
    print("[prof] tracing 3 steps...", file=sys.stderr)
    with jax.profiler.trace(OUT):
        for i in range(3):
            loss = tr.train_step(batch, jax.random.fold_in(rng, 100 + i))
        float(loss)

    # parse newest xplane
    import glob
    xs = sorted(glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True),
                key=os.path.getmtime)
    pd = jax.profiler.ProfileData.from_serialized_xspace(open(xs[-1], "rb").read())
    buckets = defaultdict(float)
    names = defaultdict(float)
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":  # exclusive decomposition of the step
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                nm = ev.name
                total += dur
                names[nm] += dur
                key = nm.split(".")[0].split("(")[0]
                # strip trailing digits for grouping
                key = key.rstrip("0123456789-_")
                buckets[key] += dur
    rep = [f"== op-kind buckets (3 steps, total {total:.1f} ms) =="]
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:30]:
        rep.append(f"{v/3:9.3f} ms/step  {100*v/total:5.1f}%  {k}")
    rep.append("\n== top individual ops ==")
    for k, v in sorted(names.items(), key=lambda kv: -kv[1])[:40]:
        rep.append(f"{v/3:9.3f} ms/step  {k[:110]}")
    report = "\n".join(rep)
    print(report)
    with open(OUT + "_report.txt", "w") as f:
        f.write(report)


if __name__ == "__main__":
    main()
