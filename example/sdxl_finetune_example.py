"""BASELINE config #4 end-to-end: LoKr factor-8 on an SDXL-config UNet +
text encoders — fine-tune a few steps, save the adapter, merge, and run
DDIM inference with the merged weights.

Runs on one TPU chip (synthetic weights/latents; pass --tiny for a CPU smoke
run). The same flow with real checkpoints only changes how ``variables`` are
loaded.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true", help="CPU smoke mode")
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--batch", type=int, default=1)
    args = parser.parse_args()

    from lycoris_tpu import ModelGraph
    from lycoris_tpu.kohya import LycorisNetworkKohya, create_network
    from lycoris_tpu.models.clip import CLIPTextModel, tiny_clip_config
    from lycoris_tpu.models.unet import (
        UNet2DConditionModel,
        sdxl_config,
        tiny_unet_config,
    )
    from lycoris_tpu.sampler import make_ddim_sampler
    from lycoris_tpu.trainer import DiffusionTrainer

    rng = jax.random.key(0)
    if args.tiny:
        ucfg = tiny_unet_config()
        latent_hw, ctx_len = 8, 6
    else:
        ucfg = sdxl_config(dtype=jnp.bfloat16, remat=True)
        latent_hw, ctx_len = 128, 77
    dtype = ucfg.dtype

    unet = UNet2DConditionModel(ucfg)
    latents = jnp.zeros((args.batch, 4, latent_hw, latent_hw), dtype)
    t = jnp.zeros((args.batch,), jnp.int32)
    ctx = jnp.zeros((args.batch, ctx_len, ucfg.context_dim), dtype)
    uvars = jax.eval_shape(lambda r: unet.init(r, latents, t, ctx), rng)
    uvars = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, dtype if s.dtype == jnp.float32 else s.dtype), uvars
    )
    ugraph = ModelGraph.from_linen(unet, uvars, latents, t, ctx)

    # dual text encoders (SDXL has CLIP-L + CLIP-bigG; tiny stand-ins here)
    tes = []
    te_graphs = []
    for i in range(2):
        te = CLIPTextModel(tiny_clip_config())
        ids = jnp.zeros((args.batch, 8), jnp.int32)
        tvars = te.init(jax.random.fold_in(rng, i), ids)
        tes.append((te, tvars))
        te_graphs.append(ModelGraph.from_linen(te, tvars, ids))

    net = create_network(
        1.0, 8, 4.0, None, te_graphs, ugraph,
        algo="lokr", factor=8, preset="attn-mlp", rng=rng,
    )
    net.apply_to(apply_text_encoder=True, apply_unet=True)
    print(f"UNet adapters: {len(net.unet_loras)}, TE adapters: {len(net.text_encoder_loras)}")

    # fine-tune the UNet adapters a few steps
    unet_sub = net.sub_networks[LycorisNetworkKohya.LORA_PREFIX_UNET]
    trainer = DiffusionTrainer(unet, uvars, unet_sub, lr=1e-4, weight_dtype=dtype)
    data = np.random.default_rng(0)
    for step in range(args.steps):
        batch = {
            "latents": jnp.asarray(data.normal(size=latents.shape), dtype),
            "context": jnp.asarray(data.normal(size=ctx.shape), dtype),
        }
        loss = trainer.train_step(batch, jax.random.fold_in(rng, step))
    print(f"trained {args.steps} steps, final loss {float(loss):.4f}")

    # save the adapter file (kohya format, sshs hash) + merge + sample
    trainer.sync_to_network()
    out = "/tmp/sdxl_lokr.safetensors"
    net.save_weights(out, dtype=np.float16, metadata={})
    print(f"saved {out}")

    merged = net.merge_to()
    sampler = make_ddim_sampler(
        lambda p, x, tt, c: unet.apply({"params": p}, x, tt, c),
        num_inference_steps=4, guidance_scale=1.0,
    )
    x0 = jax.random.normal(jax.random.fold_in(rng, 99), latents.shape, dtype)
    img_latents = jax.jit(sampler)(merged["lora_unet"], x0, ctx)
    print("merged-weight DDIM sample:", img_latents.shape,
          "finite:", bool(jnp.isfinite(img_latents.astype(jnp.float32)).all()))


if __name__ == "__main__":
    main()
