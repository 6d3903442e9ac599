"""Jitted DDIM sampling — the inference/serving side of the fine-tune loop.

The reference has no inference code (webui/diffusers own it); serving a
LyCORIS-adapted model on TPU wants the whole denoising loop inside ONE XLA
computation: ``lax.fori_loop`` over timesteps, the UNet invoked with either
merged params (zero adapter overhead — ``net.merge_to``) or live adapters
(runtime-switchable multiplier).

Classifier-free guidance batches (uncond, cond) along the batch axis so the
UNet runs once per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .trainer import ddpm_alphas_cumprod


def ddim_timesteps(num_inference_steps: int, num_train_timesteps: int = 1000):
    import numpy as np

    step = num_train_timesteps // num_inference_steps
    # host array on purpose — closed over by the jitted sampler (see
    # make_ddim_sampler's schedule note)
    return (np.arange(num_inference_steps) * step + 1)[::-1].copy()


def make_ddim_sampler(
    apply_fn,
    num_inference_steps: int = 20,
    num_train_timesteps: int = 1000,
    guidance_scale: float = 7.5,
    eta: float = 0.0,
):
    """Build a jittable ``sample(params, latents, ctx, uncond_ctx)`` closure.

    ``apply_fn(params, x, t, ctx)`` is the eps-prediction UNet — e.g.
    ``lambda p, x, t, c: model.apply({"params": p}, x, t, c)`` for merged
    weights, or a ``net(...)``-wrapping closure for live adapters.
    """
    # ddpm_alphas_cumprod returns a HOST numpy array (see trainer.py: a
    # closed-over device array becomes an MLIR constant whose value is pulled
    # through the remote runtime at lowering time); index it with jnp.take so
    # it stays a numpy jaxpr constant under tracing
    alphas_cumprod = ddpm_alphas_cumprod(num_train_timesteps)
    timesteps = ddim_timesteps(num_inference_steps, num_train_timesteps)

    def sample(params, latents, ctx, uncond_ctx=None):
        do_cfg = uncond_ctx is not None
        if do_cfg:
            ctx_all = jnp.concatenate([uncond_ctx, ctx], axis=0)

        def body(i, x):
            t = jnp.take(timesteps, i)
            t_prev = jnp.where(
                i + 1 < num_inference_steps,
                jnp.take(timesteps, i + 1, mode="clip"), 0)
            a_t = jnp.take(alphas_cumprod, t)
            a_prev = jnp.where(t_prev > 0, jnp.take(alphas_cumprod, t_prev), 1.0)

            if do_cfg:
                x_in = jnp.concatenate([x, x], axis=0)
                t_in = jnp.full((x_in.shape[0],), t, jnp.int32)
                eps_all = apply_fn(params, x_in, t_in, ctx_all).astype(jnp.float32)
                eps_u, eps_c = jnp.split(eps_all, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
            else:
                t_in = jnp.full((x.shape[0],), t, jnp.int32)
                eps = apply_fn(params, x, t_in, ctx).astype(jnp.float32)

            x32 = x.astype(jnp.float32)
            x0 = (x32 - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            dir_xt = jnp.sqrt(1 - a_prev - eta**2 * (1 - a_t)) * eps
            x_prev = jnp.sqrt(a_prev) * x0 + dir_xt
            return x_prev.astype(x.dtype)

        return jax.lax.fori_loop(0, num_inference_steps, body, latents)

    return sample
