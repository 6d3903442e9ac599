"""Minimal-repro ladder for the two round-3 axon compile crashes.

Both crashes kill the remote compile helper with NO Python traceback
(~10 min in) on the full SDXL train graph:
  1. ``LYCORIS_TPU_FLASH_DT=1``  (D-major flash operands, ops/attention.py)
  2. ``LYCORIS_TPU_GEGLU=concat`` (custom-vjp GEGLU backward concat,
     functional/general.py)

This script rebuilds the suspect subgraph at increasing scale so the
triggering pattern can be bisected WITHOUT ten-minute full-model compiles:
a stack of remat'ed Transformer2DModel instances (the exact module the SDXL
step remats) under the production "attn_ff" save policy, differentiated, and
AOT-compiled. Usage:

  REPRO_CASE=flash_dt  python tools/profiling/repro_compile_crash.py
  REPRO_CASE=geglu_concat REPRO_BLOCKS=4 python ...

Env knobs: REPRO_CASE (flash_dt | geglu_concat | baseline), REPRO_BLOCKS
(stack depth, default 1), REPRO_CH (default 640), REPRO_HW (latent side,
default 64 -> T=4096), REPRO_DEPTH (transformer depth per block, default 2),
REPRO_REMAT (tier, default attn_ff), REPRO_BATCH (default 4).
Prints COMPILED ok + wall time, or dies the way the full graph does.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/lycoris_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

CASE = os.environ.get("REPRO_CASE", "flash_dt")
if CASE == "flash_dt":
    os.environ["LYCORIS_TPU_FLASH_DT"] = "1"
elif CASE == "geglu_concat":
    os.environ["LYCORIS_TPU_GEGLU"] = "concat"
elif CASE == "geglu_dus":
    os.environ["LYCORIS_TPU_GEGLU"] = "dus"

BLOCKS = int(os.environ.get("REPRO_BLOCKS", "1"))
CH = int(os.environ.get("REPRO_CH", "640"))
HW = int(os.environ.get("REPRO_HW", "64"))
DEPTH = int(os.environ.get("REPRO_DEPTH", "2"))
REMAT = os.environ.get("REPRO_REMAT", "attn_ff")
BATCH = int(os.environ.get("REPRO_BATCH", "4"))
CTX_DIM = 2048
HEAD_DIM = 64

import flax.linen as nn  # noqa: E402

from lycoris_tpu.models import unet as U  # noqa: E402


class Stack(nn.Module):
    @nn.compact
    def __call__(self, x, ctx):
        tiers = {
            "attn_out": ("attn_out", "attn_lse"),
            "attn_ff": ("attn_out", "attn_lse", "ff_out", "attn_proj_out"),
        }
        if REMAT in tiers:
            T = nn.remat(
                U.Transformer2DModel,
                policy=jax.checkpoint_policies.save_only_these_names(*tiers[REMAT]),
            )
        elif REMAT == "plain":
            T = nn.remat(U.Transformer2DModel)
        else:
            T = U.Transformer2DModel
        for i in range(BLOCKS):
            x = T(CH, DEPTH, CTX_DIM, CH // HEAD_DIM, 32, jnp.bfloat16,
                  name=f"t{i}")(x, ctx)
        return x


def main():
    print(f"[repro] case={CASE} blocks={BLOCKS} ch={CH} hw={HW} depth={DEPTH} "
          f"remat={REMAT} b={BATCH} backend={jax.default_backend()}",
          flush=True)
    model = Stack()
    x = jnp.zeros((BATCH, CH, HW, HW), jnp.bfloat16)
    ctx = jnp.zeros((BATCH, 77, CTX_DIM), jnp.bfloat16)
    variables = jax.eval_shape(model.init, jax.random.key(0), x, ctx)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        variables,
    )

    def loss_fn(params, x, ctx):
        y = model.apply({"params": params}, x, ctx)
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    step = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.time()
    print("[repro] lowering...", flush=True)
    lowered = step.lower(variables["params"], x, ctx)
    print(f"[repro] lowered in {time.time()-t0:.1f}s; compiling...", flush=True)
    t1 = time.time()
    compiled = lowered.compile()
    print(f"[repro] COMPILED ok in {time.time()-t1:.1f}s", flush=True)
    if os.environ.get("REPRO_RUN", "1") == "1":
        val, _ = compiled(variables["params"], x, ctx)
        print(f"[repro] RAN ok, loss={float(val):.6f}", flush=True)


if __name__ == "__main__":
    main()
