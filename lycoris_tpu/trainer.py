"""Minimal TPU diffusion fine-tune trainer — the kohya train-loop equivalent.

The reference delegates training to kohya sd-scripts (README.md:96-116); this
module provides the TPU-native slice needed to fine-tune and benchmark:
- a DDPM noise schedule + epsilon-prediction MSE loss (what kohya's SD
  training loop computes),
- a single jitted train step differentiating ONLY the adapter param tree
  (frozen base params are a closed-over constant input),
- GSPMD sharding: batch over the ``data`` mesh axis, frozen base optionally
  sharded over ``model``, adapters + opt state replicated
  (lycoris_tpu.parallel.sharding).

Everything — base forward, adapter deltas, dropout, loss, optax update — is
one XLA computation per step.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jax.sharding import NamedSharding, PartitionSpec as P

from .parallel import sharding as shd


# ---------------------------------------------------------------------------
# DDPM schedule (linear beta, eps-prediction — kohya SD default)
# ---------------------------------------------------------------------------


def ddpm_alphas_cumprod(num_steps: int = 1000, beta_start=0.00085, beta_end=0.012):
    """Returns a HOST (numpy) array on purpose: the schedule is closed over by
    the jitted step, and a closed-over jax.Array becomes an MLIR constant whose
    value is pulled back through the remote runtime at LOWERING time — on the
    axon tunnel that single 4 KB `_value` fetch measured 25+ minutes of stall
    (r5; the CLAUDE.md "never close over device arrays" rule applied to the
    one leaf that had been missed). A numpy constant embeds directly."""
    import numpy as np

    betas = np.linspace(beta_start**0.5, beta_end**0.5, num_steps, dtype=np.float32) ** 2
    return np.cumprod((1.0 - betas).astype(np.float32), dtype=np.float32)


class DiffusionTrainer:
    """Fine-tune adapters on a UNet with an eps-prediction MSE objective."""

    def __init__(
        self,
        model,
        variables,
        net,  # LycorisNetwork (or kohya unet sub-network)
        lr: float = 1e-4,
        optimizer=None,
        mesh=None,
        num_train_timesteps: int = 1000,
        weight_dtype=jnp.bfloat16,
        shard_base: bool = False,
        param_groups=None,  # optional LoRA+-style [(label, tree, lr)] groups
        merged_forward: bool = True,  # one matmul per layer (W+ΔW) instead of
        # the reference's base+delta two-matmul pattern; disable when stacking
        merge_mode: str = "interceptor",  # "interceptor" | "premerge" (merge
        # the whole param tree up front inside the step, then run the plain
        # model — lets XLA schedule all adapter rebuilds concurrently)
        scale_weight_norms: float | None = None,  # kohya --scale_weight_norms:
        # per-step max-norm regularization of every adapter's effective weight
        # (reference kohya.py:637-650). Runs INSIDE the jitted step: the
        # post-optimizer adapter tree is rescaled and (count, mean, max) stats
        # land in ``self.max_norm_stats`` as device scalars.
        auto_layout: bool | None = None,  # compile with Layout.AUTO for the
        # frozen base params and device_put them into the executable's
        # preferred layouts, avoiding a per-step HBM relayout copy per conv
        # weight. Default (None): enabled on single-device TPU meshes — the
        # measured configuration (fresh AND cache-deserialized warm runs
        # verified on v5e; a round-1 jax call-time layout-check rejection on
        # deserialized executables no longer reproduces, and minimal repros
        # of the suspected size-1-dim canonicalization mismatch all pass).
        # train_step still detects a layout rejection and falls back to the
        # plain jit path automatically, so a regression degrades gracefully.
    ):
        self.merged_forward = merged_forward
        self.merge_mode = merge_mode
        self.scale_weight_norms = scale_weight_norms
        self.max_norm_stats = None  # (keys_scaled, mean_norm, max_norm) device scalars
        if auto_layout is None:
            try:
                auto_layout = (
                    jax.default_backend() in ("tpu", "axon")
                    and (mesh is None or mesh.size == 1)
                )
            except Exception:
                auto_layout = False
        self.auto_layout = auto_layout
        self._compiled = None
        self._compiled_shapes = None
        self.model = model
        self.net = net
        self.mesh = mesh if mesh is not None else shd.make_mesh()
        self.alphas_cumprod = ddpm_alphas_cumprod(num_train_timesteps)
        self.num_train_timesteps = num_train_timesteps
        self.weight_dtype = weight_dtype

        params = variables["params"] if "params" in variables else variables
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, weight_dtype), params)
        if shard_base and self.mesh.shape.get("model", 1) > 1:
            self.base_params, self.base_specs = shd.shard_base_params(params, self.mesh)
        else:
            self.base_params = shd.replicate(params, self.mesh)
            self.base_specs = shd.replicated_spec_tree(params)

        # deep-copy: the jitted step donates these buffers, and device_put
        # aliases when the sharding already matches — donating the network's
        # own param arrays would invalidate net.merge_to()/state_dict()
        adapter_tree = jax.tree_util.tree_map(jnp.array, net.trainable_params())

        # LYCORIS_TPU_FLAT_OPT=1: run the optimizer over ONE flat vector
        # instead of ~3 tiny leaves per module — the SD1.5 r3 profile shows
        # ~10 ms/step of sub-µs-work 2-D ops (per-leaf adam chains + their
        # output buffers). The tree is re-materialized inside the step via
        # ravel_pytree's unravel (slices fuse into their consumers); the
        # step's adapter output is the single flat buffer.
        self._unravel = None
        flat_opt = os.environ.get("LYCORIS_TPU_FLAT_OPT", "0") == "1"
        if flat_opt:
            leaves = jax.tree_util.tree_leaves(adapter_tree)
            if leaves and all(l.dtype == leaves[0].dtype for l in leaves):
                from jax.flatten_util import ravel_pytree

                flat, self._unravel = ravel_pytree(adapter_tree)
                adapter_tree = flat
        self.adapter_params = shd.replicate(adapter_tree, self.mesh)
        # non-trainable adapter buffers (alpha, scalar, zero-init factors)
        # MUST be jit arguments, not closure constants: 192 modules' worth of
        # embedded constants bloat the HLO and stall lowering on device→host
        # fetches (ir_constant pulls values through the runtime)
        trainable_keys = {l.lora_name: l.trainable for l in net.loras}
        self.adapter_buffers = shd.replicate(
            {
                l.lora_name: {
                    k: v for k, v in l.params.items() if k not in trainable_keys[l.lora_name]
                }
                for l in net.loras
            },
            self.mesh,
        )
        if optimizer is None:
            optimizer = optax.adamw(lr)
        self.optimizer = optimizer
        self.opt_state = shd.replicate(self.optimizer.init(self.adapter_params), self.mesh)
        self._step_fn = self._build_step()
        self.step = 0

    # -- the jitted step ------------------------------------------------------
    def _build_step(self):
        mesh = self.mesh
        model = self.model
        net = self.net
        alphas_cumprod = self.alphas_cumprod
        optimizer = self.optimizer
        wd = self.weight_dtype

        unravel = self._unravel

        def loss_fn(adapter_params, buffers, base_params, batch, rng):
            if unravel is not None:
                adapter_params = unravel(adapter_params)
            latents = batch["latents"].astype(wd)
            context = batch["context"].astype(wd)
            added = batch.get("added_cond")
            noise_rng, t_rng, drop_rng = jax.random.split(rng, 3)
            b = latents.shape[0]
            noise = jax.random.normal(noise_rng, latents.shape, dtype=jnp.float32)
            t = jax.random.randint(t_rng, (b,), 0, alphas_cumprod.shape[0])
            # jnp.take keeps the numpy schedule a NUMPY jaxpr constant (plain
            # [t] would fail on a tracer index; wrapping in jnp.asarray would
            # re-create the device-array constant the numpy schedule avoids)
            a = jnp.take(alphas_cumprod, t).reshape(b, 1, 1, 1)
            noisy = (jnp.sqrt(a) * latents.astype(jnp.float32) + jnp.sqrt(1 - a) * noise).astype(wd)

            # full adapter tree = buffers overlaid with trainable leaves
            full_tree = {ln: {**buffers.get(ln, {}), **sub} for ln, sub in adapter_params.items()}

            kwargs = {}
            if added is not None:
                kwargs["added_cond"] = added.astype(wd)
            if self.merge_mode == "premerge":
                merged = net.traced_merge(base_params, full_tree)
                pred = model.apply({"params": merged}, noisy, t, context, **kwargs)
            else:
                pred = net(
                    {"params": base_params},
                    noisy,
                    t,
                    context,
                    adapter_params=full_tree,
                    train=True,
                    rng=drop_rng,
                    model=model,
                    merged_forward=self.merged_forward,
                    **kwargs,
                )
            return jnp.mean((pred.astype(jnp.float32) - noise) ** 2)

        max_norm = self.scale_weight_norms

        def step_fn(adapter_params, buffers, opt_state, base_params, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(adapter_params, buffers, base_params, batch, rng)
            updates, opt_state = optimizer.update(grads, opt_state, adapter_params)
            adapter_params = optax.apply_updates(adapter_params, updates)
            if not max_norm:
                return adapter_params, opt_state, loss
            # kohya-contract max-norm regularization, fused into the same XLA
            # program (reference kohya.py:637-650 runs it per step after the
            # optimizer). Scaled leaves may live in either tree: 'scalar' is a
            # buffer when use_scalar=False, a trainable leaf otherwise.
            tree = unravel(adapter_params) if unravel is not None else adapter_params
            full = {ln: {**buffers.get(ln, {}), **sub} for ln, sub in tree.items()}
            upd, flags, norms = net.apply_max_norm_traced(full, max_norm)
            adapter_params = {
                ln: {k: upd.get(ln, {}).get(k, v) for k, v in sub.items()}
                for ln, sub in tree.items()
            }
            if unravel is not None:
                from jax.flatten_util import ravel_pytree

                adapter_params = ravel_pytree(adapter_params)[0]
            buffers = {
                ln: {k: upd.get(ln, {}).get(k, v) for k, v in sub.items()}
                for ln, sub in buffers.items()
            }
            stats = (
                jnp.sum(flags),
                jnp.mean(norms) if norms.size else jnp.float32(0),
                jnp.max(norms) if norms.size else jnp.float32(0),
            )
            return adapter_params, opt_state, loss, buffers, stats

        rep = NamedSharding(mesh, P())
        self._raw_step_fn = step_fn
        self._out_shardings = tuple([rep] * (5 if max_norm else 3))
        return jax.jit(
            step_fn,
            out_shardings=self._out_shardings,
            donate_argnums=(0, 2),  # adapter params + opt state (NOT buffers)
        )

    def _compile_auto_layout(self, batch, rng):
        """AOT-compile the step with Layout.AUTO on the frozen base params and
        move them into the executable's preferred layouts.

        Without this the compiled program relayouts large conv weights from
        row-major to its preferred tiling every step (visible as copy-start/
        copy-done pairs in the profile). One-time device_put instead."""
        try:
            from jax.experimental.layout import Format, Layout
        except ImportError:  # older jax — keep the plain jit path
            self.auto_layout = False
            return
        auto = jax.tree_util.tree_map(lambda _: Format(Layout.AUTO), self.base_params)
        fn = jax.jit(
            self._raw_step_fn,
            in_shardings=(None, None, None, auto, None, None),
            out_shardings=self._out_shardings,
            donate_argnums=(0, 2),
        )
        base_abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            self.base_params,
        )
        compiled = fn.lower(
            self.adapter_params, self.adapter_buffers, self.opt_state,
            base_abstract, batch, rng,
        ).compile()
        base_formats = compiled.input_formats[0][3]

        # device_put SILENTLY IGNORES major_to_minor when the requested Layout
        # carries explicit tiling (measured on jax/axon: Format(Layout((1,0),
        # tiling=((8,128),(2,1)))) leaves the array at (0,1)). input_formats
        # reports tiling-explicit layouts, so any non-default layout the
        # executable asks for (e.g. column-major weights on the factored-grad
        # graph) would be dropped and the call rejected. Strip tiling — the
        # dim order is what matters; the backend re-derives canonical tiling.
        # Relayout is a real HBM copy, and the caller's original tree usually
        # stays alive (aliased) — so every moved tensor costs its size in HBM
        # for the rest of the run. Measured on SDXL b4: the executable asks
        # for 701/1676 tensors (3.23 of 4.77 GiB) column-major, +~0.1 %
        # steps/s — not worth the OOM risk. SD1.5 moves ~0.4 GiB for +~1 %.
        # Budget-gate the copy; over budget, fall back to the plain jit path.
        moved = jax.tree_util.tree_map(
            lambda x, f: (
                x.nbytes
                if tuple(f.layout.major_to_minor) != tuple(range(x.ndim - 1, -1, -1))
                else 0
            ),
            self.base_params, base_formats,
        )
        moved_bytes = sum(jax.tree_util.tree_leaves(moved))
        budget = float(os.environ.get("LYCORIS_TPU_RELAYOUT_BUDGET_GB", "1.5"))
        # LYCORIS_TPU_RELAYOUT_INPLACE (default ON, r3-ADOPTED +2% on SDXL
        # b4 1.293→1.316/1.319): relayout tensor-by-tensor and FREE each
        # source immediately, so steady-state extra HBM ≈ 0 (transient = one
        # tensor ≤ ~30 MB). Semantics match jit donation: any outside alias
        # of a relayouted base leaf is invalidated (loud "deleted array"
        # error, not corruption) — only reachable here under auto_layout,
        # i.e. single-device meshes. Opt out with
        # LYCORIS_TPU_RELAYOUT_INPLACE=0 (keeps the budget-gated aliased
        # copy). Motivation: the SDXL profile shows ~38 ms/step of per-step
        # weight relayout copies ([10240,1280]{0,1} etc) feeding the matmul
        # fusions when the budget gate declines the 3.23 GiB aliased copy.
        inplace = os.environ.get("LYCORIS_TPU_RELAYOUT_INPLACE", "1") == "1"
        if moved_bytes > budget * 2**30 and not inplace:
            from .logging import logger

            logger.info(
                "auto_layout: executable wants %.2f GiB of base params "
                "relayouted (budget %.1f GiB) — keeping the plain jit path",
                moved_bytes / 2**30, budget,
            )
            self.auto_layout = False
            return

        def _relayout(x, f):
            want = Format(Layout(major_to_minor=f.layout.major_to_minor), f.sharding)
            return jax.device_put(x, want)

        if inplace:
            leaves, treedef = jax.tree_util.tree_flatten(self.base_params)
            fleaves = treedef.flatten_up_to(base_formats)
            out = []
            for x, f in zip(leaves, fleaves):
                y = _relayout(x, f)
                if y is not x:
                    jax.block_until_ready(y)
                    x.delete()
                out.append(y)
            self.base_params = jax.tree_util.tree_unflatten(treedef, out)
        else:
            self.base_params = jax.tree_util.tree_map(
                _relayout, self.base_params, base_formats
            )
        self._compiled = compiled
        self._compiled_shapes = jax.tree_util.tree_map(jnp.shape, batch)

    def train_step(self, batch, rng):
        batch = shd.shard_batch(batch, self.mesh)
        if self.auto_layout and self._compiled is None:
            self._compile_auto_layout(batch, rng)
        fn = self._step_fn
        if self._compiled is not None and self._compiled_shapes == jax.tree_util.tree_map(
            jnp.shape, batch
        ):
            fn = self._compiled
        try:
            out = fn(
                self.adapter_params, self.adapter_buffers, self.opt_state,
                self.base_params, batch, rng,
            )
        except ValueError as e:
            if fn is not self._compiled or "layout" not in str(e).lower():
                raise
            # cache-deserialized AOT executable rejected our relayouted
            # params (layout canonicalization mismatch, see auto_layout doc).
            # Drop back to the plain jit path permanently; it accepts the
            # params in whatever layout they currently have.
            from .logging import logger

            logger.warning(
                "auto_layout executable rejected the relayouted base params; "
                "falling back to the plain jit step"
            )
            self._compiled = None
            self.auto_layout = False
            out = self._step_fn(
                self.adapter_params, self.adapter_buffers, self.opt_state,
                self.base_params, batch, rng,
            )
        if self.scale_weight_norms:
            (self.adapter_params, self.opt_state, loss,
             self.adapter_buffers, self.max_norm_stats) = out
        else:
            self.adapter_params, self.opt_state, loss = out
        self.step += 1
        return loss

    def adapter_tree(self):
        """Adapter params as the per-module tree (unravels the flat-optimizer
        vector when LYCORIS_TPU_FLAT_OPT is active)."""
        if self._unravel is not None:
            return self._unravel(self.adapter_params)
        return self.adapter_params

    def sync_to_network(self):
        """Write trained adapter params back into the network modules."""
        host = jax.device_get(self.adapter_tree())
        for ln, sub in host.items():
            self.net.lora_map[ln].params.update({k: jnp.asarray(v) for k, v in sub.items()})
        if self.scale_weight_norms:
            # max-norm may rescale buffer leaves too (e.g. non-trainable 'scalar')
            host = jax.device_get(self.adapter_buffers)
            for ln, sub in host.items():
                self.net.lora_map[ln].params.update(
                    {k: jnp.asarray(v) for k, v in sub.items()}
                )

    # -- checkpoint / resume (orbax for internal train state; adapter files
    # themselves stay flat safetensors via net.save_weights — SURVEY §5) ------
    def save_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        # adapter params are always checkpointed as the per-module TREE so
        # files stay valid across flat-opt on/off; opt_state layout is
        # mode-specific (flat moments vs per-leaf) and restores within-mode
        state = {
            "adapter_params": jax.device_get(self.adapter_tree()),
            "opt_state": jax.device_get(self.opt_state),
            "step": self.step,
        }
        import os

        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()

    def load_checkpoint(self, path: str):
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = {
            "adapter_params": jax.device_get(self.adapter_tree()),
            "opt_state": jax.device_get(self.opt_state),
            "step": self.step,
        }
        state = ckptr.restore(os.path.abspath(path), target=target)
        tree = state["adapter_params"]
        if self._unravel is not None:
            from jax.flatten_util import ravel_pytree

            tree = ravel_pytree(tree)[0]
        self.adapter_params = shd.replicate(tree, self.mesh)
        self.opt_state = shd.replicate(state["opt_state"], self.mesh)
        self.step = int(state["step"])

    # -- benchmark helper ------------------------------------------------------
    def benchmark(self, batch, rng, warmup: int = 3, iters: int = 10):
        for i in range(warmup):
            loss = self.train_step(batch, jax.random.fold_in(rng, i))
        # pull the scalar to host: step N's loss depends on the whole donated
        # param chain, so this synchronizes everything (block_until_ready can
        # return optimistically on some PJRT runtimes)
        float(loss)
        t0 = time.perf_counter()
        for i in range(iters):
            loss = self.train_step(batch, jax.random.fold_in(rng, 1000 + i))
        final = float(loss)
        dt = time.perf_counter() - t0
        return iters / dt, final
