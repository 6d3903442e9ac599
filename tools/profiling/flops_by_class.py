"""Exact per-op-class FLOP table for the roofline accounting.

Walks the jaxpr of the production train step (same builder as
profile_step.py, remat included — the replayed ops appear again in the remat
jaxpr, so recompute is COUNTED) and sums MXU FLOPs per primitive class:
``conv_general_dilated`` and ``dot_general`` (split matmul vs attention-shaped
batched dots). This is the DCE-honest complement to roofline_probe.py's
pre-optimization cost_analysis: frozen-base dW matmuls never appear in the
jaxpr at all (the factored custom_vjp emits zero cotangles for w, and plain
autodiff dW for frozen convs is built then dropped by jax's partial-eval,
not XLA DCE), so the walk counts what actually executes.

Usage (CPU, scrubbed env like bench.py's probes):
  JAX_PLATFORMS=cpu LYCORIS_FORCE_CPU=1 python tools/profiling/flops_by_class.py
  ... BENCH_SDXL=1 BENCH_BATCH=4 BENCH_REMAT=attn_ff python ...

Prints one JSON line: flops by class + totals + ms floors at v5e-1 peak
(197 TFLOP/s bf16).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("LYCORIS_FORCE_CPU", "1")
os.environ["LYCORIS_TPU_FLASH"] = "off"  # count attention as explicit dots

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import profile_step  # noqa: E402


def _dot_flops(eqn):
    lhs, rhs = (v.aval for v in eqn.invars)
    dnums = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dnums
    batch = 1
    for d in lb:
        batch *= lhs.shape[d]
    contract = 1
    for d in lc:
        contract *= lhs.shape[d]
    m = 1
    for i, s in enumerate(lhs.shape):
        if i not in lc and i not in lb:
            m *= s
    n = 1
    for i, s in enumerate(rhs.shape):
        if i not in rc and i not in rb:
            n *= s
    return 2.0 * batch * m * n * contract, batch > 1


def _conv_flops(eqn):
    lhs, rhs = (v.aval for v in eqn.invars)
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    # spatial positions of the output × per-position dot size
    out_spatial = 1
    for d in dn.out_spec[2:]:
        out_spatial *= out.shape[d]
    n = out.shape[dn.out_spec[0]]
    cout = out.shape[dn.out_spec[1]]
    cin = rhs.shape[dn.rhs_spec[1]]
    ksize = 1
    for d in dn.rhs_spec[2:]:
        ksize *= rhs.shape[d]
    groups = eqn.params.get("feature_group_count", 1)
    return 2.0 * n * out_spatial * cout * cin * ksize / max(groups, 1)


def walk(jaxpr, acc, depth=0):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            f, batched = _dot_flops(eqn)
            lhs = eqn.invars[0].aval.shape
            rhs = eqn.invars[1].aval.shape
            # attention-shaped: batched dot where both tensor operands are
            # activations (rank>=3 both sides)
            key = "dot_batched" if batched else "dot_matmul"
            acc[key] = acc.get(key, 0.0) + f
            acc.setdefault("_top", []).append((f, prim, str(lhs), str(rhs)))
        elif prim == "conv_general_dilated":
            f = _conv_flops(eqn)
            acc["conv"] = acc.get("conv", 0.0) + f
            acc.setdefault("_top", []).append(
                (f, prim, str(eqn.invars[0].aval.shape), str(eqn.invars[1].aval.shape))
            )
        # recurse into sub-jaxprs (remat/checkpoint, scan, cond, pjit, custom_vjp)
        for sub in _subjaxprs(eqn.params):
            walk(sub, acc, depth + 1)
    return acc


def _subjaxprs(params):
    """Version-safe extraction of nested jaxprs from eqn params."""
    for v in params.values():
        stack = [v]
        while stack:
            item = stack.pop()
            if isinstance(item, (tuple, list)):
                stack.extend(item)
            elif hasattr(item, "jaxpr") and hasattr(item.jaxpr, "eqns"):
                yield item.jaxpr  # ClosedJaxpr
            elif hasattr(item, "eqns"):
                yield item  # raw Jaxpr


def main():
    tr, batch_data = profile_step.build_trainer()
    rng = jax.random.key(0)
    args = (tr.adapter_params, tr.adapter_buffers, tr.opt_state,
            tr.base_params, batch_data, rng)
    closed = jax.make_jaxpr(tr._step_fn.__wrapped__ if hasattr(tr._step_fn, "__wrapped__")
                            else tr._step_fn)(*args)
    acc = walk(closed.jaxpr, {})
    top = sorted(acc.pop("_top", []), key=lambda t: -t[0])[:15]
    total = sum(v for k, v in acc.items() if not k.startswith("_"))
    out = {
        "model": "sdxl" if os.environ.get("BENCH_SDXL", "0") == "1" else "sd15",
        "batch": int(os.environ.get("BENCH_BATCH", "8")),
        "remat": os.environ.get("BENCH_REMAT", "default"),
        **{k: v for k, v in acc.items()},
        "total_mxu_flops": total,
        "total_ms_at_197tf": total / 197e9,
    }
    print(json.dumps(out))
    for f, prim, a, b in top:
        print(f"  {f/1e9:10.2f} GFLOP  {prim}  {a} x {b}", file=sys.stderr)


if __name__ == "__main__":
    main()
