"""Executed-FLOPs/bytes probe for the roofline accounting (docs/Guidelines.md).

Lowers the EXACT production train step (same builder as profile_step.py —
bench.py's config knobs, remat policy included, so the remat recompute is
counted) on the CPU backend and reads the pre-optimization
``lowered.cost_analysis()``: flops actually executed and bytes accessed.
Combined with the v5e-1 peaks (197 TFLOP/s bf16, 819 GB/s HBM) this yields
the compute/bandwidth floor of the step independent of the profiler.

Usage (scrubbed-env CPU, same recipe as bench.py's flops_ratio_live):
  JAX_PLATFORMS=cpu LYCORIS_FORCE_CPU=1 python tools/profiling/roofline_probe.py
  ... BENCH_SDXL=1 BENCH_BATCH=4 BENCH_REMAT=attn_ff python ...   # SDXL b4

Prints one JSON line. Caveat: Pallas custom calls carry zero FLOPs in the
cost model; run with LYCORIS_TPU_FLASH=off (forced below) so attention is
counted as plain XLA ops, then swap in the padded-kernel floor analytically
(the doc does this; the padded floor is LARGER than the XLA-op count by the
head-dim pad ratio).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("LYCORIS_FORCE_CPU", "1")
os.environ["LYCORIS_TPU_FLASH"] = "off"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import profile_step  # noqa: E402  (reuses the bench builder)


def main():
    tr, batch_data = profile_step.build_trainer()
    rng = jax.random.key(0)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        (tr.adapter_params, tr.adapter_buffers, tr.opt_state,
         tr.base_params, batch_data, rng),
    )
    cost = tr._step_fn.lower(*abstract).cost_analysis()
    flops = float(cost.get("flops", -1.0)) if cost else -1.0
    byts = float(cost.get("bytes accessed", -1.0)) if cost else -1.0
    out = {
        "model": "sdxl" if os.environ.get("BENCH_SDXL", "0") == "1" else "sd15",
        "batch": int(os.environ.get("BENCH_BATCH", "8")),
        "remat": os.environ.get("BENCH_REMAT", "default"),
        "algo": os.environ.get("BENCH_ALGO", "lokr"),
        "flops": flops,
        "bytes_accessed": byts,
        "flops_ms_at_197tf": flops / 197e9,
        "bytes_ms_at_819gbs": byts / 819e6,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
