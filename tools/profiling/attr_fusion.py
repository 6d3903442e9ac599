"""Attribute profiled fusion names to their optimized-HLO definitions.

Builds the same train step as bench.py/profile_step.py (same env knobs), AOT
compiles it (persistent-cache warm => fast), dumps the optimized HLO, and for
each requested fusion-name prefix prints the fusion's computation body — the
producers behind profile buckets like ``loop_multiply_multiply_fusion``.

Usage: python tools/profiling/attr_fusion.py NAME_PREFIX [NAME_PREFIX ...]
   or: python tools/profiling/attr_fusion.py --dump /tmp/step.hlo.txt
Env: BENCH_SDXL, BENCH_ALGO, BENCH_BATCH, BENCH_REMAT, ... (as bench.py).
"""

import os
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/lycoris_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_step import build_trainer  # noqa: E402


def main():
    args = sys.argv[1:]
    dump_path = None
    if args and args[0] == "--dump":
        dump_path = args[1]
        args = args[2:]

    tr, batch = build_trainer()
    rng = jax.random.key(0)
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        (tr.adapter_params, tr.adapter_buffers, tr.opt_state,
         tr.base_params, batch, rng),
    )
    print("[attr] lowering + compiling (cache-warm)...", file=sys.stderr)
    compiled = tr._step_fn.lower(*abstract).compile()
    txt = compiled.as_text()
    if dump_path:
        with open(dump_path, "w") as f:
            f.write(txt)
        print(f"[attr] wrote {len(txt)/1e6:.1f} MB HLO to {dump_path}")

    # index: computation name -> body text
    comps = {}
    cur = None
    buf = []
    for line in txt.splitlines():
        m = re.match(r"^(%?[\w.\-]+)\s.*\{\s*(//.*)?$", line)
        if line.startswith("ENTRY") or (m and not line.startswith(" ")):
            if cur:
                comps[cur] = "\n".join(buf)
            cur = (m.group(1).lstrip("%") if m else "ENTRY")
            buf = [line]
        else:
            buf.append(line)
    if cur:
        comps[cur] = "\n".join(buf)

    # fusion instruction -> called computation
    fmap = {}
    for line in txt.splitlines():
        m = re.search(r"%?([\w.\-]+)\s*=\s*\S+\s+fusion\(.*calls=%?([\w.\-]+)", line)
        if m:
            fmap[m.group(1)] = m.group(2)

    for prefix in args:
        hits = [k for k in fmap if k.startswith(prefix)]
        print(f"\n##### prefix {prefix!r}: {len(hits)} fusions")
        for k in sorted(hits)[:8]:
            body = comps.get(fmap[k], "<computation not found>")
            lines = body.splitlines()
            print(f"\n--- {k} -> {fmap[k]} ({len(lines)} lines)")
            print("\n".join(lines[:40]))
            if len(lines) > 40:
                print(f"... (+{len(lines)-40} lines)")


if __name__ == "__main__":
    main()
