"""Per-bucket op attribution from a saved jax.profiler xplane trace.

Like parse_prof3.py but prints the TOP individual ops inside the named
buckets (default: the data-movement ones — copy, reshape, pad, convert),
with full shapes, so each hot copy can be traced back to its producer in
the HLO dump (tools/profiling/attr_fusion.py --dump).

Usage: python tools/profiling/parse_buckets.py TRACE_DIR [STEPS] [PREFIX ...]
"""
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import jax

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_sdxl_r3"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
PREFIXES = sys.argv[3:] or ["copy", "reshape", "pad", "convert", "transpose",
                            "bitcast", "slice", "dynamic"]

xs = sorted(glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True),
            key=os.path.getmtime)
pd = jax.profiler.ProfileData.from_serialized_xspace(open(xs[-1], "rb").read())
names = defaultdict(float)
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            names[ev.name] += ev.duration_ns / 1e6

for prefix in PREFIXES:
    hits = {k: v for k, v in names.items()
            if k.lstrip("%").startswith(prefix)}
    tot = sum(hits.values()) / STEPS
    print(f"\n== bucket '{prefix}': {tot:.2f} ms/step over {len(hits)} ops ==")
    for k, v in sorted(hits.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{v/STEPS:9.3f} ms/step  {k[:150]}")
