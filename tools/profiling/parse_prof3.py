"""Aggregate ALL events on the exclusive 'XLA Ops' line (including -start/
-done async spans, which carry real busy time there)."""
import glob, os, sys
from collections import defaultdict
sys.path.insert(0, "/root/repo")
import jax
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_sdxl3"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
xs = sorted(glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True), key=os.path.getmtime)
pd = jax.profiler.ProfileData.from_serialized_xspace(open(xs[-1], "rb").read())
buckets = defaultdict(float); names = defaultdict(float); total = 0.0
for plane in pd.planes:
    if "TPU" not in plane.name: continue
    for line in plane.lines:
        if line.name != "XLA Ops": continue
        for ev in line.events:
            dur = ev.duration_ns / 1e6
            total += dur
            key = ev.name.split(" = ")[0].split(".")[0].rstrip("0123456789-_")
            buckets[key] += dur
            names[ev.name] += dur
print(f"total {total/STEPS:.1f} ms/step")
for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:18]:
    print(f"{v/STEPS:9.2f} ms/step  {k}")
print("\n== top ops ==")
for k, v in sorted(names.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{v/STEPS:9.3f} ms/step  {k[:130]}")
