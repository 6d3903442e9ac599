#!/bin/bash
# Round-3 matrix B: runs after bench_matrix_r3.sh.
# - SDXL with in-place base-weight relayout (profile showed ~38 ms/step of
#   per-step weight relayout copies when the budget gate declines auto_layout)
# - SD1.5 batch-16 examples/s probe (amortize fixed overheads)
# - BOFT dense-bypass + GN-variant microbenches
set -x
RB=/root/repo/tools/profiling/run_bench.sh
echo "=== R3B MATRIX start $(date) ===" >> /tmp/bench_results.log

# A. SDXL in-place relayout (fresh compile; auto_layout proceeds over budget)
$RB BENCH_SDXL=1 LYCORIS_TPU_RELAYOUT_INPLACE=1

# B. second warm run (trainer-opt validation discipline)
$RB BENCH_SDXL=1 LYCORIS_TPU_RELAYOUT_INPLACE=1

# C. SD1.5 batch 16 (examples/s vs the b8 operating point)
$RB BENCH_SDXL=0 BENCH_BATCH=16

# D. microbenches: BOFT dense bypass vs chain; GN jnp/dots/barrier/v2 grid
timeout 1800 python /root/repo/tools/profiling/bench_boft_gn.py \
  2>&1 | grep -v WARNING | tail -30 >> /tmp/bench_results.log

# E-F. in-train GN fused2 legs (layout-native fused GN+silu kernels)
$RB BENCH_SDXL=0 LYCORIS_TPU_GN=fused2
$RB BENCH_SDXL=1 LYCORIS_TPU_GN=fused2 LYCORIS_TPU_RELAYOUT_INPLACE=1

# G. flat optimizer (adam over one flat vector)
$RB BENCH_SDXL=0 LYCORIS_TPU_FLAT_OPT=1

# H. conv filter-grad as shifted GEMMs
$RB BENCH_SDXL=0 LYCORIS_TPU_CONV_DW=shifts

echo "=== R3B MATRIX done $(date) ===" >> /tmp/bench_results.log
