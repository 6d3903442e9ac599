#!/bin/bash
# Round-3 opening matrix: reproduce round-2 numbers (cache was wiped), grab
# the two profiles that drive the perf work (SD1.5 conv-backward, SDXL
# elementwise/reduce anomaly), then measure-and-settle the three queued flags
# (VERDICT r2 item 4) + the LoHa SDXL leg (item 3).
# Appends everything to /tmp/bench_results.log. ONE TPU job at a time.
set -x
RB=/root/repo/tools/profiling/run_bench.sh
PROF=/root/repo/tools/profiling/profile_step.py
echo "=== R3 MATRIX start $(date) ===" >> /tmp/bench_results.log

# A. baseline repro, both legs (fresh compiles ~8 min each)
$RB

# B. SD1.5 profile (warm cache): conv-backward breakdown
BENCH_SDXL=0 timeout 3000 python $PROF /tmp/prof_sd15_r3 \
  2>&1 | tail -40 >> /tmp/bench_results.log

# C. SDXL profile at the shipped operating point (attn_ff, b4): the
#    244 ms elementwise/reduce anomaly
BENCH_SDXL=1 BENCH_BATCH=4 BENCH_REMAT=attn_ff timeout 3000 python $PROF /tmp/prof_sdxl_r3 \
  2>&1 | tail -40 >> /tmp/bench_results.log
echo "=== R3 profiles done $(date) ===" >> /tmp/bench_results.log

# D-G. SDXL flag legs (each = fresh compile)
$RB BENCH_SDXL=1 LYCORIS_TPU_GN=dots
$RB BENCH_SDXL=1 LYCORIS_TPU_FLASH_DT=1
$RB BENCH_SDXL=1 LYCORIS_TPU_LOKR_DW1=batched
$RB BENCH_SDXL=1 LYCORIS_TPU_GN=dots LYCORIS_TPU_FLASH_DT=1 LYCORIS_TPU_LOKR_DW1=batched

# H. LoHa SDXL leg (BASELINE metric names LoKr/LoHa; record both)
$RB BENCH_SDXL=1 BENCH_ALGO=loha

# I-J. SD1.5 flag legs (GN residue is 11 ms there; DW1 touches lokr backward)
$RB BENCH_SDXL=0 LYCORIS_TPU_GN=dots
$RB BENCH_SDXL=0 LYCORIS_TPU_GN=dots LYCORIS_TPU_FLASH_DT=1 LYCORIS_TPU_LOKR_DW1=batched
echo "=== R3 MATRIX done $(date) ===" >> /tmp/bench_results.log
