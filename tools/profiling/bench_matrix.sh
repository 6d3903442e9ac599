#!/bin/bash
# Round-2 flag matrix: microbenches then SDXL bench per candidate flag.
# Run AFTER the tunnel recovers. Appends everything to /tmp/bench_results.log.
set -x
cd /tmp
echo "=== MATRIX start $(date) ===" >> /tmp/bench_results.log

# 0. NEW default first: bf16-recon factored path (make_kron out_dtype).
#    Fresh compile (~8 min); compare vs prior 1.261.
/tmp/run_bench.sh BENCH_SDXL=1

# 1. GN microbench (none/jnp/dots sandwich)
timeout 3000 python bench_gn2.py 2>&1 | grep -v WARNING | tee -a /tmp/bench_results.log

# 2. flash dt microbench (std vs dt in projection sandwich)
timeout 3000 python bench_dt.py 2>&1 | grep -v WARNING | tee -a /tmp/bench_results.log

# 3. SDXL bench per flag (BENCH_SDXL=1 skips the SD15 leg)
/tmp/run_bench.sh BENCH_SDXL=1 LYCORIS_TPU_GN=dots
/tmp/run_bench.sh BENCH_SDXL=1 LYCORIS_TPU_FLASH_DT=1
/tmp/run_bench.sh BENCH_SDXL=1 LYCORIS_TPU_LOKR_DW1=batched

# 3a. stacked leg: all three candidates together (interaction check — the
#     per-flag legs attribute, this one is the shippable operating point)
/tmp/run_bench.sh BENCH_SDXL=1 LYCORIS_TPU_GN=dots LYCORIS_TPU_FLASH_DT=1 LYCORIS_TPU_LOKR_DW1=batched

# 3b. LoHa SDXL leg for the record (BASELINE names "SDXL LoKr/LoHa")
/tmp/run_bench.sh BENCH_SDXL=1 BENCH_ALGO=loha

# 4. SD1.5 leg with the new default (also refreshes the derived baseline)
/tmp/run_bench.sh
echo "=== MATRIX done $(date) ===" >> /tmp/bench_results.log

# 5. fresh SDXL profile at the shipped operating point (attn_ff, b4) —
#    chases the elementwise/reduce ~244 ms bucket from the transformer-remat
#    profile; writes /tmp/prof_sdxl_r2_report.txt
BENCH_SDXL=1 BENCH_BATCH=4 BENCH_REMAT=attn_ff timeout 3000 \
  python /root/repo/tools/profiling/profile_step.py /tmp/prof_sdxl_r2 \
  2>&1 | tail -60 | tee -a /tmp/bench_results.log
echo "=== MATRIX+profile done $(date) ===" >> /tmp/bench_results.log
