#!/bin/bash
# usage: /tmp/run_bench.sh [ENV=val ...]   — appends result to /tmp/bench_results.log
cd /root/repo
for kv in "$@"; do export "$kv"; done
echo "=== $(date +%H:%M:%S) $* ===" >> /tmp/bench_results.log
timeout 3000 python bench.py 2>/tmp/bench_stderr.log | tee -a /tmp/bench_results.log
tail -2 /tmp/bench_stderr.log >> /tmp/bench_results.log
