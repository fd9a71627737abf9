#!/bin/bash
# Round-3 TPU chain (runbook item 3), sequential — never two heavy JAX procs.
# Logs to bench/tpu_chain_r3.log; each step appends a marker line.
set -u
cd /root/repo
LOG=bench/tpu_chain_r3.log
mark() { echo "=== $(date -u +%H:%M:%S) $1 ===" >> "$LOG"; }

mark "A/B: AMG_PALLAS_DB=0 128^3"
AMG_PALLAS_DB=0 BENCH_N=128 BENCH_REPS=5 timeout 2400 python bench.py \
  > bench/r3_tpu_128_nodb.json 2>> "$LOG"
mark "A/B done rc=$?"

mark "256^3 bench"
BENCH_N=256 BENCH_REPS=3 timeout 3000 python bench.py \
  > bench/r3_tpu_256.json 2>> "$LOG"
mark "256 done rc=$?"

mark "baseline configs 2-4"
timeout 3000 python examples/bench_baseline_configs.py \
  --out bench/baseline_configs_r3.jsonl >> "$LOG" 2>&1
mark "configs done rc=$?"

mark "chain complete"
