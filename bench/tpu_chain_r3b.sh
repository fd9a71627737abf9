#!/bin/bash
# Round-3 chain B: BoxMG interpolation on TPU. Sequential, tmp-file mv.
set -u
cd /root/repo
LOG=bench/tpu_chain_r3b.log
mark() { echo "=== $(date -u +%H:%M:%S) $1 ===" >> "$LOG"; }

MMC=$(cat /proc/sys/vm/max_map_count)
[ "$MMC" -lt 1048576 ] && sysctl -w vm.max_map_count=1048576

run_json() {  # run_json <outfile> <timeout_s> cmd...
  local out=$1 t=$2; shift 2
  local tmp; tmp=$(mktemp "${out}.XXXX")
  timeout "$t" "$@" > "$tmp" 2>> "$LOG"
  local rc=$?
  if [ $rc -eq 0 ]; then mv "$tmp" "$out"; else rm -f "$tmp"; fi
  return $rc
}

mark "64^3 boxmg"
run_json bench/r3b_tpu_64.json 2400 env BENCH_N=64 BENCH_REPS=10 python bench.py
mark "64 done rc=$?"

mark "128^3 boxmg"
run_json bench/r3b_tpu_128.json 3000 env BENCH_N=128 BENCH_REPS=5 python bench.py
mark "128 done rc=$?"

mark "baseline configs 2-4 boxmg"
timeout 4800 python examples/bench_baseline_configs.py \
  --out bench/baseline_configs_r3b.jsonl >> "$LOG" 2>&1
mark "configs done rc=$?"

mark "256^3 device setup"
run_json bench/r3b_tpu_256.json 3600 env BENCH_N=256 BENCH_REPS=3 python bench.py
rc=$?
mark "256 device done rc=$rc"
if [ $rc -ne 0 ]; then
  mark "256^3 host setup fallback"
  run_json bench/r3b_tpu_256.json 5400 env BENCH_N=256 BENCH_REPS=3 \
    BENCH_HOST_SETUP=1 python bench.py
  mark "256 host done rc=$?"
fi

mark "chain complete"
