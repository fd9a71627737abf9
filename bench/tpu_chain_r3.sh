#!/bin/bash
# Round-3 TPU chain, sequential — never two heavy JAX procs.
# Logs to bench/tpu_chain_r3.log; each step appends a marker line.
# JSON artifacts are written to a temp file and moved into place only on
# rc=0 so a failed run never leaves a truncated/empty bench/*.json.
set -u
cd /root/repo
LOG=bench/tpu_chain_r3.log
mark() { echo "=== $(date -u +%H:%M:%S) $1 ===" >> "$LOG"; }

# vm.max_map_count resets on reboot; exhaustion shows up later as
# confusing LLVM 'Unable to allocate section memory' failures.
MMC=$(cat /proc/sys/vm/max_map_count)
if [ "$MMC" -lt 1048576 ]; then
  sysctl -w vm.max_map_count=1048576 || {
    mark "ABORT: vm.max_map_count=$MMC and sysctl failed"; exit 1; }
fi

run_json() {  # run_json <outfile> <timeout_s> cmd...
  local out=$1 t=$2; shift 2
  local tmp; tmp=$(mktemp "${out}.XXXX")
  timeout "$t" "$@" > "$tmp" 2>> "$LOG"
  local rc=$?
  if [ $rc -eq 0 ]; then mv "$tmp" "$out"; else rm -f "$tmp"; fi
  return $rc
}

mark "baseline configs 2-4"
timeout 4800 python examples/bench_baseline_configs.py \
  --out bench/baseline_configs_r3.jsonl >> "$LOG" 2>&1
mark "configs done rc=$?"

mark "chain complete"
