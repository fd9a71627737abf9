#!/bin/bash
# tc3 reference-scale dataset (TPU, resumable) -> train -> figures.
set -u
cd /root/repo
LOG=bench/tpu_chain_tc3.log
mark() { echo "=== $(date -u +%H:%M:%S) $1 ===" >> "$LOG"; }

mark "tc3 datagen"
timeout 14400 python examples/generate_tc3_reference_scale.py --resume \
  --refs 3 4 5 --seeds 10 8 3 >> "$LOG" 2>&1
mark "datagen done rc=$?"

mark "tc3 train"
timeout 7200 python examples/train_tc2_reference_scale.py \
  --app testcase3-linear-elasticity --epochs 200 >> "$LOG" 2>&1
mark "train done rc=$?"

mark "tc3 figures"
timeout 1800 python examples/make_figures.py \
  --app testcase3-linear-elasticity >> "$LOG" 2>&1
mark "figures done rc=$?"
mark "chain complete"
