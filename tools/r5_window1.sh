#!/bin/bash
# Round-5 TPU window #1 (run in the gap after the 60M supervisor exit,
# before the 110M relaunch — zero preemption cost):
#   1. asm_probe2: assembly attribution + synthetic gather/einsum A/Bs
#   2. bench.py: validate the hardened 3-window metric + phases JSON
# Logs to /tmp/r5_window1.log; relaunch the supervisor manually after.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== asm_probe2 $(date) ==="
  timeout 900 python tools/asm_probe2.py --batch 4096 --iters 10
  echo "=== bench $(date) ==="
  timeout 900 python bench.py
  echo "=== done $(date) ==="
} > /tmp/r5_window1.log 2>&1
