#!/bin/bash
# Training-loop throughput A/B over --rollout_chunk (VERDICT r2 #4).
# Flagship config, phase-timed, evals off the hot path.  Each setting is
# a fresh process (axon wedges survive process exit, not reuse).
set -x
cd "$(dirname "$0")/.."
for CHUNK in "$@"; do
  QTPU_PHASE_TIMING=1 timeout 1200 python -m quadruped_tpu.cli.train \
    --run train \
    --num_parallel_envs 4096 --n_steps 64 --num_minibatches 8 --n_epochs 5 \
    --ctrl_type position --reward_profile shaped \
    --max_unhealthy_time 1.0 \
    --contact_pools 8,28,12 --solver_iterations 8 \
    --rollout_chunk "$CHUNK" \
    --eval_frequency 999999999 --video_interval 999999999 \
    --checkpoint_interval 999999999 \
    --total_timesteps 1048576 \
    --run_name "ab-chunk$CHUNK" \
    2>&1 | grep -E "iter |steps/s|Error|error" | tail -6
done
