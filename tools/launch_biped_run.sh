#!/bin/bash
# Biped standing/walking run at capability scale (VERDICT r4 #4).
#
# Recipe = the round-4 5M demo's bounded-indicator form, scaled:
#   * --biped --reward_profile shaped: the reference-exact biped
#     objective is structurally unlearnable (force-squared contact costs
#     ~1e8/step swallowed by the max(0,.) floor — density 2.4%,
#     results/biped5M-standing); shaped switches biped contact costs to
#     the bounded indicator form at train time (env/config.py
#     biped_contact_mode).  Evals keep reference semantics.
#   * --max_unhealthy_time 1.0: reset out of fallen states fast.
#   * 20M steps (reference evidence bar: an 80M standing run,
#     checkpoints/standing_training/metadata_80000000.json) — target is
#     nonzero eval reward under reference semantics or bipedal_success>0.
#
# Supervisor auto-resumes from the newest biped-r5 checkpoint.
set -x
cd "$(dirname "$0")/.."
QTPU_SOLVER_ITERS=8 QTPU_EVAL_CHUNK=100 nohup python tools/train_supervisor.py \
    --total_timesteps "${1:-20000000}" \
    --stall_minutes 20 \
    --log /tmp/supervised_biped.log \
    -- \
    --biped \
    --num_parallel_envs 4096 --n_steps 64 --num_minibatches 8 --n_epochs 5 \
    --ctrl_type position --reward_profile shaped \
    --max_unhealthy_time 1.0 \
    --contact_pools 8,28,12 \
    --solver_iterations 8 \
    --rollout_chunk 2 \
    --eval_frequency 2000000 --video_interval 10000000 \
    --eval_max_time 30 \
    --checkpoint_interval 2000000 \
    --run_name biped-r5 \
    > /tmp/supervisor_biped.log 2>&1 &
echo $! > /tmp/supervisor_biped.pid
echo "supervisor pid $(cat /tmp/supervisor_biped.pid); logs: /tmp/supervisor_biped.log /tmp/supervised_biped.log"
