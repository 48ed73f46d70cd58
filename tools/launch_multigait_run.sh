#!/bin/bash
# Command-conditioned multi-gait run (BASELINE config 5, VERDICT r4 #5).
#
# The flagship walking recipe (position + shaped + centered +
# command_speed_floor + velocity-mode stand-still cost + airtime
# bootstrap) plus --gait_conditioning: 53-dim obs (48 + gait one-hot(3)
# + phase sin/cos), dense contact-template reward for the commanded
# trot/pace/bound pattern (env/go1.py _gait_pattern_reward).  The 2M
# multigait-smoke (round 4, results/multigait-smoke) proved the
# pipeline; this is the capability-scale run.
#
# --learning_rate 1e-3 (vs SB3's 3e-4): the flagship's diagnosed
# pathology is MEAN-LAG — train (stochastic) reward rose past its
# pre-cost peak while deterministic eval distance stayed at 0.1 m, with
# approx_kl ~0.002/iter, far under the ~0.01 this recipe family targets
# (legged_gym adapts lr to hold kl~0.01).  At 262k-sample batches the
# gradient is low-noise, so 3x lr moves the policy mean at a healthy
# kl without instability.  QTPU_LR overrides.
#
# Supervisor auto-resumes from the newest multigait-r5 checkpoint.
set -x
cd "$(dirname "$0")/.."
QTPU_SOLVER_ITERS=8 QTPU_EVAL_CHUNK=100 nohup python tools/train_supervisor.py \
    --total_timesteps "${1:-40000000}" \
    --stall_minutes 20 \
    --log /tmp/supervised_multigait.log \
    ${QTPU_NO_PREFLIGHT:+--no_preflight} \
    -- \
    --gait_conditioning \
    --learning_rate "${QTPU_LR:-0.001}" \
    --kl_target "${QTPU_KL_TARGET:-0.01}" \
    --num_parallel_envs 4096 --n_steps 64 --num_minibatches 8 --n_epochs 5 \
    --ctrl_type position --reward_profile shaped \
    --action_mode centered \
    --command_speed_floor 0.15 \
    --stand_still_cost 1.5 \
    --stand_still_mode "${QTPU_SS_MODE:-velocity}" \
    --feet_airtime_bootstrap 5.0 \
    --best_metric gait \
    --max_unhealthy_time 1.0 \
    --contact_pools 8,28,12 \
    --solver_iterations 8 \
    --rollout_chunk 2 \
    --eval_frequency 2000000 --video_interval 10000000 \
    --eval_max_time 30 \
    --checkpoint_interval 2000000 \
    --run_name multigait-r5 \
    > /tmp/supervisor_multigait.log 2>&1 &
echo $! > /tmp/supervisor_multigait.pid
echo "supervisor pid $(cat /tmp/supervisor_multigait.pid); logs: /tmp/supervisor_multigait.log /tmp/supervised_multigait.log"
