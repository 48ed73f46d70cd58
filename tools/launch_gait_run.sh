#!/bin/bash
# Flagship walking-gait training run (VERDICT r1 #1).
#
# Locomotion reward profile: the objective the reference's walking-era
# artifacts were trained on (results/parity/ENDORSED_MODELS.md) — under
# the full recovery-curriculum stack a collapsed get-up-farming policy is
# the true optimum at gamma=0.99, in BOTH engines (measured).
#
# Early termination (--max_unhealthy_time 1.0 vs the reference's 15 s):
# a fallen robot earns the floored-at-zero reward, so each fallen second
# is 50 gradient-free samples; terminating after 1 s of continuous
# unhealthy time resets it into useful states instead.  Eval still
# requires full 120-s episodes (stricter, not weaker, under early
# termination) and the regression gate (tests/test_gait_gate.py) scores
# the artifact under reference 15-s semantics.
#
# Massively-parallel regime: 4096 envs x 64-step rollouts, 8 warmstarted
# Newton iterations (qpos drift vs oracle 1.8e-4 over 300 substeps,
# PLAN.md A/B), condim row pools, full-horizon eval (120 s) with gait
# metrics.  Supervised: the axon tunnel can wedge mid-run; the supervisor
# kills stalls and resumes from the newest checkpoint.
set -x
cd "$(dirname "$0")/.."
QTPU_SOLVER_ITERS=8 nohup python tools/train_supervisor.py \
    --total_timesteps "${1:-100000000}" \
    --stall_minutes 12 \
    -- \
    --num_parallel_envs 4096 --n_steps 64 --num_minibatches 8 --n_epochs 5 \
    --ctrl_type torque --reward_profile locomotion \
    --max_unhealthy_time 1.0 \
    --contact_pools 8,28,12 \
    --solver_iterations 8 \
    --eval_frequency 2000000 --video_interval 10000000 \
    --eval_max_time 120 \
    --checkpoint_interval 5000000 \
    --run_name walk-locomotion \
    > /tmp/supervisor_gait.log 2>&1 &
echo $! > /tmp/supervisor_gait.pid
echo "supervisor pid $(cat /tmp/supervisor_gait.pid); logs: /tmp/supervisor_gait.log /tmp/supervised_train.log"
