#!/bin/bash
# Flagship walking-gait training run (VERDICT r1 #1, r2 #1).
#
# Recipe (round 3): POSITION control + SHAPED reward profile.
#   * position control — the reference's default ctrl_type
#     (/root/reference/train.py:183-188) and the only mode with shipped
#     48-obs-dim walking artifacts (results/parity/ENDORSED_MODELS.md);
#   * --reward_profile shaped — locomotion channels (no recovery/get_up
#     farming) plus two DOCUMENTED train-time deviations that restore a
#     learnable gradient: signed reward (drop the max(0, r-c) floor,
#     go1_mujoco_env.py:911) and plain qacc^2 accel cost (the dynamic
#     qacc^2/(|qvel|+1e-6) form explodes ~1e6x at rest).  Round 2 proved
#     the reference's current objective is reward-0 from init in both
#     ctrl modes — four 5-8M-step runs with zero gradient (VERDICT r2
#     weak #1).  Evals and the gait gate keep REFERENCE reward semantics
#     (learn/runner.py builds a reference-semantics eval env), so the
#     reported curves stay comparable.
#   * --max_unhealthy_time 1.0 — early reset: fallen time carries no
#     useful gradient; reset into useful states instead.
#   * --action_mode centered — ctrl re-based at the home keyframe
#     (key_ctrl + 0.3*action).  The first 60M-step shaped run plateaued
#     at healthy_frac 0.42 from iteration 1: under the reference's raw
#     parameterization action=0 targets straight legs, so the policy
#     explores around collapse (zero-action probe: z 0.30->0.06 in 2 s,
#     terminated t=100; home-target probe: stands indefinitely at
#     POSITIVE shaped reward +2.6/step).  Centered puts the Gaussian
#     init exactly on the standing fixed point.
#   * ROUND 4 anti-standing levers (VERDICT r3 #1: round 3's flagship
#     became a PERFECT STANDER — healthy 1.0, full episodes, but
#     feet_airtime 0.0 and distance 0.03 m over 30 s; standing earned
#     +2.5/step incl. 1.64 of linear-vel tracking at |v_des|~0.2 and
#     nothing made it unprofitable):
#       --command_speed_floor 0.15 — x-command resampled as
#         sign*U(0.15, 0.5): no training episode is trackable by
#         standing still (evals keep reference U(-0.5,0.5) sampling);
#       --stand_still_cost 1.5 — per-step cost while healthy, commanded
#         to move and ALL FOUR feet in contact: dense pressure to lift a
#         foot, zero for any stepping gait.  Standing under command now
#         nets ~(1.22 tracking - 1.5 penalty) vs ~2.0 for tracking at
#         the command — walking strictly dominates.
#   * ROUND 5: --stand_still_mode velocity — the contact trigger proved
#     DODGEABLE: by 60M the flagship swung feet in place (eval airtime
#     0.97, distance 0.10 m) and paid nothing.  The velocity trigger
#     charges any state whose commanded-direction speed is below 30% of
#     the command, so stepping-in-place is charged too; only actual
#     commanded translation escapes.  QTPU_SS_MODE=contact restores r4.
#
# The supervisor preflights the objective on CPU before the first launch
# (tools/preflight_signal.py — refuses reward-density-0 configs), watches
# for tunnel stalls, resumes from the newest checkpoint, aborts without
# restart on the Runner's dead-signal exit (rc=17), and yields the chip
# to bench.py preemption windows (quadruped_tpu/utils/tpulock.py).
set -x
cd "$(dirname "$0")/.."
QTPU_SOLVER_ITERS=8 QTPU_EVAL_CHUNK=100 nohup python tools/train_supervisor.py \
    --total_timesteps "${1:-100000000}" \
    --stall_minutes 20 \
    -- \
    --num_parallel_envs 4096 --n_steps 64 --num_minibatches 8 --n_epochs 5 \
    --ctrl_type position --reward_profile shaped \
    --action_mode centered \
    --command_speed_floor 0.15 \
    --stand_still_cost 1.5 \
    --stand_still_mode "${QTPU_SS_MODE:-velocity}" \
    --feet_airtime_bootstrap "${QTPU_AIRTIME_BOOTSTRAP:-5.0}" \
    --best_metric gait \
    --max_unhealthy_time 1.0 \
    --contact_pools 8,28,12 \
    --solver_iterations 8 \
    --rollout_chunk "${QTPU_ROLLOUT_CHUNK:-2}" \
    --eval_frequency 2000000 --video_interval 10000000 \
    --eval_max_time 30 \
    --checkpoint_interval 2000000 \
    --run_name "${QTPU_RUN_NAME:-walk-centered}" \
    > /tmp/supervisor_gait.log 2>&1 &
echo $! > /tmp/supervisor_gait.pid
echo "supervisor pid $(cat /tmp/supervisor_gait.pid); logs: /tmp/supervisor_gait.log /tmp/supervised_train.log"
