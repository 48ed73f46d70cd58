"""Minimal end-to-end example: train, evaluate, and render a Go1 policy.

The 60-second tour of the API for someone arriving from the reference
repo (`python train.py --run train` + SB3): the same capability is three
objects — a pure-functional env, a fused on-device PPO trainer, and a
Runner that owns eval/videos/checkpoints.

Run small on CPU:    QTPU_FORCE_CPU=1 python examples/minimal_train.py
Run full on TPU:     python examples/minimal_train.py --num_envs 4096
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--total_timesteps", type=int, default=50_000)
    args = p.parse_args()

    if os.environ.get("QTPU_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from quadruped_tpu.env.config import Go1Config, RewardWeights
    from quadruped_tpu.env.go1 import Go1Env
    from quadruped_tpu.learn.ppo import PPO, PPOConfig
    from quadruped_tpu.learn.runner import Runner, RunnerConfig

    # 1. the env: an immutable pytree state, vmap-batched by the trainer.
    #    `locomotion` objective = the reference's walking-era reward
    #    (see README "Reward profiles")
    env = Go1Env(Go1Config(
        ctrl_type="torque",
        rewards=RewardWeights(recovery=0.0, get_up=0.0),
        fallen_start_prob=0.0,
    ))

    # 2. the trainer: rollout + GAE + clipped PPO updates fused on-device
    ppo_cfg = PPOConfig(num_envs=args.num_envs, n_steps=32,
                        num_minibatches=4, n_epochs=4)

    # 3. the runner: curriculum, periodic eval with gait metrics,
    #    best-model checkpoints, progress plots, offline videos
    runner = Runner(env, ppo_cfg, RunnerConfig(
        total_timesteps=args.total_timesteps,
        eval_frequency=args.total_timesteps // 2,
        run_name="example",
        save_videos=False,
    ))
    ts, _history, _run_dir = runner.train(seed=0)

    # direct programmatic eval: gait metrics beyond summed reward
    ep_rew, ep_len, _success, out = runner.evaluate(ts, jax.random.PRNGKey(1))
    g = out["gait_metrics"]
    print(f"eval reward {float(ep_rew.mean()):.1f}  "
          f"healthy {g['healthy_frac']*100:.1f}%  "
          f"tracking err {g['tracking_error']:.3f} m/s")


if __name__ == "__main__":
    main()
