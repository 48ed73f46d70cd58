"""Roll the reference's README-endorsed trained model in the reference
MuJoCo env, to pin the behavioral target of the gait task.

The endorsed artifact (README.md:27, models/2024-04-16_10-11-57-x=1_torque
_ctrl_fixed_joint_range_5mill_iter_working_well/final_model.zip) is an SB3
PPO zip whose policy MLP has **45 inputs**, while the current reference env
emits 48-dim observations (go1_mujoco_env.py:151-153).  The missing block
is the 3-dim desired-velocity command (the run name "x=1" = fixed forward
command of that era), which places the artifact BEFORE the current obs
layout and before the get-up(x20)/recovery(x10) reward channels — i.e. the
endorsed walking behavior was trained on a plain locomotion objective, not
the current recovery-curriculum reward stack.

This script loads policy.pth directly with torch (SB3 is not installed),
reconstructs the deterministic actor (obs -> 2x64 tanh -> action mean),
feeds the 48-dim obs minus the desired-vel block, and reports gait
metrics (forward velocity, healthy fraction, per-step reward under the
CURRENT reward stack) — evidence for which objective the walking gait
actually optimizes.

Usage:  python tools/parity/run_endorsed_model.py [--episodes 3]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import zipfile

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_env import ReferenceGo1Env

ENDORSED = (
    "/root/reference/models/2024-04-16_10-11-57-x=1_torque_ctrl_fixed_"
    "joint_range_5mill_iter_working_well/final_model.zip"
)


def load_actor(path=ENDORSED):
    with zipfile.ZipFile(path) as z:
        sd = torch.load(io.BytesIO(z.read("policy.pth")), map_location="cpu",
                        weights_only=False)
    layers = [
        (sd["mlp_extractor.policy_net.0.weight"],
         sd["mlp_extractor.policy_net.0.bias"]),
        (sd["mlp_extractor.policy_net.2.weight"],
         sd["mlp_extractor.policy_net.2.bias"]),
    ]
    head = (sd["action_net.weight"], sd["action_net.bias"])
    obs_dim = layers[0][0].shape[1]

    def act(obs):
        x = torch.as_tensor(obs, dtype=torch.float32)
        for w, b in layers:
            x = torch.tanh(x @ w.T + b)
        return (x @ head[0].T + head[1]).numpy()

    return act, obs_dim


def strip_desired_vel(obs48):
    # 48-dim layout: [linvel3, angvel3, projgrav3, desired3, jpos12,
    # jvel12, last_action12]; the 45-dim era has no desired block
    return np.concatenate([obs48[:9], obs48[12:]])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--max_steps", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    act, obs_dim = load_actor()
    print(f"endorsed policy obs_dim={obs_dim} (current env: 48)")

    for ep in range(args.episodes):
        env = ReferenceGo1Env("torque", fallen_start_prob=0.0,
                              seed=args.seed + ep)
        obs = env.reset()
        env.desired_vel = np.array([1.0, 0.0, 0.0])  # the "x=1" command
        total_r, healthy, vx = 0.0, 0, []
        x0 = env.d.qpos[0]
        t = 0
        for t in range(args.max_steps):
            a = act(strip_desired_vel(obs) if obs_dim == 45 else obs)
            obs, r, term, trunc, info = env.step(np.clip(a, -1, 1))
            total_r += r
            healthy += env._health(env.d.qpos, env.d.qvel)
            vx.append(env.d.qvel[0])
            if term or trunc:
                break
        dist = env.d.qpos[0] - x0
        print(
            f"ep{ep}: steps {t+1}  reward {total_r:9.1f} "
            f"({total_r/(t+1):5.2f}/step)  healthy {healthy/(t+1)*100:5.1f}%  "
            f"mean vx {np.mean(vx):+.3f} m/s  distance {dist:+.2f} m"
        )


if __name__ == "__main__":
    main()
