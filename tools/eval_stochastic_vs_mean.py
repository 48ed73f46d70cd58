"""Mean-lag probe: how far does a policy translate the robot when
SAMPLING actions vs acting at its MEAN?

Round-5 diagnosis (results/walk_r4_progress/MEANLAG_75M.md): the 75M
flagship's stochastic rollouts walked 3.5x further than its
deterministic mean (0.49 m vs 0.14 m @ 8 s) — exploration noise was
carrying the locomotion the mean had not yet absorbed, consistent with
approx_kl ~0.002/iter at lr 3e-4 (5x under the ~0.01 this recipe family
holds).  This tool is that probe, committed: run it on any artifact to
tell "the objective is wrong" apart from "the mean lags the noise"
before spending chip-hours on reward surgery.

Usage:
  python tools/eval_stochastic_vs_mean.py <artifact_dir> \
      [--episodes 8] [--seconds 8]

<artifact_dir> is a best_model / checkpoint_N dir with metadata.json
(the same self-describing interface contract the gait gate consumes).
Runs on CPU; both modes use identical reset seeds so the episode draws
(commands, poses) are paired.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def rollout_distance(env, policy, variables, rng, seconds, stochastic):
    """Final horizontal displacement from the reset position, one episode."""
    steps = int(seconds / env.cfg.dt)
    k_reset, k_act = jax.random.split(rng)
    state = env.reset(k_reset)
    obs = env.obs(state)
    origin = state.qpos[:2]

    def body(carry, k):
        state, obs = carry
        if stochastic:
            act, *_ = policy.sample(variables, obs, k)
        else:
            act, _v = policy.act_deterministic(variables, obs)
        state, obs, _r, _term, _trunc, _info = env.step(state, act)
        return (state, obs), None

    (state, _), _ = jax.lax.scan(
        body, (state, obs), jax.random.split(k_act, steps)
    )
    return jnp.linalg.norm(state.qpos[:2] - origin)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact", type=Path)
    ap.add_argument("--episodes", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from quadruped_tpu import checkpoint as ckpt
    from quadruped_tpu.learn.gate import build_gate_env
    from quadruped_tpu.models.actor_critic import Policy

    meta = json.loads((args.artifact / "metadata.json").read_text())
    env = build_gate_env(meta)
    policy = Policy.make(act_dim=12)
    like = policy.init(jax.random.PRNGKey(0), obs_dim=env.obs_dim)
    if (args.artifact / "params").exists():
        variables, _ = ckpt.load_policy(str(args.artifact), like)
    else:
        # periodic checkpoint_N layout: full train_state, no params copy
        from quadruped_tpu.learn.ppo import PPO, PPOConfig

        trainer = PPO(env, PPOConfig(num_envs=2, n_steps=2), policy=policy)
        ts = trainer.init(jax.random.PRNGKey(0))
        variables, _ = ckpt.load_policy_any(str(args.artifact), ts)

    fn = jax.jit(
        lambda rng, stoch: rollout_distance(
            env, policy, variables, rng, args.seconds, stoch
        ),
        static_argnums=1,
    )
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.episodes)
    out = {}
    for mode, stoch in (("stochastic", True), ("deterministic", False)):
        d = np.asarray([fn(k, stoch) for k in keys])
        out[mode] = dict(mean=float(d.mean()), max=float(d.max()),
                         per_episode=[round(float(x), 3) for x in d])
        print(f"{mode:>13}: mean {d.mean():.2f} m  max {d.max():.2f} m "
              f"@ {args.seconds:.0f} s ({args.episodes} episodes)")
    ratio = out["stochastic"]["mean"] / max(out["deterministic"]["mean"], 1e-9)
    out["stochastic_over_deterministic"] = float(ratio)
    print(f"stochastic/deterministic distance ratio: {ratio:.2f}"
          + ("  <- MEAN-LAG signature (>1.5: raise lr / hold higher KL)"
             if ratio > 1.5 else ""))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
