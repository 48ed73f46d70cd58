#!/usr/bin/env python
"""Snapshot a run's best_model as the committed walking artifact.

Promotes `<run_dir>/best_model` to `results/walk_policy` — the artifact
tests/test_gait_gate.py gates on (healthy_frac >= 0.80, tracking_error
<= 0.15 m/s, full episodes) — then re-evaluates it on CPU under
REFERENCE reward semantics, renders a gait MP4 from the fresh eval
trajectory, and writes the gate verdict next to the artifact.  Refuses
to promote a policy that fails the gate unless --force.

Usage:
    python tools/snapshot_walk_policy.py models/<run>  [--force]

Counterpart: the reference README endorses its shipped
models/2024-04-16_10-11-57-* artifact as "working well" (README.md:27);
this tool is how an equivalent artifact gets committed here.
"""

import sys

sys.path.insert(0, "/root/repo")
import argparse
import dataclasses
import json
import shutil
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path)
    ap.add_argument("--out", type=Path, default=Path("results/walk_policy"))
    ap.add_argument("--force", action="store_true",
                    help="promote even if the gate fails (e.g. to commit "
                         "best-so-far progress explicitly marked as such)")
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--source", default="best_model",
                    help="subdir of run_dir to promote (a checkpoint_N "
                         "works too)")
    args = ap.parse_args()

    src = args.run_dir / args.source
    meta = json.loads((src / "metadata.json").read_text())
    print(f"candidate: {src}\n  metadata: {meta}")

    from quadruped_tpu.checkpoint import load_policy
    from quadruped_tpu.env.config import Go1Config, RewardWeights
    from quadruped_tpu.env.go1 import Go1Env
    from quadruped_tpu.learn.ppo import PPOConfig
    from quadruped_tpu.learn.runner import Runner, RunnerConfig

    # EXACTLY the gait-gate env: reference reward semantics, the
    # artifact's recorded policy<->env interface
    env = Go1Env(Go1Config(
        ctrl_type=meta.get("ctrl_type", "position"),
        action_mode=meta.get("action_mode", "raw"),
        action_scale=meta.get("action_scale", 0.3),
        rewards=RewardWeights(recovery=0.0, get_up=0.0),
        fallen_start_prob=0.0,
    ))
    runner = Runner(
        env,
        PPOConfig(num_envs=max(2, args.episodes), n_steps=4),
        RunnerConfig(n_eval_episodes=args.episodes, eval_max_time=20.0,
                     save_videos=False, verbose=False),
    )
    ts = runner.trainer.init(jax.random.PRNGKey(0))
    params, _ = load_policy(str(src), ts.params)
    ts = dataclasses.replace(ts, params=params)

    print("evaluating on CPU (reference reward semantics, 20 s)...")
    ep_rew, ep_len, _succ, out = runner.evaluate(ts, jax.random.PRNGKey(1))
    g = out["gait_metrics"]
    mean_len = float(np.mean(np.asarray(ep_len)))
    full = 0.95 * 20.0 / env.cfg.dt
    verdict = {
        "healthy_frac": float(g["healthy_frac"]),
        "tracking_error": float(g["tracking_error"]),
        "distance": float(g.get("distance", float("nan"))),
        "mean_length": mean_len,
        "mean_reward_reference_semantics": float(np.mean(np.asarray(ep_rew))),
        "gate": bool(g["healthy_frac"] >= 0.80
                     and g["tracking_error"] <= 0.15
                     and mean_len >= full),
    }
    print(json.dumps(verdict, indent=1))
    if not verdict["gate"] and not args.force:
        print("GATE FAILED — not promoting (use --force to override)")
        return 2

    args.out.parent.mkdir(parents=True, exist_ok=True)
    if args.out.exists():
        shutil.rmtree(args.out)
    shutil.copytree(src, args.out)
    meta["gate_eval"] = verdict
    meta["promoted_from"] = str(src)
    (args.out / "metadata.json").write_text(json.dumps(meta, indent=1))

    # gait video from THIS eval's trajectory
    try:
        from quadruped_tpu.viz.render import render_trajectory

        qpos = np.asarray(out["qpos"][0])[: int(ep_len[0])]
        every = max(1, int(1 / (env.cfg.dt * 30)))
        render_trajectory(
            qpos, args.out / "gait.mp4", env.cfg.ctrl_type, fps=30,
            every=every, robot=meta.get("robot", "go1"),
        )
        print(f"rendered {args.out / 'gait.mp4'}")
    except Exception as e:  # video is evidence, not the artifact
        print(f"video render failed (artifact still promoted): {e}")

    print(f"promoted -> {args.out}  (gate={'PASS' if verdict['gate'] else 'FORCED'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
