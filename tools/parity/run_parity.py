"""Equal-sample quality-parity harness (BASELINE.md: "PPO gait reward
within 5% of CPU reference at equal sample count").

Two sides, runnable independently (the reference side is CPU-only and can
run while the TPU trains):

  python tools/parity/run_parity.py --side reference --total_steps 2000000
  python tools/parity/run_parity.py --side qtpu      --total_steps 2000000
  python tools/parity/run_parity.py --side compare

reference = MuJoCo C physics + reference env semantics (reference_env.py)
trained by SB3-default PPO in torch (torch_ppo.py), 12 envs x n_steps 2048,
minibatch 64 — the reference's exact regime (train.py:44-50, 220 + SB3
defaults).  qtpu = this framework, same hyperparameters, same eval
protocol (2 deterministic episodes, <=1000 steps).  Histories land in
results/parity/<side>_history.json; compare writes the gap statement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

OUT = Path("results/parity")


def suffix(args):
    return "" if args.reward_profile == "full" else f"_{args.reward_profile}"


def run_reference(args):
    import numpy as np

    from reference_env import ReferenceGo1Env
    from torch_ppo import PPO

    prof = (
        dict(w_recovery=0.0, w_get_up=0.0, fallen_start_prob=0.0)
        if args.reward_profile == "locomotion" else {}
    )
    envs = [
        ReferenceGo1Env(args.ctrl_type, rand_power=0.0, seed=args.seed + i,
                        **prof)
        for i in range(args.num_envs)
    ]
    ppo = PPO(envs, lr=args.learning_rate, n_steps=args.n_steps,
              seed=args.seed)
    make_eval = lambda s: ReferenceGo1Env(args.ctrl_type, seed=s, **prof)
    hist = []
    steps = 0
    t0 = time.time()
    while steps < args.total_steps:
        *batch, mean_r = ppo.collect()
        ppo.update(batch)
        steps += args.num_envs * args.n_steps
        er, el, hf, te = ppo.eval_episodes(make_eval, seed=args.seed)
        hist.append(
            dict(step=steps, eval_reward=er, eval_len=el, healthy_frac=hf,
                 tracking_error=te, train_reward=float(mean_r))
        )
        OUT.mkdir(parents=True, exist_ok=True)
        (OUT / f"reference{suffix(args)}_history.json").write_text(
            json.dumps(hist, indent=1))
        sps = steps / (time.time() - t0)
        print(
            f"[ref {steps:>9,}] eval {er:8.1f} len {el:6.1f} "
            f"healthy {hf*100:5.1f}% err {te:.3f} | {sps:,.0f} steps/s",
            flush=True,
        )


def run_qtpu(args):
    import jax

    if os.environ.get("QTPU_FORCE_CPU"):
        # JAX_PLATFORMS in the environment is not honored once the axon
        # plugin is discoverable (and a dead tunnel blocks init) — force
        # the platform through jax.config like tests/conftest.py does
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from quadruped_tpu.utils import cache as _cache

    _cache.enable()

    from quadruped_tpu.env.config import Go1Config, RewardWeights
    from quadruped_tpu.env.go1 import Go1Env
    from quadruped_tpu.learn.ppo import PPO, PPOConfig
    from quadruped_tpu.learn.runner import Runner, RunnerConfig

    prof = (
        dict(rewards=RewardWeights(recovery=0.0, get_up=0.0),
             fallen_start_prob=0.0)
        if args.reward_profile == "locomotion" else {}
    )
    env = Go1Env(Go1Config(ctrl_type=args.ctrl_type, collision_mode="full",
                           **prof))
    batch = args.num_envs * args.n_steps
    ppo_cfg = PPOConfig(
        num_envs=args.num_envs,
        n_steps=args.n_steps,
        learning_rate=args.learning_rate,
        num_minibatches=batch // 64,       # sb3 minibatch 64
        # 12-env rollouts are latency-bound (~35-45 ms/control-step
        # regardless of batch), so the chunk size only sets how much
        # host-dispatch overhead amortizes per program: 64 steps x ~40 ms
        # ~= 2.6 s/program, still under the axon single-program ceiling
        rollout_chunk=int(os.environ.get("QTPU_PARITY_CHUNK", "64"))
        if jax.default_backend() != "cpu" else None,
    )
    run_cfg = RunnerConfig(n_eval_episodes=2, eval_max_time=20.0,
                           save_videos=False, verbose=False)
    runner = Runner(env, ppo_cfg, run_cfg)
    trainer = runner.trainer
    ts = trainer.init(jax.random.PRNGKey(args.seed))
    eval_rng = jax.random.PRNGKey(args.seed + 1)
    hist = []
    steps = 0
    it = 0
    t0 = time.time()
    while steps < args.total_steps:
        ts, metrics = trainer.train_iteration_chunked(ts)
        mean_r = float(jax.device_get(metrics["mean_reward"]))
        steps += batch
        it += 1
        # small-batch eval episodes are latency-bound (~43 ms/control-step
        # regardless of batch), so per-iteration evals would cost ~45 min
        # per 2M-step side on-chip; thin them (the compare statement uses
        # final-quarter MEANS of eval points, which thinning preserves)
        if it % max(1, args.eval_every) and steps < args.total_steps:
            continue
        eval_rng, k = jax.random.split(eval_rng)
        ep_rew, ep_len, _succ, out = runner.evaluate(ts, k)
        g = out["gait_metrics"]
        hist.append(
            dict(step=steps, eval_reward=float(ep_rew.mean()),
                 eval_len=float(ep_len.mean()),
                 healthy_frac=g["healthy_frac"],
                 tracking_error=g["tracking_error"],
                 train_reward=mean_r)
        )
        OUT.mkdir(parents=True, exist_ok=True)
        (OUT / f"qtpu{suffix(args)}_history.json").write_text(
            json.dumps(hist, indent=1))
        sps = steps / (time.time() - t0)
        print(
            f"[qtpu {steps:>9,}] eval {ep_rew.mean():8.1f} "
            f"len {ep_len.mean():6.1f} healthy {g['healthy_frac']*100:5.1f}% "
            f"err {g['tracking_error']:.3f} | {sps:,.0f} steps/s",
            flush=True,
        )


def compare(args):
    import numpy as np

    ref = json.loads((OUT / f"reference{suffix(args)}_history.json").read_text())
    qt = json.loads((OUT / f"qtpu{suffix(args)}_history.json").read_text())
    # equal-sample comparison: truncate BOTH sides to the shorter side's
    # final step before taking the final-quarter means — comparing one
    # side's 3M tail against the other's 1M tail would not be an
    # equal-sample-count statement (results/parity/README.md: compare
    # equal prefixes when the clock forces unequal run lengths)
    common = min(ref[-1]["step"], qt[-1]["step"])
    ref_c = [r for r in ref if r["step"] <= common]
    qt_c = [r for r in qt if r["step"] <= common]
    tail = lambda h: np.mean([r["eval_reward"] for r in h[-max(1, len(h) // 4):]])
    r_ref, r_qt = tail(ref_c), tail(qt_c)
    gap = (r_qt - r_ref) / max(abs(r_ref), 1e-9)
    lines = [
        "# Quality parity (equal sample count)",
        "",
        f"- compared over the common prefix: {common:,} env steps"
        + ("" if ref[-1]["step"] == qt[-1]["step"] else
           f" (full histories: reference {ref[-1]['step']:,}, "
           f"qtpu {qt[-1]['step']:,})"),
        f"- reference (MuJoCo C + torch PPO @ SB3 defaults): "
        f"final-quarter mean eval reward {r_ref:.1f}",
        f"- quadruped_tpu (same hyperparameters): {r_qt:.1f}",
        f"- relative gap: {gap*100:+.1f}% (BASELINE target: within 5%)",
    ]
    (OUT / f"PARITY{suffix(args)}.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for h, name in ((ref, "reference (mujoco+torch)"), (qt, "quadruped_tpu")):
        s = [r["step"] for r in h]
        axes[0].plot(s, [r["eval_reward"] for r in h], label=name)
        axes[1].plot(s, [r["healthy_frac"] for r in h], label=name)
        axes[2].plot(s, [r["tracking_error"] for r in h], label=name)
    for ax, t in zip(axes, ("eval reward", "healthy fraction",
                            "tracking error (m/s)")):
        ax.set_title(t)
        ax.set_xlabel("env steps")
        ax.grid(alpha=0.3)
        ax.legend()
    fig.tight_layout()
    fig.savefig(OUT / f"parity{suffix(args)}.png", dpi=100)
    print(f"plot -> {OUT}/parity{suffix(args)}.png")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--side", required=True,
                   choices=["reference", "qtpu", "compare"])
    p.add_argument("--total_steps", type=int, default=2_000_000)
    p.add_argument("--num_envs", type=int, default=12)     # train.py:153
    p.add_argument("--n_steps", type=int, default=2048)    # sb3 default
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--ctrl_type", default="torque")
    p.add_argument("--reward_profile", default="full",
                   choices=["full", "locomotion"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval_every", type=int, default=1,
                   help="qtpu side: evaluate every Nth iteration (the "
                        "reference side keeps per-iteration evals; compare "
                        "uses final-quarter means, which thinning preserves)")
    args = p.parse_args()
    if args.side == "reference":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        run_reference(args)
    elif args.side == "qtpu":
        run_qtpu(args)
    else:
        compare(args)


if __name__ == "__main__":
    main()
