#!/usr/bin/env python
"""Snapshot a run's best_model as the committed walking artifact.

Promotes `<run_dir>/best_model` (or --source checkpoint_N) to
`results/walk_policy` — the artifact tests/test_gait_gate.py gates on —
after re-evaluating it on CPU under REFERENCE reward semantics against
the shared gate bar (quadruped_tpu/learn/gate.py: healthy >= 0.80,
tracking <= 0.15 m/s, full episodes, distance >= 0.5*|v_des|*T,
feet_airtime > 0, 8 episodes — a stander cannot pass).  Renders a gait
MP4 from the fresh eval trajectory and writes the gate verdict next to
the artifact.  Refuses to promote a policy that fails the gate unless
--force.

Usage:
    python tools/snapshot_walk_policy.py models/<run>  [--force]

Counterpart: the reference README endorses its shipped
models/2024-04-16_10-11-57-* artifact as "working well" (README.md:27);
this tool is how an equivalent artifact gets committed here.
"""

import sys

sys.path.insert(0, "/root/repo")
import argparse
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
    ap.add_argument("--episodes", type=int, default=None,
                    help="override gate episode count (default: the "
                         "gate's own, 8)")
    ap.add_argument("--source", default="best_model",
                    help="subdir of run_dir to promote (a checkpoint_N "
                         "works too; its metadata now records the same "
                         "interface fields as best_model)")
    args = ap.parse_args()

    from quadruped_tpu.learn.gate import GATE_EPISODES, evaluate_gate

    src = args.run_dir / args.source
    meta = json.loads((src / "metadata.json").read_text())
    print(f"candidate: {src}\n  metadata: "
          f"{ {k: v for k, v in meta.items() if k != 'gait_metrics'} }")

    print("evaluating on CPU (reference reward semantics, shared gate)...")
    v = evaluate_gate(src, episodes=args.episodes or GATE_EPISODES)
    out, ep_len, env = v.pop("_out"), v.pop("_ep_len"), v.pop("_env")
    print(json.dumps(v, indent=1))
    if not v["gate"] and not args.force:
        print("GATE FAILED — not promoting (use --force to override)")
        return 2

    args.out.parent.mkdir(parents=True, exist_ok=True)
    if args.out.exists():
        shutil.rmtree(args.out)
    shutil.copytree(src, args.out)
    meta["gate_eval"] = v
    meta["promoted_from"] = str(src)
    (args.out / "metadata.json").write_text(json.dumps(meta, indent=1))

    # gait video from THIS eval's trajectory
    try:
        from quadruped_tpu.viz.render import render_trajectory

        qpos = np.asarray(out["qpos"][0])[: int(ep_len[0])]
        every = max(1, int(1 / (env.cfg.dt * 30)))
        render_trajectory(
            qpos, args.out / "gait.mp4", env.cfg.ctrl_type, fps=30,
            every=every, robot=env.cfg.robot,
        )
        print(f"rendered {args.out / 'gait.mp4'}")
    except Exception as e:  # video is evidence, not the artifact
        print(f"video render failed (artifact still promoted): {e}")

    print(f"promoted -> {args.out}  (gate={'PASS' if v['gate'] else 'FORCED'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
