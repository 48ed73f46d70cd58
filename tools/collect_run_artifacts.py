"""Copy a training run's judge-facing artifacts into results/ (tracked).

models/ and logs/ are gitignored (checkpoints are heavy); this snapshots
the lightweight evidence: training history, progress plot, best-policy
metadata, and a rendered eval video.

Usage: python tools/collect_run_artifacts.py <run_dir> <name>
"""

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# rendering is CPU work; never let the jax import grab the TPU tunnel
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    run_dir = Path(sys.argv[1])
    name = sys.argv[2]
    out = Path(__file__).parent.parent / "results" / name
    out.mkdir(parents=True, exist_ok=True)

    for f in ("training_history.json", "training_progress.png"):
        if (run_dir / f).exists():
            shutil.copy(run_dir / f, out / f)

    meta = run_dir / "best_model" / "metadata.json"
    if meta.exists():
        shutil.copy(meta, out / "best_model_metadata.json")

    # render the most recent eval trajectory spool to MP4
    spools = sorted((run_dir / "trajectories").glob("*.qtl"))
    if spools:
        from quadruped_tpu.viz.render import render_spool

        render_spool(
            spools[-1], out / "eval_final.mp4", ctrl_type="torque",
            width=640, height=480, every=2,
        )

    hist = json.loads((out / "training_history.json").read_text())
    print(json.dumps({
        "best_reward": hist.get("best_reward"),
        "evals": len(hist.get("timesteps", [])),
        "final_eval_reward": (hist.get("rewards") or [None])[-1],
        "artifacts": sorted(p.name for p in out.iterdir()),
    }, indent=2))


if __name__ == "__main__":
    main()
