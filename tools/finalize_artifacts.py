import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import json
from pathlib import Path
from quadruped_tpu.checkpoint import TrainingHistory
from quadruped_tpu.viz import plots

r1 = Path("models/2026-08-17_06-29-10-gait5M-torque")
r2 = Path("models/2026-08-17_07-50-54-gait5M-torque-resume")
out = Path("results/gait5M-torque")
out.mkdir(parents=True, exist_ok=True)

h1 = json.loads((r1 / "training_history.json").read_text())
h2 = json.loads((r2 / "training_history.json").read_text())
merged = TrainingHistory()
for h in (h1, h2):
    for t, r, l, s in zip(h["timesteps"], h["rewards"], h["lengths"], h["successes"]):
        merged.append(t, r, l, bool(s))
merged.save(out / "training_history.json")
plots.save_progress_plot(merged, out / "training_progress.png")
print("evals:", len(merged.series["timesteps"]), "best:", merged.best_reward, flush=True)

# short final video: last eval spool, 400 frames
from quadruped_tpu.viz.render import render_spool
spools = sorted((r2 / "trajectories").glob("*.qtl"))
print("rendering", spools[-1], flush=True)
from quadruped_tpu.native import read_log
from quadruped_tpu.viz.render import render_trajectory
_, _, qpos = read_log(spools[-1])
render_trajectory(qpos[:800], out / "eval_final.mp4", "torque",
                  width=480, height=360, every=2)
print("video done", flush=True)
