"""Snapshot live training progress into git so a host restart cannot
erase it.

Round-5 lesson: the round-4->5 flagship reached 75.2M steps, but every
checkpoint lived in the uncommitted models/ dir; a machine restart wiped
all of it and the run had to start over.  Training runs are hours of
chip time — the newest best_model (a ~100 KB MLP) and the history JSON
must be committed as they appear, like the reference commits its run
dirs (/root/reference/models/, 17 of them).

Usage (manual or from a watch loop):
  python tools/persist_progress.py <run_name> [--commit]

Copies, for the newest models/ segment dir matching *<run_name>*:
  best_model/ (params + metadata), training_history.json, and the
  highest-numbered periodic checkpoint_N (params only if it has them)
into results/live/<run_name>/ and optionally `git add + commit`.
"""

from __future__ import annotations

import argparse
import re
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def newest_run_dir(run_name: str) -> Path | None:
    cands = sorted(
        p for p in (REPO / "models").glob(f"*{run_name}*") if p.is_dir()
    )
    return cands[-1] if cands else None


def highest_checkpoint(run_dir: Path) -> Path | None:
    best = None
    for p in run_dir.iterdir():
        m = re.fullmatch(r"checkpoint_(\d+)", p.name)
        if m and (p / "metadata.json").exists():
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, p)
    return best[1] if best else None


def copy_tree(src: Path, dst: Path):
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(src, dst)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_name")
    ap.add_argument("--commit", action="store_true")
    args = ap.parse_args()

    run_dir = newest_run_dir(args.run_name)
    if run_dir is None:
        print(f"no models/*{args.run_name}* dir yet")
        return 1
    out = REPO / "results" / "live" / args.run_name
    out.mkdir(parents=True, exist_ok=True)

    copied = []
    for name in ("best_model",):
        src = run_dir / name
        if src.exists() and (src / "metadata.json").exists():
            copy_tree(src, out / name)
            copied.append(name)
    ck = highest_checkpoint(run_dir)
    if ck is not None:
        copy_tree(ck, out / "latest_checkpoint")
        (out / "latest_checkpoint_name.txt").write_text(ck.name + "\n")
        copied.append(ck.name)
    hist = run_dir / "training_history.json"
    if hist.exists():
        shutil.copy2(hist, out / "training_history.json")
        copied.append("training_history.json")

    if not copied:
        print(f"{run_dir}: nothing persistable yet")
        return 1
    print(f"persisted {copied} from {run_dir.name} -> {out}")
    if args.commit:
        subprocess.run(["git", "add", str(out)], cwd=REPO, check=True)
        r = subprocess.run(
            ["git", "commit", "-m",
             f"Persist live {args.run_name} progress ({', '.join(copied)})"],
            cwd=REPO,
        )
        return r.returncode
    return 0


if __name__ == "__main__":
    sys.exit(main())
