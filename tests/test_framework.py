"""Monitor server, viz, CLI and runner-component tests."""

import json
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    base = tmp_path_factory.mktemp("monitor")
    (base / "training_videos").mkdir()
    # a fake "video" file: content correctness matters, codec doesn't
    (base / "training_videos" / "a.mp4").write_bytes(bytes(range(256)) * 4)
    (base / "training_progress.png").write_bytes(b"\x89PNG fake")
    from quadruped_tpu.monitor.server import serve

    httpd = serve(port=18898, base=str(base), background=True)
    time.sleep(0.2)
    yield "http://127.0.0.1:18898", base
    httpd.shutdown()


def _get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req) as r:
        return r.status, dict(r.headers), r.read()


def test_monitor_index(server):
    url, _ = server
    status, headers, body = _get(url + "/")
    assert status == 200
    assert b"a.mp4" in body
    status, _, body = _get(url + "/main")
    assert status == 200


def test_monitor_api_videos(server):
    url, _ = server
    status, _, body = _get(url + "/api/videos")
    vids = json.loads(body)
    assert vids[0]["name"] == "a.mp4"
    assert vids[0]["size"] == 1024


def test_monitor_thumbnail(server):
    """/thumb/<name> returns a JPEG first frame for a real MP4 and 404 for
    an unreadable one."""
    import cv2
    import numpy as np
    import urllib.error

    url, base = server
    # a real 2-frame video the thumbnailer can decode
    w = cv2.VideoWriter(
        str(base / "training_videos" / "real.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48),
    )
    for _ in range(2):
        w.write(np.full((48, 64, 3), 128, np.uint8))
    w.release()
    status, headers, body = _get(f"{url}/thumb/real.mp4")
    assert status == 200
    assert headers["Content-Type"] == "image/jpeg"
    assert body[:2] == b"\xff\xd8"  # JPEG SOI
    # the fake byte-blob video is unreadable -> 404, not a crash
    try:
        status, _h, _b = _get(f"{url}/thumb/a.mp4")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404
    # index page references thumbnails
    _s, _h, page = _get(f"{url}/")
    assert b"/thumb/real.mp4" in page


def test_monitor_progress_image(server):
    url, _ = server
    status, headers, body = _get(url + "/training_progress.png")
    assert status == 200 and headers["Content-Type"] == "image/png"
    status, _, body = _get(url + "/showimage")
    assert status == 200


def test_monitor_range_streaming(server):
    """206 partial content with correct bytes (monitorserver.py:120-205)."""
    url, _ = server
    status, headers, body = _get(
        url + "/stream/a.mp4", {"Range": "bytes=10-25"}
    )
    assert status == 206
    assert headers["Content-Range"] == "bytes 10-25/1024"
    assert body == (bytes(range(256)) * 4)[10:26]
    # open-ended range
    status, headers, body = _get(
        url + "/stream/a.mp4", {"Range": "bytes=1000-"}
    )
    assert status == 206 and len(body) == 24
    # no range -> 200 full
    status, headers, body = _get(url + "/stream/a.mp4")
    assert status == 200 and len(body) == 1024
    # traversal guarded
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        _get(url + "/stream/../../etc/passwd")


def test_progress_plot(tmp_path):
    from quadruped_tpu.checkpoint import TrainingHistory
    from quadruped_tpu.viz.plots import save_progress_plot

    h = TrainingHistory()
    for i in range(20):
        h.append(i * 1000, float(i + np.sin(i)), 100 + i, i % 3 == 0)
    out = save_progress_plot(h, tmp_path / "prog.png")
    assert Path(out).stat().st_size > 1000


def test_history_best_score(tmp_path):
    """Gait-scored best-model ranking (round-3 fix: under the reference
    reward floor every early eval reward is exactly 0.0, so reward-ranked
    'best' degenerates to 'first eval wins')."""
    from quadruped_tpu.checkpoint import TrainingHistory

    # reward-ranked (default): all-zero rewards -> only the first is best
    h = TrainingHistory()
    assert h.append(1000, 0.0, 100, False) is True
    assert h.append(2000, 0.0, 120, False) is False

    # gait-scored: improving healthy/tracking wins even at reward 0.0
    h = TrainingHistory()
    h.set_score_metric("gait")
    g1 = {"healthy_frac": 0.3, "tracking_error": 0.9, "distance": 0.1}
    g2 = {"healthy_frac": 0.8, "tracking_error": 0.2, "distance": 1.0}
    assert h.append(1000, 0.0, 100, False, gait_metrics=g1,
                    score=g1["healthy_frac"] - g1["tracking_error"]) is True
    assert h.append(2000, 0.0, 120, False, gait_metrics=g2,
                    score=g2["healthy_frac"] - g2["tracking_error"]) is True
    assert h.append(3000, 0.0, 120, False, gait_metrics=g1,
                    score=g1["healthy_frac"] - g1["tracking_error"]) is False
    assert h.best_score == pytest.approx(0.6)
    # eval reward still tracked for display parity
    assert h.best_reward == 0.0

    # round-trips through save/load; switching metric resets the score
    h.save(tmp_path / "h.json")
    h2 = TrainingHistory.load(tmp_path / "h.json")
    assert h2.best_score == pytest.approx(0.6)
    assert h2.score_metric == "gait"
    h2.set_score_metric("reward")
    assert h2.best_score == -float("inf")
    # old-format files (no score fields) load as reward-scored
    import json

    payload = json.loads((tmp_path / "h.json").read_text())
    del payload["best_score"], payload["score_metric"]
    (tmp_path / "old.json").write_text(json.dumps(payload))
    h3 = TrainingHistory.load(tmp_path / "old.json")
    assert h3.score_metric == "reward" and h3.best_score == 0.0


def test_termination_histogram():
    from quadruped_tpu.viz.plots import (
        format_termination_table, termination_histogram,
    )

    h = termination_histogram([2, 2, 3, 4, 4, 4])
    assert h == {"unhealthy_z": 2, "unhealthy_roll": 1, "unhealthy_pitch": 3}
    table = format_termination_table(h)
    assert "unhealthy_pitch" in table and "50.0%" in table


def test_wireframe_video(tmp_path):
    """Trajectory -> MP4 via the GL-less fallback renderer."""
    from quadruped_tpu.assets import go1_model
    from quadruped_tpu.viz.render import TrajectoryRenderer, write_video

    m = go1_model("torque")
    r = TrajectoryRenderer.__new__(TrajectoryRenderer)
    r.width, r.height, r.ctrl_type, r.backend = 160, 120, "torque", "wireframe"
    r.robot = "go1"
    frames = [r.frame(m.key_qpos[0]) for _ in range(5)]
    out = write_video(tmp_path / "t.mp4", frames, fps=10)
    assert Path(out).stat().st_size > 500


def test_cli_parser_accepts_reference_flags():
    """Every flag the reference's argparse accepts must parse
    (train.py:141-225)."""
    from quadruped_tpu.cli.train import build_parser

    p = build_parser()
    args = p.parse_args(
        [
            "--run", "train", "--run_name", "x", "--num_parallel_envs", "12",
            "--num_test_episodes", "5", "--record_test_episodes",
            "--total_timesteps", "1000", "--eval_frequency", "100",
            "--model_path", "m", "--ctrl_type", "torque", "--biped",
            "--video_duration", "10", "--video_interval", "500",
            "--rand_power", "0.5", "--learning_rate", "1e-4", "--seed", "3",
        ]
    )
    assert args.biped and args.rand_power == 0.5


def test_cli_locomotion_profile():
    """--reward_profile locomotion zeroes the fall-recovery channels and
    fallen starts (the objective the reference's walking-era artifacts were
    trained on — results/parity/ENDORSED_MODELS.md)."""
    from quadruped_tpu.cli.train import build_parser, make_env

    p = build_parser()
    args = p.parse_args(
        ["--run", "train", "--reward_profile", "locomotion"]
    )
    env = make_env(args)
    assert env.cfg.rewards.get_up == 0.0
    assert env.cfg.rewards.recovery == 0.0
    assert env.cfg.fallen_start_prob == 0.0
    # the rest of the stack is untouched
    assert env.cfg.rewards.linear_vel_tracking == 2.0
    assert env.cfg.costs.unhealthy_state == 5.0

    default = make_env(p.parse_args(["--run", "train"]))
    assert default.cfg.rewards.get_up == 20.0
    assert default.cfg.fallen_start_prob == 0.2


def test_bundled_visual_model_compiles():
    """The self-contained mesh-visual scene (assets/go1_visual.npz +
    injected visual geoms) must compile in mujoco with no reference
    checkout present (VERDICT r1 missing #4)."""
    import mujoco

    from quadruped_tpu.viz.render import _bundled_visual_model

    for ctrl in ("torque", "position"):
        out = _bundled_visual_model(ctrl)
        assert out is not None
        xml, vfs = out
        assert set(vfs) == {
            "calf.stl", "hip.stl", "thigh.stl", "thigh_mirror.stl",
            "trunk.stl",
        }
        mj = mujoco.MjModel.from_xml_string(xml, vfs)
        # 13 injected visual geoms (group 2), one per placement
        assert int((mj.geom_group == 2).sum()) == 13
        # physics untouched: same nq/nv/nu as the physics-only model
        from quadruped_tpu.assets import go1_xml

        phys = mujoco.MjModel.from_xml_string(go1_xml(ctrl))
        assert (mj.nq, mj.nv, mj.nu) == (phys.nq, phys.nv, phys.nu)


def test_runner_eval(tmp_path):
    """Deterministic evaluation: shapes, finiteness, episode accounting."""
    import jax

    from quadruped_tpu.env.config import Go1Config
    from quadruped_tpu.env.go1 import Go1Env
    from quadruped_tpu.learn.ppo import PPOConfig
    from quadruped_tpu.learn.runner import Runner, RunnerConfig

    env = Go1Env(Go1Config(ctrl_type="torque"))
    runner = Runner(
        env,
        PPOConfig(num_envs=4, n_steps=2, num_minibatches=2, n_epochs=1),
        RunnerConfig(n_eval_episodes=2, eval_max_time=0.2, verbose=False),
    )
    ts = runner.trainer.init(jax.random.PRNGKey(0))
    ep_rew, ep_len, success, out = runner.evaluate(ts, jax.random.PRNGKey(1))
    assert ep_rew.shape == (2,) and ep_len.shape == (2,)
    assert out["qpos"].shape[0] == 2 and out["qpos"].shape[2] == 19
    assert np.isfinite(ep_rew).all()


def test_capacity_probe_smoke():
    from quadruped_tpu.cli.capacity import probe

    res = probe([4, 8], steps=2)
    assert len(res) == 2
    assert res[1]["steps_per_sec"] > 0
