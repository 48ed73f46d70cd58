"""Native trajectory spool (C++/ctypes) tests."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke


def test_trajlog_roundtrip(tmp_path):
    from quadruped_tpu.native import TrajectoryLog, read_log

    path = tmp_path / "run.qtl"
    rng = np.random.default_rng(0)
    qpos = rng.normal(size=(50, 19)).astype(np.float32)
    rewards = rng.normal(size=50).astype(np.float32)
    with TrajectoryLog(path, nq=19) as log:
        for i in range(50):
            log.append(1000 + i, float(rewards[i]), qpos[i])
        log.flush()
        steps, r, q = read_log(path)
        assert len(steps) == 50
    steps, r, q = read_log(path)
    np.testing.assert_array_equal(steps, np.arange(1000, 1050))
    np.testing.assert_allclose(r, rewards)
    np.testing.assert_allclose(q, qpos)


def test_trajlog_async_volume(tmp_path):
    """Writer thread keeps up with a burst of appends."""
    from quadruped_tpu.native import TrajectoryLog, read_log

    path = tmp_path / "big.qtl"
    q = np.zeros(19, np.float32)
    with TrajectoryLog(path, nq=19) as log:
        for i in range(5000):
            log.append(i, 0.5, q)
        log.flush()
    steps, r, qq = read_log(path)
    assert len(steps) == 5000
