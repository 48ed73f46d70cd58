"""Contact/constraint/solver parity vs the mujoco oracle.

These tests pin the full constrained-dynamics path: efc row assembly
(R/aref/J), Newton solver qacc, cfrc_ext accumulation, and multi-step
trajectory tracking through contact-rich states.
"""

import copy

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from quadruped_tpu.assets import go1_model, go1_xml
from quadruped_tpu.physics import constraint, kinematics, smooth, solver
from quadruped_tpu.physics.forward import Pipeline, forward, step


@pytest.fixture(scope="module")
def setup():
    m = go1_model("torque")
    m.opt.iterations = 40  # tight parity; training default is looser
    m.opt.solver_precision = "highest"
    pl = Pipeline.build(m, "plane")
    mj = mujoco.MjModel.from_xml_string(go1_xml("torque"))
    return m, pl, mj


def test_invweights_match_oracle(setup):
    m, pl, mj = setup
    dinv, binv = constraint.invweights(m)
    np.testing.assert_allclose(dinv, mj.dof_invweight0, atol=1e-10)
    np.testing.assert_allclose(binv, mj.body_invweight0, atol=1e-10)


def _states(mj, seed, n):
    """Contact-rich states: standing with penetration, tilted, fallen."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        qpos = mj.key_qpos[0].copy()
        if i % 3 == 1:  # tilted / partially fallen
            ang = rng.uniform(0.3, 1.2)
            qpos[3:7] = [np.cos(ang / 2), np.sin(ang / 2), 0, 0]
            qpos[2] = rng.uniform(0.1, 0.25)
        elif i % 3 == 2:  # deep stand + random joints
            qpos[2] = rng.uniform(0.25, 0.28)
            qpos[7:] += rng.uniform(-0.3, 0.3, 12)
        else:
            qpos[2] = rng.uniform(0.26, 0.29)
        qvel = rng.uniform(-1.0, 1.0, mj.nv)
        ctrl = rng.uniform(-0.5, 0.5, mj.nu)
        out.append((qpos, qvel, ctrl))
    return out


def test_efc_rows_match_oracle(setup):
    """R, aref and J of every active constraint row match mjData.efc_*."""
    m, pl, mj = setup
    d = mujoco.MjData(mj)
    g1 = pl.table.cand_meta("geom1")
    g2 = pl.table.cand_meta("geom2")
    for qpos, qvel, _ in _states(mj, 0, 6):
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(mj, d)
        kin = kinematics.fk(m, jnp.asarray(qpos), jnp.asarray(qvel))
        efc = constraint.assemble(
            m, pl.layout, pl.table, kin, jnp.asarray(qpos), jnp.asarray(qvel)
        )
        # friction rows lead in both layouts
        np.testing.assert_allclose(efc.aref[:12], d.efc_aref[:12], atol=1e-9)
        np.testing.assert_allclose(efc.R[:12], d.efc_R[:12], atol=1e-9)

        nf, nl = efc.nf, efc.nl
        ncon = pl.layout.ncon

        def expand(rows):
            rows = np.asarray(rows)
            out = np.zeros((ncon, 6) + rows.shape[1:], rows.dtype)
            out[np.asarray(efc.row_con), np.asarray(efc.row_dim)] = rows
            return out

        conJ = expand(efc.J[nf + nl :])
        conR = expand(efc.R[nf + nl :])
        conA = expand(efc.aref[nf + nl :])
        act = np.asarray(efc.con_active)
        pos = np.asarray(efc.con_pos)
        Jmj = d.efc_J.reshape(d.nefc, mj.nv)
        row = 12 + nl_active_rows(d)
        matched = 0
        for i in range(d.ncon):
            c = d.contact[i]
            cands = np.where((g1 == c.geom1) & (g2 == c.geom2) & act)[0]
            if len(cands) == 0:
                row += c.dim
                continue
            best = cands[np.argmin(np.linalg.norm(pos[cands] - c.pos, axis=1))]
            if np.linalg.norm(pos[best] - c.pos) < 1e-9:
                np.testing.assert_allclose(
                    conR[best, : c.dim], d.efc_R[row : row + c.dim], rtol=1e-6
                )
                np.testing.assert_allclose(
                    conA[best, : c.dim], d.efc_aref[row : row + c.dim],
                    atol=1e-6,
                )
                np.testing.assert_allclose(
                    conJ[best, : c.dim], Jmj[row : row + c.dim], atol=1e-9
                )
                matched += 1
            row += c.dim
        # the dominant contacts (feet on ground) must be matched
        assert matched >= min(d.ncon, 4) or d.ncon == 0


def nl_active_rows(d):
    """Number of joint-limit rows mujoco included (they precede contacts)."""
    return int(np.sum(d.efc_type == 3))


def test_qacc_matches_oracle(setup):
    """Constrained qacc matches mj_forward across contact-rich states.

    Plane-cylinder narrowphase differs by design (4 rim candidates vs
    MuJoCo's disc algorithm), so states are built to keep hip cylinders off
    the floor; feet/calf/thigh/trunk contacts are exercised.
    """
    m, pl, mj = setup
    d = mujoco.MjData(mj)
    params = m.params()
    fwd = jax.jit(
        lambda qp, qv, ct: forward(pl, params, qp, qv, ct)[0].qacc,
    )
    checked = 0
    for qpos, qvel, ctrl in _states(mj, 1, 6):
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        d.ctrl[:] = ctrl
        mujoco.mj_forward(mj, d)
        # skip states where mujoco generated cylinder-floor contacts
        cyl = any(
            mj.geom_type[d.contact[i].geom2] == mujoco.mjtGeom.mjGEOM_CYLINDER
            for i in range(d.ncon)
        )
        if cyl:
            continue
        qacc = fwd(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
        scale = max(1.0, np.abs(d.qacc).max())
        np.testing.assert_allclose(
            np.asarray(qacc) / scale, d.qacc / scale, atol=2e-5
        )
        checked += 1
    assert checked >= 3


def test_cfrc_ext_matches_oracle(setup):
    m, pl, mj = setup
    d = mujoco.MjData(mj)
    params = m.params()
    d.qpos[:] = mj.key_qpos[0]
    d.qpos[2] = 0.265
    d.qvel[:] = 0.1
    mujoco.mj_forward(mj, d)
    mujoco.mj_rnePostConstraint(mj, d)
    data, _ = forward(
        pl, params, jnp.asarray(d.qpos.copy()), jnp.asarray(d.qvel.copy()),
        jnp.zeros(12),
    )
    np.testing.assert_allclose(data.cfrc_ext, d.cfrc_ext, atol=1e-5)
    # feet norms: the quantity the reference thresholds at 1.0
    feet = [4, 7, 10, 13]
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(data.cfrc_ext)[feet], axis=1),
        np.linalg.norm(d.cfrc_ext[feet], axis=1),
        rtol=1e-6,
    )


def test_trajectory_tracks_oracle(setup):
    """150 substeps of settling + actuation stay within 1e-5 of mj_step."""
    m, pl, mj = setup
    d = mujoco.MjData(mj)
    d.qpos[:] = mj.key_qpos[0]
    params = m.params()
    stepj = jax.jit(lambda qp, qv, ct: step(pl, params, qp, qv, ct))
    qp = jnp.asarray(np.array(d.qpos))
    qv = jnp.asarray(np.array(d.qvel))
    for i in range(150):
        ctrl = 0.3 * np.sin(0.01 * i * np.arange(12))
        d.ctrl[:] = ctrl
        mujoco.mj_step(mj, d)
        qp, qv, _ = stepj(qp, qv, jnp.asarray(ctrl))
    assert np.abs(np.asarray(qp) - d.qpos).max() < 1e-5
    assert np.abs(np.asarray(qv) - d.qvel).max() < 1e-4


def test_joint_limit_rows(setup):
    """A violated joint limit produces the oracle's restoring dynamics."""
    m, pl, mj = setup
    d = mujoco.MjData(mj)
    params = m.params()
    d.qpos[:] = mj.key_qpos[0]
    d.qpos[2] = 1.0   # airborne: isolate the limit constraint
    d.qpos[7] = -0.9  # FR abduction beyond -0.863 (outward: no self contact)
    mujoco.mj_forward(mj, d)
    data, _ = forward(
        pl, params, jnp.asarray(np.array(d.qpos)),
        jnp.asarray(np.array(d.qvel)), jnp.zeros(12),
    )
    scale = max(1.0, np.abs(d.qacc).max())
    np.testing.assert_allclose(
        np.asarray(data.qacc) / scale, d.qacc / scale, atol=1e-6
    )


def test_pooled_overflow_detection(setup):
    """Condim pools: actives beyond a class budget are counted in
    con_overflow (silent contact softening must be observable — ADVICE
    r1), and within-budget states report zero."""
    m, _pl, _mj = setup
    mfull = go1_model("torque")
    # tiny condim-3 budget: a fallen trunk state activates many
    # non-foot-vs-floor (condim-3) candidates
    pl_tiny = Pipeline.build(
        mfull, "full", max_contacts=48,
        contact_pools={6: 8, 3: 2, 1: 12},
    )
    pl_ok = Pipeline.build(
        mfull, "full", max_contacts=48,
        contact_pools={6: 8, 3: 28, 1: 12},
    )
    qpos = np.asarray(mfull.key_qpos[0], np.float64).copy()
    qpos[2] = 0.12
    qpos[3:7] = [0.735, 0.678, 0, 0]
    qpos[3:7] /= np.linalg.norm(qpos[3:7])
    q = jnp.asarray(qpos, jnp.float32)
    v = jnp.zeros(mfull.nv, jnp.float32)
    kin = kinematics.fk(mfull, q, v)
    efc_tiny = constraint.assemble(
        mfull, pl_tiny.layout, pl_tiny.table, kin, q, v
    )
    efc_ok = constraint.assemble(mfull, pl_ok.layout, pl_ok.table, kin, q, v)
    assert int(efc_tiny.con_overflow) > 0
    assert int(efc_ok.con_overflow) == 0
    # the pooled row map is static and matches the pool budgets
    assert efc_ok.pool_dims == ((8, 6), (28, 3), (12, 1))
    assert len(efc_ok.row_con) == 8 * 6 + 28 * 3 + 12 * 1
