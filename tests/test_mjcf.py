"""MJCF compiler parity vs the mujoco C compiler (oracle).

Builds mujoco.MjModel from our exported XML and compares every compiled
array field-by-field.  This pins our standalone compiler to MuJoCo
semantics before any dynamics code runs on top of it.
"""

import mujoco
import pytest

pytestmark = pytest.mark.smoke
import numpy as np
import pytest

from quadruped_tpu.assets import go1_model, go1_xml, robot_model, robot_xml
from quadruped_tpu.mjcf.model import ACT_MOTOR, ACT_POSITION, CONE_ELLIPTIC


@pytest.fixture(
    scope="module",
    params=["go1-torque", "go1-position", "go2-torque", "go2-position"],
)
def pair(request):
    robot, ctrl = request.param.split("-")
    m = robot_model(robot, ctrl)
    mj = mujoco.MjModel.from_xml_string(robot_xml(robot, ctrl))
    return m, mj, ctrl, robot


def test_sizes(pair):
    m, mj, _ctrl, _robot = pair
    assert m.nq == mj.nq == 19
    assert m.nv == mj.nv == 18
    assert m.nu == mj.nu == 12
    assert m.nbody == mj.nbody == 14
    assert m.njnt == mj.njnt == 13
    assert m.ngeom == mj.ngeom
    assert m.nkey == mj.nkey == 1


def test_option(pair):
    m, mj, _ctrl, _robot = pair
    assert m.opt.timestep == mj.opt.timestep
    assert m.opt.impratio == mj.opt.impratio == 100.0
    assert m.opt.cone == CONE_ELLIPTIC == mj.opt.cone
    np.testing.assert_allclose(m.opt.gravity, mj.opt.gravity)


def test_bodies(pair):
    m, mj, _ctrl, _robot = pair
    np.testing.assert_array_equal(m.body_parentid, mj.body_parentid)
    np.testing.assert_array_equal(m.body_rootid, mj.body_rootid)
    np.testing.assert_array_equal(m.body_jntadr, mj.body_jntadr)
    np.testing.assert_array_equal(m.body_jntnum, mj.body_jntnum)
    np.testing.assert_array_equal(m.body_dofadr, mj.body_dofadr)
    np.testing.assert_array_equal(m.body_dofnum, mj.body_dofnum)
    np.testing.assert_allclose(m.body_pos, mj.body_pos, atol=1e-12)
    np.testing.assert_allclose(m.body_quat, mj.body_quat, atol=1e-9)
    np.testing.assert_allclose(m.body_ipos, mj.body_ipos, atol=1e-12)
    np.testing.assert_allclose(m.body_iquat, mj.body_iquat, atol=1e-9)
    np.testing.assert_allclose(m.body_mass, mj.body_mass, atol=1e-12)
    np.testing.assert_allclose(m.body_inertia, mj.body_inertia, atol=1e-12)
    trunk = m.name2id("body", "trunk")
    assert mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_BODY.value, "trunk") == trunk


def test_joints_dofs(pair):
    m, mj, _ctrl, _robot = pair
    np.testing.assert_array_equal(m.jnt_type, mj.jnt_type)
    np.testing.assert_array_equal(m.jnt_bodyid, mj.jnt_bodyid)
    np.testing.assert_array_equal(m.jnt_qposadr, mj.jnt_qposadr)
    np.testing.assert_array_equal(m.jnt_dofadr, mj.jnt_dofadr)
    np.testing.assert_allclose(m.jnt_axis, mj.jnt_axis)
    np.testing.assert_allclose(m.jnt_range, mj.jnt_range)
    np.testing.assert_array_equal(m.jnt_limited, mj.jnt_limited.astype(bool))
    np.testing.assert_allclose(m.dof_armature, mj.dof_armature)
    np.testing.assert_allclose(m.dof_damping, mj.dof_damping)
    np.testing.assert_allclose(m.dof_frictionloss, mj.dof_frictionloss)
    np.testing.assert_array_equal(m.dof_bodyid, mj.dof_bodyid)
    np.testing.assert_array_equal(m.dof_jntid, mj.dof_jntid)


def test_geoms(pair):
    m, mj, _ctrl, _robot = pair
    np.testing.assert_array_equal(m.geom_type, mj.geom_type)
    np.testing.assert_array_equal(m.geom_bodyid, mj.geom_bodyid)
    np.testing.assert_allclose(m.geom_pos, mj.geom_pos, atol=1e-12)
    # quaternion sign is arbitrary: compare up to sign
    sign = np.sign(np.sum(m.geom_quat * mj.geom_quat, axis=1, keepdims=True))
    np.testing.assert_allclose(m.geom_quat * sign, mj.geom_quat, atol=1e-9)
    np.testing.assert_allclose(m.geom_size, mj.geom_size, atol=1e-12)
    np.testing.assert_array_equal(m.geom_contype, mj.geom_contype)
    np.testing.assert_array_equal(m.geom_conaffinity, mj.geom_conaffinity)
    np.testing.assert_array_equal(m.geom_condim, mj.geom_condim)
    np.testing.assert_array_equal(m.geom_priority, mj.geom_priority)
    np.testing.assert_allclose(m.geom_friction, mj.geom_friction)
    np.testing.assert_allclose(m.geom_solref, mj.geom_solref)
    np.testing.assert_allclose(m.geom_solimp, mj.geom_solimp)
    np.testing.assert_allclose(m.geom_margin, mj.geom_margin)


def test_actuators(pair):
    m, mj, ctrl, robot = pair
    np.testing.assert_allclose(m.actuator_gear, mj.actuator_gear[:, 0])
    np.testing.assert_allclose(m.actuator_ctrlrange, mj.actuator_ctrlrange)
    np.testing.assert_allclose(m.actuator_forcerange, mj.actuator_forcerange)
    if ctrl == "torque":
        assert (m.actuator_kind == ACT_MOTOR).all()
        gears = ([23, 23, 35] if robot == "go1" else [23.7, 23.7, 45.43]) * 4
        np.testing.assert_allclose(m.actuator_gear, gears)
    else:
        assert (m.actuator_kind == ACT_POSITION).all()
        # position gain/bias: gainprm[0]=kp, biasprm=[0,-kp,-kv]
        np.testing.assert_allclose(m.actuator_kp, mj.actuator_gainprm[:, 0])
        np.testing.assert_allclose(-m.actuator_kp, mj.actuator_biasprm[:, 1])


def test_keyframe(pair):
    m, mj, _ctrl, robot = pair
    np.testing.assert_allclose(m.key_qpos, mj.key_qpos)
    np.testing.assert_allclose(m.key_ctrl, mj.key_ctrl)
    # home keyframe matches the reference stand pose (go1_torque.xml:230-233;
    # go2 stands slightly lower, tools/gen_go2_assets.py)
    z = 0.30 if robot == "go1" else 0.29
    np.testing.assert_allclose(
        m.key_qpos[0],
        [0, 0, z, 1, 0, 0, 0] + [0, 0.9, -1.8] * 4,
    )


def test_matches_reference_xml():
    """When the upstream reference checkout is present, our bundled JSON spec
    must compile to the same model as the original scene XML."""
    import pathlib

    ref = pathlib.Path("/root/reference/unitree_go1/scene_torque.xml")
    if not ref.exists():
        pytest.skip("reference checkout not available")
    # the reference checkout lacks the STL meshes, so mujoco cannot compile
    # it; parse through our own compiler instead and diff compiled arrays.
    from quadruped_tpu.mjcf import parse_file

    ref_m = parse_file(str(ref))
    m = go1_model("torque")
    assert m.nq == ref_m.nq and m.nv == ref_m.nv and m.nu == ref_m.nu
    assert m.ngeom == ref_m.ngeom
    np.testing.assert_allclose(m.body_mass, ref_m.body_mass, atol=1e-12)
    np.testing.assert_allclose(m.body_pos, ref_m.body_pos, atol=1e-12)
    np.testing.assert_allclose(m.key_qpos[0], ref_m.key_qpos[0])
    np.testing.assert_allclose(m.actuator_gear, ref_m.actuator_gear)
    np.testing.assert_allclose(m.geom_size, ref_m.geom_size, atol=1e-12)
    np.testing.assert_allclose(m.geom_pos, ref_m.geom_pos, atol=1e-12)
    np.testing.assert_allclose(m.geom_friction, ref_m.geom_friction)
    np.testing.assert_array_equal(m.geom_condim, ref_m.geom_condim)
    assert m.opt.impratio == ref_m.opt.impratio
