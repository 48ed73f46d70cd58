"""One-time generator for the bundled Unitree Go2 robot assets
(BASELINE.json config 4: "Go2 rough-terrain heightfield locomotion").

The reference repo ships only the Go1; this MJCF is AUTHORED here from
Unitree's published Go2 dimensions (leg link lengths 0.213 m, hip offsets
+-0.1934/+-0.0955, joint ranges abduction +-1.0472 / hip [-1.5708, 3.4907]
/ knee [-2.7227, -0.83776], joint torque limits 23.7 N·m and 45.43 N·m
knee, total mass ~15 kg) with primitive collision geoms and
box/rod-approximated inertias, following the same MJCF idioms as the Go1
scene so the same parser/env/reward machinery drives both robots.  Body,
site, and actuator NAMES match the Go1 convention (trunk, {FR,FL,RR,RL}_
{hip,thigh,calf}, feet sites FR/FL/RR/RL) — the env looks entities up by
name (env/go1.py), so Go2 slots in with zero env changes.

Usage: python tools/gen_go2_assets.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from quadruped_tpu.mjcf import parse_raw  # noqa: E402
from quadruped_tpu.mjcf.parser import load_mjcf_string  # noqa: E402

DST = Path(__file__).resolve().parents[1] / "quadruped_tpu" / "assets"

# kinematic/dynamic constants (published Go2 spec; inertias are primitive
# approximations: trunk as a box, thigh/calf as rods)
HIP_X, HIP_Y = 0.1934, 0.0465
THIGH_Y = 0.0955
LEG_L = 0.213
TRUNK_M, HIP_M, THIGH_M, CALF_M = 6.921, 0.678, 1.152, 0.241
TAU_HIP, TAU_KNEE = 23.7, 45.43


def actuators(ctrl):
    rows = []
    for leg in ("FR", "FL", "RR", "RL"):
        for jnt, cls in (("hip", "abduction"), ("thigh", "hip"),
                         ("calf", "knee")):
            name = f"{leg}_{jnt}"
            if ctrl == "torque":
                gear = TAU_KNEE if jnt == "calf" else TAU_HIP
                rows.append(
                    f'<motor name="{name}" joint="{name}_joint" '
                    f'gear="{gear}" ctrlrange="-1 1" ctrllimited="true"/>'
                )
            else:
                rows.append(
                    f'<position name="{name}" joint="{name}_joint" '
                    f'class="{cls}"/>'
                )
    return "\n    ".join(rows)


def leg(prefix, fx, fy):
    """One leg subtree; fx/fy = +-1 select the quadrant."""
    mirror = fy < 0
    hip_cls = "hip_right" if mirror else "hip_left"
    ty = -THIGH_Y if mirror else THIGH_Y
    com_y = -0.02 if mirror else 0.02
    return f"""
      <body name="{prefix}_hip" pos="{fx * HIP_X} {fy * HIP_Y} 0">
        <inertial pos="{-fx * 0.0054} {com_y * 0.35} 0" mass="{HIP_M}"
          diaginertia="0.00048 0.00066 0.00048"/>
        <joint class="abduction" name="{prefix}_hip_joint"/>
        <geom class="{hip_cls}1"/>
        <geom class="{hip_cls}2"/>
        <body name="{prefix}_thigh" pos="0 {ty} 0">
          <inertial pos="-0.003 {com_y} -0.05" mass="{THIGH_M}"
            diaginertia="0.00436 0.00434 0.00085"/>
          <joint class="hip" name="{prefix}_thigh_joint"/>
          <geom class="thigh1"/>
          <geom class="thigh2"/>
          <geom class="thigh3"/>
          <body name="{prefix}_calf" pos="0 0 -{LEG_L}">
            <inertial pos="0.005 0 -0.1" mass="{CALF_M}"
              diaginertia="0.0012 0.0012 0.00006"/>
            <joint class="knee" name="{prefix}_calf_joint"/>
            <geom class="calf1"/>
            <geom class="calf2"/>
            <geom name="{prefix}" class="foot"/>
            <site name="{prefix}" pos="0 0 -{LEG_L}" type="sphere"
              size="0.023" group="5"/>
          </body>
        </body>
      </body>"""


def go2_xml(ctrl):
    home_joints = "0 0.9 -1.8 " * 4
    key_ctrl = home_joints.strip() if ctrl == "position" else ("0 " * 12).strip()
    return f"""<mujoco model="go2">
  <compiler angle="radian" autolimits="true"/>
  <option cone="elliptic" impratio="100"/>

  <default>
    <motor ctrllimited="true" ctrlrange="-1.0 1.0"/>
    <default class="go2">
      <geom friction="0.6" margin="0.001" condim="1"/>
      <joint axis="0 1 0" damping="2" armature="0.01" frictionloss="0.2"/>
      <position kp="100" forcerange="-{TAU_HIP} {TAU_HIP}"/>
      <default class="abduction">
        <joint axis="1 0 0" damping="1" range="-1.0472 1.0472"/>
        <position ctrlrange="-1.0472 1.0472"/>
      </default>
      <default class="hip">
        <joint range="-1.5708 3.4907"/>
        <position ctrlrange="-1.5708 3.4907"/>
      </default>
      <default class="knee">
        <joint range="-2.7227 -0.83776"/>
        <position forcerange="-{TAU_KNEE} {TAU_KNEE}"
          ctrlrange="-2.7227 -0.83776"/>
      </default>
      <default class="collision">
        <geom group="3" type="capsule"/>
        <default class="hip_left1">
          <geom size="0.046 0.02" pos="0 0.045 0" quat="1 1 0 0" type="cylinder"/>
        </default>
        <default class="hip_left2">
          <geom size="0.031 0.02" pos="0 0.07 0" quat="1 1 0 0" type="cylinder"/>
        </default>
        <default class="hip_right1">
          <geom size="0.046 0.02" pos="0 -0.045 0" quat="1 1 0 0" type="cylinder"/>
        </default>
        <default class="hip_right2">
          <geom size="0.031 0.02" pos="0 -0.07 0" quat="1 1 0 0" type="cylinder"/>
        </default>
        <default class="thigh1">
          <geom size="0.015" fromto="-0.02 0 0 -0.02 0 -0.16"/>
        </default>
        <default class="thigh2">
          <geom size="0.015" fromto="0 0 0 -0.02 0 -0.1"/>
        </default>
        <default class="thigh3">
          <geom size="0.015" fromto="-0.02 0 -0.16 0 0 -0.2"/>
        </default>
        <default class="calf1">
          <geom size="0.01" fromto="0 0 0 0.02 0 -0.13"/>
        </default>
        <default class="calf2">
          <geom size="0.01" fromto="0.02 0 -0.13 0 0 -0.2"/>
        </default>
        <default class="foot">
          <geom type="sphere" size="0.023" pos="0 0 -{LEG_L}" priority="1"
            solimp="0.015 1 0.031" condim="6" friction="2.0 0.02 0.01"/>
        </default>
      </default>
    </default>
  </default>

  <worldbody>
    <geom name="floor" size="0 0 0.05" type="plane"/>
    <body name="trunk" pos="0 0 0.445" childclass="go2">
      <inertial pos="0.021 0 -0.005" mass="{TRUNK_M}"
        diaginertia="0.01805 0.0916 0.0930"/>
      <freejoint/>
      <site name="head" pos="0.32 0 0" rgba="1 0 0 1" size="0.02" group="5"/>
      <site name="imu" pos="0 0 0"/>
      <camera name="tracking" mode="trackcom" pos="0 -1 0.8" xyaxes="1 0 0 0 1 1"/>
      <geom class="collision" size="0.15 0.05 0.057" type="box"/>
      <geom class="collision" quat="1 0 1 0" pos="0 -0.045 0" size="0.058 0.15" type="cylinder"/>
      <geom class="collision" quat="1 0 1 0" pos="0 +0.045 0" size="0.058 0.15" type="cylinder"/>
      <geom class="collision" pos="0.29 0 0" size="0.005 0.06 0.05" type="box"/>
      {leg("FR", 1, -1)}
      {leg("FL", 1, 1)}
      {leg("RR", -1, -1)}
      {leg("RL", -1, 1)}
    </body>
  </worldbody>

  <actuator>
    {actuators(ctrl)}
  </actuator>

  <keyframe>
    <key name="home" qpos="0 0 0.29 1 0 0 0 {home_joints.strip()}"
      ctrl="{key_ctrl}"/>
  </keyframe>
</mujoco>"""


def main():
    for ctrl in ("torque", "position"):
        spec = parse_raw(load_mjcf_string(go2_xml(ctrl)))
        out = DST / f"go2_{ctrl}.json"
        out.write_text(spec.to_json())
        print(f"wrote {out}: {len(spec.bodies)} bodies, "
              f"{len(spec.joints)} joints, {len(spec.geoms)} geoms, "
              f"{len(spec.actuators)} actuators")


if __name__ == "__main__":
    main()
