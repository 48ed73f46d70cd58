"""Bundled robot assets (defaults-resolved RawSpec JSON)."""

from pathlib import Path

from ..mjcf import PhysicsModel, RawSpec, compile_spec

_DIR = Path(__file__).parent


def go1_spec(ctrl_type: str = "torque") -> RawSpec:
    """Load the Go1 scene spec; ctrl_type selects actuators, mirroring the
    reference's `scene_{ctrl_type}.xml` selection (go1_mujoco_env.py:42)."""
    if ctrl_type not in ("torque", "position"):
        raise ValueError(f"unknown ctrl_type: {ctrl_type}")
    return RawSpec.from_json((_DIR / f"go1_{ctrl_type}.json").read_text())


def go1_model(ctrl_type: str = "torque") -> PhysicsModel:
    return compile_spec(go1_spec(ctrl_type))


def go1_xml(ctrl_type: str = "torque") -> str:
    """Minimal MJCF export (mujoco oracle tests / offline rendering only)."""
    return go1_spec(ctrl_type).to_xml()
