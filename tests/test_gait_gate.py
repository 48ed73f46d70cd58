"""Gait-quality regression gate (VERDICT r1 #5, hardened per r3 #2).

Loads the committed flagship walking-policy artifact and asserts it still
WALKS — not merely stands — under the current physics/env code.  The bar
(quadruped_tpu/learn/gate.py, shared with the promotion tool) is designed
so both known failure modes are red:

  * round-1's collapsed reward farmer: healthy ~0.01, tracking ~0.4
  * round-3's perfect stander: healthy 1.0 and full episodes, but
    feet_airtime 0.0 and distance 0.03 m — fails distance_ok/stepping_ok,
    and with 8 episodes its tracking error can no longer clear 0.15 on
    2-episode command-draw luck (~18% per draw pair)

Skips until the artifact exists (results/walk_policy/ is committed by
tools/snapshot_walk_policy.py after a successful flagship run).
"""

import pathlib

import pytest

ARTIFACT = pathlib.Path(__file__).parent.parent / "results" / "walk_policy"


@pytest.mark.skipif(
    not ARTIFACT.exists(),
    reason="walking artifact not committed yet (flagship run pending)",
)
def test_committed_policy_still_walks():
    from quadruped_tpu.learn.gate import evaluate_gate

    v = evaluate_gate(ARTIFACT)
    summary = {k: val for k, val in v.items() if not k.startswith("_")}
    assert v["healthy_ok"], summary
    assert v["tracking_ok"], summary
    assert v["length_ok"], summary
    # the stander-killers: real displacement scaled by what was commanded,
    # and feet that actually leave the ground
    assert v["distance_ok"], summary
    assert v["stepping_ok"], summary
