"""quadruped_tpu: TPU-native quadruped locomotion RL framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
june9713/quadruped-rl-locomotion: batched rigid-body physics, a
pure-functional Go1 velocity-command environment, on-device PPO, and the
surrounding tooling (curriculum, eval/video callbacks, monitoring server,
checkpointing, benchmarks).
"""

__version__ = "0.1.0"
