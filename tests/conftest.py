"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count) exactly as the driver's
dryrun_multichip does; physics parity tests compare against the CPU
mujoco oracle in float64.

Note: pytest plugins may import jax before this conftest runs, so setting
JAX_PLATFORMS via os.environ is not reliable here — use jax.config, which
takes effect as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NO persistent compile cache on CPU: this JAX build's XLA:CPU AOT
# deserialization can segfault reading back entries it just wrote (and
# cross-host entries SIGILL) — the round-3 full-suite abort, root-caused
# and documented in quadruped_tpu/utils/cache.py.  The suite pays its
# compiles every run (~25 min cold, mostly XLA); correctness of the tier
# beats warm reruns.  cache.enable() itself refuses CPU platforms, so
# entry points that run under QTPU_FORCE_CPU are safe too.

assert jax.devices()[0].platform == "cpu"
