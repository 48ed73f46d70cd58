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

# persistent compile cache: the suite is ~90% XLA compilation (VERDICT r1
# weak #8 measured >20 min serial); repeat runs with unchanged programs
# hit the cache and drop to minutes.  Keyed by computation hash, so code
# changes recompile exactly what changed.
from quadruped_tpu.utils import cache as _cache  # noqa: E402

_cache.enable(os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tests"))

assert jax.devices()[0].platform == "cpu"
