"""Test configuration.

Runs the suite on CPU with 8 virtual devices (SURVEY.md §4.2 item 4 —
the rebuild's `mpirun -np N`-without-a-cluster mechanism) and with x64
enabled so correctness tests can use float64 oracles. Library code is
dtype-explicit, so enabling x64 here does not change what the framework
computes on TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not honored once the experimental 'axon' TPU plugin
# registers itself; the config update reliably pins the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
