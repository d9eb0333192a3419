"""Test configuration: force a virtual 8-device CPU backend.

Multi-chip hardware is unavailable in this environment (1 real TPU chip), so
all sharding / distributed tests run against a virtual 8-device CPU mesh —
the analog of the fake backends the reference lacks (SURVEY.md §4.4).
This must run before jax initializes its backends, hence env mutation at
conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's TPU-tunnel sitecustomize calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
# overrides the env var — force it back to pure CPU for tests.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f64 stays off (TPU parity); tests that need f64 oracles use numpy.
