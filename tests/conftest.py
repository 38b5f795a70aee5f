"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere, hence the env mutation at module
import time (pytest imports conftest first).
"""

import os

os.environ.pop("JAX_PLATFORMS", None)  # the axon TPU plugin re-appends itself
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # env var alone is overridden by the plugin
