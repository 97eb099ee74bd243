"""Force tests onto a virtual 8-device CPU mesh (SURVEY §4(e)).

The axon TPU plugin registers itself via sitecustomize and overrides
JAX_PLATFORMS, so the env var alone is not enough — we must also flip the
in-process config before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
