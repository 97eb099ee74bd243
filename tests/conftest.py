"""Force tests onto a virtual 8-device CPU mesh (SURVEY §4(e)).

The axon TPU plugin registers itself via sitecustomize and overrides
JAX_PLATFORMS, so the env var alone is not enough — we must also flip the
in-process config before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in _flags:
    # On avx512 hosts XLA appends +prefer-no-gather/+prefer-no-scatter
    # tuning features to CPU AOT entries; the loader's host probe never
    # reports them, so every persistent-cache hit logs a spurious
    # "machine features don't match / could SIGILL" error — even for
    # entries this very machine wrote (measured: /tmp/aot_repro). Capping
    # at AVX2 keeps the feature sets equal. Tiny-shape CPU tests are
    # compile-dominated; the runtime delta is noise.
    _flags = (_flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
