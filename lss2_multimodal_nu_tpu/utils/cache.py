"""Persistent XLA compile cache setup, shared by the CLI and bench scripts.

The flagship train/eval steps compile for minutes on a few-core host (the
reference's torch scripts pay no such cost — eager CUDA). A persistent
compilation cache makes every repeat invocation of the CLI, bench.py, or a
profiler script start hot, which matters both for iterating on training
configs and for the driver's bench runs.
"""
from __future__ import annotations

import os


def default_cache_dir() -> str:
    """Pick a writable cache directory.

    Precedence: $JAX_COMPILATION_CACHE_DIR, then `.jax_cache` next to the
    package (the repo root in a source checkout — shared with bench.py and
    the scripts/ profilers), then ~/.cache/lss2_multimodal_nu_tpu/jax.
    """
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    repo_cache = os.path.join(pkg_parent, ".jax_cache")
    if os.path.isdir(repo_cache) or os.access(pkg_parent, os.W_OK):
        return repo_cache
    return os.path.join(
        os.path.expanduser("~"), ".cache", "lss2_multimodal_nu_tpu", "jax"
    )


def machine_tag(platform: str) -> str:
    """Per-machine cache key for non-TPU backends.

    XLA:CPU entries are AOT-compiled against the HOST ISA, and the cache key
    does not capture CPU features — loading another machine's entries logs
    "machine features don't match / could SIGILL" (observed in the driver's
    MULTICHIP_r04 dryrun, which read this builder host's entries). Hash the
    CPU feature flags into the path so CPU entries never cross machines.
    TPU entries target the TPU chip, not the host, and stay shared.
    """
    import hashlib
    import platform as plat

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line.strip()
                    break
    except OSError:
        pass
    h = hashlib.sha256((plat.machine() + feats).encode()).hexdigest()[:10]
    return f"{platform}-{plat.machine()}-{h}"


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Must run before the first compilation (safe any time before that).
    Returns the directory used, or None if this JAX build lacks the knobs
    (compiles cold, harmless). Non-TPU backends get a machine-fingerprinted
    subdirectory (see `machine_tag`).
    """
    import jax

    cache_dir = cache_dir or default_cache_dir()
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    if platform != "tpu":
        cache_dir = os.path.join(cache_dir, machine_tag(platform))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache even fast compiles: the axon tunnel makes every remote
        # compile round-trip expensive regardless of XLA's own time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return cache_dir
