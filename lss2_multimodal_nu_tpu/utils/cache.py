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


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Must run before the first compilation (safe any time before that; the
    backend need not be initialized). Returns the directory used, or None
    if this JAX build lacks the knobs (compiles cold, harmless).
    """
    import jax

    cache_dir = cache_dir or default_cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache even fast compiles: the axon tunnel makes every remote
        # compile round-trip expensive regardless of XLA's own time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return cache_dir
