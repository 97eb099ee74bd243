"""Multi-host (multi-process) initialization helpers.

Single-host multi-chip needs nothing (jax.devices() sees the whole slice).
For multi-host TPU pods, call `initialize()` once per process before any
backend use; DCN carries only init/data/checkpoint traffic — all gradient
collectives ride ICI inside the jit'd step (SURVEY §2.5/§5).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """jax.distributed.initialize with env-var fallbacks; returns
    (process_index, process_count). No-op when single-process."""
    import jax

    if num_processes in (None, 1) and os.environ.get("JAX_NUM_PROCESSES") in (None, "1"):
        return jax.process_index(), jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def host_shard() -> Tuple[int, int]:
    """(host_index, host_count) for the data loader's per-host sharding."""
    import jax

    return jax.process_index(), jax.process_count()


def global_batch_to_local(global_batch_size: int) -> int:
    import jax

    assert global_batch_size % jax.process_count() == 0
    return global_batch_size // jax.process_count()
