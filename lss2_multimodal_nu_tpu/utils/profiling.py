"""Profiling & throughput instrumentation — new surface the reference lacks
(SURVEY §5: only dead `t0=time()` stamps, train.py:50,67).

Built around the two axon-backend gotchas documented in the verify skill:
results of identical executions are cached and laziness defeats
block_until_ready, so `StepTimer` forces a scalar fetch per step and
throughput runs must vary their inputs.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Callable, Dict, List, Optional

import numpy as np


class StepTimer:
    """Wall-clock step timing with percentile summary + frames/s meter."""

    def __init__(self, frames_per_step: int = 1):
        self.frames_per_step = frames_per_step
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, force_value=None) -> float:
        """Pass a jax scalar as force_value to block on real completion."""
        if force_value is not None:
            float(force_value)
        dt = time.time() - self._t0
        self.durations.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self, result_getter: Optional[Callable] = None):
        self.start()
        yield
        self.stop(result_getter() if result_getter else None)

    def summary(self) -> Dict[str, float]:
        d = np.asarray(self.durations[1:] or self.durations)  # drop warmup
        return {
            "steps": len(self.durations),
            "mean_ms": float(d.mean() * 1e3),
            "p50_ms": float(np.percentile(d, 50) * 1e3),
            "p90_ms": float(np.percentile(d, 90) * 1e3),
            "frames_per_sec": float(self.frames_per_step / d.mean()),
        }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace for xprof/tensorboard inspection."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging():
    """Opt-in NaN hunting (SURVEY §5 race-detection row): fail fast inside
    jitted code when any op produces a NaN."""
    import jax

    jax.config.update("jax_debug_nans", True)
