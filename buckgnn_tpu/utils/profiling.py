"""Profiling + step timing.

The reference's only tracing is wall-clock prints in INFERENCE_TIMER.py
(SURVEY §5). This provides the TPU build's observability:

- ``trace(log_dir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable XLA trace of everything inside,
- ``StepTimer``: low-overhead wall-clock accumulator that converts step
  counts + edge counts into steps/s and edges/s/chip — the BASELINE.json
  headline metric — for the trainer's per-epoch Perf/* scalars.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace; view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock over groups of steps. ``start()``/``stop(n_steps,
    n_edges)`` around each timed region; read ``steps_per_s`` /
    ``edges_per_s``. The caller must block on device results before
    ``stop`` for honest numbers (the trainer's per-epoch device_get)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = None
        self.elapsed_s = 0.0
        self.n_steps = 0
        self.n_edges = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_steps: int, n_edges: int = 0) -> None:
        if self._t0 is None:
            return
        self.elapsed_s += time.perf_counter() - self._t0
        self._t0 = None
        self.n_steps += n_steps
        self.n_edges += n_edges

    @property
    def steps_per_s(self) -> float:
        return self.n_steps / self.elapsed_s if self.elapsed_s else 0.0

    @property
    def edges_per_s(self) -> float:
        return self.n_edges / self.elapsed_s if self.elapsed_s else 0.0

    @property
    def step_ms(self) -> float:
        return (self.elapsed_s / self.n_steps * 1e3) if self.n_steps else 0.0
