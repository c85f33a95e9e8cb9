"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference's closest facility is per-batch wall-clock meters + ptflops
(torchdet3d/trainer/train.py:78-82, scripts/get_complexity.py).  Here:

* ``trace`` — context manager around ``jax.profiler`` producing a
  TensorBoard-viewable trace of device + host activity;
* ``StepTimer`` — EMA step timing with jax async-aware fencing;
* ``flops_of`` — XLA cost analysis of any jitted function (the
  get_complexity backend).
"""

import contextlib
import time

import jax

__all__ = ['trace', 'StepTimer', 'flops_of', 'annotate']


@contextlib.contextmanager
def trace(logdir='./profile_trace'):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock timer that fences device work before reading the clock."""

    def __init__(self, ema=0.9):
        self.ema = ema
        self.avg = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *arrays):
        if arrays:
            jax.block_until_ready(arrays)
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else \
            self.ema * self.avg + (1 - self.ema) * dt
        return dt

    @property
    def steps_per_sec(self):
        return 1.0 / self.avg if self.avg else 0.0


def flops_of(fn, *example_args):
    """Total FLOPs of the compiled fn (XLA cost analysis)."""
    lowered = jax.jit(fn).lower(*example_args)
    cost = lowered.compile().cost_analysis()
    return cost.get('flops', float('nan'))
