"""Timing and profiling helpers.

The reference's only instrumentation is a wall-clock print (reference
``utils.py:15-18``). We keep that function for log parity and add a
``Timer``/``jax.profiler`` hook suitable for TPU traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def execution_time(start: float, end: float) -> str:
    """Format + print elapsed wall-clock time (reference ``utils.py:15-18``)."""
    hours, rem = divmod(end - start, 3600)
    minutes, seconds = divmod(rem, 60)
    msg = "\nExecution time = {:0>2}:{:0>2}:{:0>2}".format(
        int(hours), int(minutes), int(seconds)
    )
    print(msg)
    return msg


class Timer:
    """Wall-clock timer that blocks on device work for honest TPU numbers."""

    def __init__(self) -> None:
        self.elapsed = 0.0
        self._start: Optional[float] = None

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        # Ensure all dispatched device work is finished before reading the clock.
        try:
            jax.effects_barrier()
        except Exception:
            pass
        self.elapsed = time.perf_counter() - self._start


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str] = None):
    """Wrap a block in a ``jax.profiler`` trace when ``trace_dir`` is given."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
