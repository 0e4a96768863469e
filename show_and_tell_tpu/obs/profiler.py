"""Profiler hooks: ``jax.profiler`` traces on demand.

The reference has no profiling at all (SURVEY.md §5). Usage::

    with profile_trace("/tmp/trace", enabled=step == 50):
        state, metrics = train_step(...)
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
