"""Tracing/profiling hooks (the reference has none; SURVEY.md §5).

Per-stage trace annotations show up in the jax profiler / Perfetto UI;
``profile_to`` captures a full device trace around any pipeline section.
"""

from __future__ import annotations

import contextlib
import logging

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(name: str):
    """Annotate a host-side region in the device trace."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a jax profiler trace of the enclosed region into log_dir."""
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", log_dir)
