"""Tracing / profiling utilities.

The reference's observability is per-image wall-clock logging
(run_preprocessing.py:128-145, SURVEY.md §5). TPU-native equivalents:

- ``stage_timer``: wall-clock context manager logging per-stage times
  (same role as the reference's time.time() deltas, but per batch);
- ``device_trace``: jax.profiler trace contexts producing TensorBoard-
  compatible traces of the XLA execution.
"""

from __future__ import annotations

import contextlib
import logging
import time
from pathlib import Path

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def stage_timer(name: str, n_items: int | None = None, log=logger):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if n_items:
        log.info("%s: %.3fs (%.1f items/s)", name, dt, n_items / max(dt, 1e-9))
    else:
        log.info("%s: %.3fs", name, dt)


@contextlib.contextmanager
def device_trace(trace_dir: str | Path = "logs/jax_trace"):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    import jax
    Path(trace_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(trace_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
