"""Profiling hooks.

The reference has none (the lone ``snoop`` import is commented out,
``third/vadlstd/VadLstd.py:18,43``). This wraps ``jax.profiler``: named
trace scopes around kernels and a context manager that captures a device
trace viewable in Perfetto/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile under ``log_dir`` (Perfetto/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in profiler timelines; usable as a
    decorator or context manager."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def wall_timer(label: str, results: Optional[dict] = None) -> Iterator[None]:
    """Host-side wall timing with device sync at exit (pairs with
    ``block_until_ready`` semantics so async dispatch does not lie)."""
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        if results is not None:
            results[label] = results.get(label, 0.0) + elapsed
