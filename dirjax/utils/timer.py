"""Minimal tic/toc wall-clock timers (reference ``utils/convenient.py:139-156``)
plus a context-manager flavor that fits profiling JAX (blocks on async
dispatch before reading the clock)."""

from __future__ import annotations

import time
from contextlib import contextmanager

_TIMERS: dict = {}


def tic(name: str = "default") -> None:
    _TIMERS[name] = time.perf_counter()


def toc(name: str = "default") -> float:
    """Seconds elapsed since the matching :func:`tic`."""
    return time.perf_counter() - _TIMERS[name]


@contextmanager
def timed(label: str, results: dict | None = None, sync=None):
    """Context manager measuring wall-clock seconds.

    ``sync``: optional callable run before stopping the clock — pass e.g.
    ``lambda: jax.block_until_ready(out)`` so async TPU dispatch is included.
    """
    start = time.perf_counter()
    yield
    if sync is not None:
        sync()
    elapsed = time.perf_counter() - start
    if results is not None:
        results[label] = elapsed
