"""Timing / tracing harness (SURVEY.md section 5.1).

The reference has no profiling at all; the rebuild's primary metric
(refined samples/sec/chip at K=10) needs a warmup-excluded,
``block_until_ready``-timed harness, plus optional ``jax.profiler`` traces
viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


def block(tree: Any) -> Any:
    """Block until every array in a pytree is ready (accurate timing)."""
    return jax.block_until_ready(tree)


def timeit(fn: Callable[[], Any], warmup: int = 2, iters: int = 10) -> dict:
    """Time `fn` (which should return device arrays) with warmup excluded.

    Returns {'mean_s', 'min_s', 'iters'}.
    """
    for _ in range(warmup):
        block(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        block(fn())
        times.append(time.perf_counter() - t0)
    return {"mean_s": sum(times) / len(times), "min_s": min(times),
            "iters": iters}


@contextlib.contextmanager
def trace(logdir: str | None):
    """Wrap a region in a jax.profiler trace when `logdir` is set."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
