"""Structured JSONL metrics writer (SURVEY.md section 5.5).

The reference logs with ``print()`` and TensorBoard scalars; here every metric
event is one JSON line -> trivially machine-readable for the benchmark harness
and for plotting, with no TB dependency. TensorBoard scalars (the reference's
image-trainer convention, SURVEY.md C10) are available as an optional mirror:
pass ``tensorboard_dir`` (TensorFlow imported lazily, only then)."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, IO


def _to_py(v: Any) -> Any:
    # Device/numpy scalars -> python scalars; keeps json serializable.
    if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
        return v.item()
    if hasattr(v, "tolist"):
        return v.tolist()
    return v


class MetricsWriter:
    """Append-only JSONL writer: one event per line with step + wall time."""

    def __init__(self, path: str | None = None, echo: bool = True,
                 tensorboard_dir: str | None = None, append: bool = True):
        """``append=False`` truncates an existing log — callers starting a
        run from scratch (step 0) pass it so a retrain cannot leave a stale
        first run in the file (step-parsing consumers assume monotonic
        steps)."""
        self._fh: IO[str] | None = None
        self._echo = echo
        self._t0 = time.time()
        self._tb = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a" if append else "w", buffering=1)
        if tensorboard_dir:
            import tensorflow as tf  # lazy: only TB-mirroring runs need it

            self._tb = tf.summary.create_file_writer(tensorboard_dir)

    def write(self, step: int, **metrics: Any) -> None:
        event = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        event.update({k: _to_py(v) for k, v in metrics.items()})
        line = json.dumps(event)
        if self._fh is not None:
            self._fh.write(line + "\n")
        if self._tb is not None:
            with self._tb.as_default(step=int(step)):
                import tensorflow as tf

                for k, v in event.items():
                    if k != "step" and isinstance(v, (int, float)):
                        tf.summary.scalar(k, v)
        if self._echo:
            print(line, file=sys.stderr)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self) -> "MetricsWriter":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()
