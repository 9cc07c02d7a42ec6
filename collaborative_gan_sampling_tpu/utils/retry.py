"""Retry wrapper for transient backend failures.

The tunneled PJRT relay this environment exposes (`axon`) drops HTTP
connections under load ("remote_compile: response body closed", INTERNAL /
UNAVAILABLE XlaRuntimeError), which otherwise kills multi-hour measurement
campaigns mid-grid. Long-running runners wrap each unit of work in
``with_retries``; anything non-transient re-raises immediately.

The reference (single local tf.Session) never needed this — it is an
artifact of running against a remote-attached accelerator, the same class
of fault jax multi-host jobs handle with coordinator retries.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

T = TypeVar("T")

_TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "INTERNAL",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection reset",
    "Socket closed",
)


def is_transient_backend_error(err: BaseException) -> bool:
    """True when the error smells like a dropped tunnel / relay hiccup."""
    msg = str(err)
    name = type(err).__name__
    if name not in ("JaxRuntimeError", "XlaRuntimeError", "InternalError",
                    "Unavailable"):
        return False
    return any(m in msg for m in _TRANSIENT_MARKERS)


def with_retries(fn: Callable[[], T], retries: int = 3,
                 backoff_s: float = 30.0, label: str = "",
                 _sleep: Callable[[float], None] | None = None) -> T:
    """Run ``fn()``, retrying transient backend errors with linear backoff.

    Non-transient exceptions propagate unchanged; the last transient error
    propagates after ``retries`` failed retries.
    """
    if _sleep is None:
        _sleep = time.sleep  # bound at call time so tests can patch it
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as err:  # noqa: BLE001 — filtered below
            if not is_transient_backend_error(err) or attempt >= retries:
                raise
            attempt += 1
            print(f"[retry] transient backend error"
                  f"{f' ({label})' if label else ''} — "
                  f"attempt {attempt}/{retries}, backing off "
                  f"{backoff_s * attempt:.0f}s: {str(err)[:120]}",
                  flush=True)
            _sleep(backoff_s * attempt)
