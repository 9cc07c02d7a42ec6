"""Persistent XLA compilation cache.

In this TPU environment compilation goes through a remote-compile relay and
conv-heavy graphs take minutes to build; the persistent cache makes every
recompile of an already-seen program a disk hit. Called by the CLI, bench
harness and test conftest (not at library import — no import side effects).
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.expanduser("~/.cache/cgs_tpu_xla")


def enable_compile_cache(path: str | None = None) -> str:
    path = path or os.environ.get("CGS_COMPILE_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
