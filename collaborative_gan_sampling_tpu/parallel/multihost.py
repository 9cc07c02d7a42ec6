"""Multi-host bootstrap (future extension of the C18/C19 equivalents).

SURVEY.md section 5.8 scopes the baseline configs to a single host (ICI
only); this module is the forward hook for the multi-host case: when a
JAX-standard cluster environment is detected (``JAX_COORDINATOR_ADDRESS``
or a recognised cluster scheduler), ``maybe_initialize_distributed`` calls
``jax.distributed.initialize`` so `jax.devices()` spans all hosts and the
existing `Mesh('data')` code paths shard over DCN+ICI unchanged — the
sharding annotations ARE the API, so nothing else in the framework needs
to know.

Single-host (this environment, and the default): a no-op.
"""

from __future__ import annotations

import os

_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Initialise jax.distributed iff a cluster environment is configured.

    Returns True when a multi-host runtime was initialised (idempotent),
    False for the single-host no-op. Never raises on a plain single-host
    machine: detection is strictly opt-in via environment variables.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS", "")
    n_proc = os.environ.get("JAX_NUM_PROCESSES", "")
    if not coord:
        return False
    import jax

    kwargs = {"coordinator_address": coord}
    if n_proc:
        kwargs["num_processes"] = int(n_proc)
        pid = os.environ.get("JAX_PROCESS_ID", "")
        if pid:
            kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True
