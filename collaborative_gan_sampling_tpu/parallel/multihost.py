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
    if coord:
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
    if _cluster_scheduler_detected():
        # jax.distributed.initialize() auto-detects coordinator/process
        # topology on recognised schedulers (Slurm, Open MPI, Cloud TPU
        # pods) — the docstring's second detection branch.
        import jax

        jax.distributed.initialize()
        _INITIALIZED = True
        return True
    return False


def _cluster_scheduler_detected() -> bool:
    """True when a multi-process cluster scheduler environment is present
    (jax's own auto-detection will then succeed without explicit addresses).
    Strictly conservative: single-process allocations return False."""
    # Multislice marker first: a multislice job of SINGLE-host slices has
    # TPU_WORKER_HOSTNAMES with one entry but still needs initialization.
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS", ""):
        return True
    # Slurm: only when launched as a multi-task srun STEP — the batch
    # script of an `--ntasks=N` allocation also inherits SLURM_NTASKS=N,
    # and auto-initializing there would wait forever for N-1 peers that
    # will never start (the batch step itself runs one task).
    if (int(os.environ.get("SLURM_NTASKS", "1") or 1) > 1
            and int(os.environ.get("SLURM_STEP_NUM_TASKS", "1") or 1) > 1
            and os.environ.get("SLURM_PROCID") is not None):
        return True
    if int(os.environ.get("OMPI_COMM_WORLD_SIZE", "1") or 1) > 1:
        return True
    # Cloud TPU pod marker (set by the TPU runtime on multi-host slices;
    # absent on single-host machines like this one).
    if os.environ.get("TPU_WORKER_HOSTNAMES", ""):
        return len(os.environ["TPU_WORKER_HOSTNAMES"].split(",")) > 1
    return False
