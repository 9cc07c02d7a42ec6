"""Subprocess body for the two-process jax.distributed integration test.

Run by tests/test_parallel.py::test_two_process_distributed_execution, one
copy per process, with the cluster described entirely by the JAX-standard
environment variables (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID) — exactly the contract `parallel/multihost.py` detects, so
this exercises the REAL bootstrap path, not a monkeypatched one.

Each process contributes 2 fake CPU devices (XLA_FLAGS set by the parent),
giving a 4-device global mesh across 2 OS processes; the collectives the
mesh programs emit then genuinely cross a process boundary (gRPC transport
— the CPU stand-in for DCN, per SURVEY.md section 5.8).

Prints one ``RESULT {json}`` line with the cross-process measurements; the
parent asserts them against a single-process run of the same math.
"""

import json
import os
import sys

# The axon sitecustomize pins jax_platforms to the TPU plugin via
# jax.config (which beats the env var) — force CPU before any jax use.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from collaborative_gan_sampling_tpu.parallel import (
        make_mesh,
        maybe_initialize_distributed,
    )
    from collaborative_gan_sampling_tpu.parallel.mesh import replicate

    # The real bootstrap: env-var detection -> jax.distributed.initialize.
    assert maybe_initialize_distributed() is True, (
        "worker env must trigger the coordinator branch")
    assert maybe_initialize_distributed() is True  # idempotent re-entry

    n_proc = int(os.environ["JAX_NUM_PROCESSES"])
    pid = jax.process_index()
    assert jax.process_count() == n_proc, jax.process_count()
    assert pid == int(os.environ["JAX_PROCESS_ID"])
    local = jax.local_device_count()
    n_global = len(jax.devices())
    assert n_global == n_proc * local, (n_global, n_proc, local)

    # -- Cross-process psum: each process contributes its own shards --------
    mesh = make_mesh()  # all GLOBAL devices
    sharding = NamedSharding(mesh, P("data"))
    x_local = (np.arange(local, dtype=np.float32) + 100.0 * pid + 1.0)
    arr = jax.make_array_from_process_local_data(sharding, x_local,
                                                 (n_global,))
    total = jax.jit(lambda a: a.sum(),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    psum_value = float(total)

    # -- Tiny DP train step over the cross-process mesh ---------------------
    from collaborative_gan_sampling_tpu.config import (
        ModelConfig,
        TrainConfig,
    )
    from collaborative_gan_sampling_tpu.data import (
        make_mixture,
        sample_mixture,
    )
    from collaborative_gan_sampling_tpu.models import make_bundle
    from collaborative_gan_sampling_tpu.training import (
        create_train_state,
        make_train_chunk,
    )

    bundle = make_bundle(ModelConfig(kind="mlp", z_dim=4, g_hidden=32,
                                     d_hidden=32, compute_dtype="float32"))
    spec = make_mixture("ring8", std=0.1)
    data_fn = lambda key, n: (sample_mixture(key, spec, n), None)  # noqa: E731
    tcfg = TrainConfig(batch_size=64, steps_per_call=2, d_lr=1e-3, g_lr=1e-3)
    base = jax.random.PRNGKey(0)
    state = replicate(mesh, create_train_state(bundle, tcfg, base))
    chunk = make_train_chunk(bundle, tcfg, data_fn, base, mesh=mesh)
    state, metrics = chunk(state)

    print("RESULT " + json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "local_devices": local,
        "global_devices": n_global,
        "psum": psum_value,
        "d_loss": float(metrics["d_loss"]),
        "g_loss": float(metrics["g_loss"]),
    }), flush=True)


if __name__ == "__main__":
    main()
