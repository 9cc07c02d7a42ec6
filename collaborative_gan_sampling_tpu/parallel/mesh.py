"""Device mesh + sharding helpers — the TPU-native stand-in for C18/C19.

The reference has no parallelism and no communication backend (single
``tf.Session``, one device — SURVEY.md C18/C19). Here the batch axis of every
hot computation (train step, refinement scan, shaping, FID feature pass) is
sharded over a 1-D ``jax.sharding.Mesh`` named ``'data'``; XLA emits the ICI
collectives (psum for gradient sync, all_gather for FID moments) from
``jax.shard_map`` / sharding-annotated ``jit`` — no hand-written transport.

Works identically on 1 real chip, a v5e-8, and N fake CPU devices
(``--xla_force_host_platform_device_count``), which is how the test suite and
the driver's multi-chip dry-run exercise the multi-device path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh over `num_devices` chips (-1 = all visible)."""
    if devices is None:
        devices = jax.devices()
    if num_devices in (-1, 0):
        num_devices = len(devices)
    if num_devices > len(devices):
        raise ValueError(
            f"requested {num_devices} devices, only {len(devices)} visible")
    return Mesh(np.asarray(devices[:num_devices]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; all other axes replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host pytree with its leading axis sharded over the mesh."""
    return jax.device_put(tree, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params / opt state) across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))


def constrain_batch(mesh: Mesh | None, x):
    """Inside jit: constrain a batch-leading array (or None) to the data axis.

    With mesh=None this is the identity, so the same code path serves
    single-chip and multi-chip runs.
    """
    if mesh is None or x is None:
        return x
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (batch padding for even sharding)."""
    return ((n + m - 1) // m) * m
