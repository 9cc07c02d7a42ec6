"""PRNG-key discipline.

The reference seeds numpy/TF globally and draws z with stateful RNG; resuming
a run does not reproduce the original stream. Here every randomness consumer
derives its key deterministically from (base seed, step index, role), so
training/refinement loops are restartable from any step index with identical
streams (SURVEY.md section 5.3: deterministic resume).
"""

from __future__ import annotations

import jax

# Stable role tags so independent consumers at the same step decorrelate.
ROLES = {
    "data": 0,
    "z": 1,
    "refine": 2,
    "accept": 3,
    "mh": 4,
    "shape": 5,
    "init_g": 6,
    "init_d": 7,
    "eval": 8,
}


def step_key(base: jax.Array, step, role: str = "z") -> jax.Array:
    """Key for `role` at `step`, derived from the run's base key.

    `step` may be a traced int32 (works under jit/scan).
    """
    k = jax.random.fold_in(base, ROLES[role])
    return jax.random.fold_in(k, step)


def split_for_batch(key: jax.Array, batch_size: int) -> jax.Array:
    """Per-sample keys, shape (batch_size, 2)."""
    return jax.random.split(key, batch_size)
