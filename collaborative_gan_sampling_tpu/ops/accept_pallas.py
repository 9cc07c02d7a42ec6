"""Pallas fused DRS accept kernel (C5 fast path, image pipeline).

SURVEY.md section 7 stage 5: for conv discriminators the refinement backward
stays on the XLA-fused scan path, and the *elementwise accept step* is
lowered to Pallas: one VPU pass computing

    F_hat = (F - M) - log(1 - exp(F - M - eps)) - gamma_total
    accept = uniform() < sigmoid(F_hat)

with the uniforms generated *inside the kernel* from the TPU hardware PRNG
(pltpu.prng_random_bits) — no separate random tensor materialised in HBM.

Note on determinism: the in-kernel PRNG stream differs from jax.random's
threefry stream, so accept masks are statistically equivalent but not
bitwise equal to the jnp path (sampling/rejection.py), which remains the
oracle for CPU runs and tests; the parity gate is statistical (acceptance
rate vs analytic probability).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _accept_kernel(eps: float, seed_ref, logits_ref, m_ref, gamma_ref,
                   out_ref):
    pltpu.prng_seed(seed_ref[0])
    f = jnp.minimum(logits_ref[:] - m_ref[0], -eps)
    # expm1 has no Mosaic lowering; f - eps <= -2*eps < 0 keeps 1 - exp(.)
    # bounded away from 0 at f32 precision for the eps values used here.
    f_hat = f - jnp.log(1.0 - jnp.exp(f - eps)) - gamma_ref[0]
    p = jax.nn.sigmoid(f_hat)
    # bitcast: prng_random_bits can surface as int32; logical shift needs u32.
    bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
    # Top 24 bits -> uniform in [0, 1). Mosaic lacks a u32->f32 cast, so the
    # shifted bits (< 2^24, hence value-preserving) go through int32.
    u = (pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
         * (1.0 / 16777216.0))
    out_ref[:] = (u < p).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("eps",))
def drs_accept_mask_pallas(key: jax.Array, logits: jax.Array,
                           logit_max: jax.Array, gamma_total: jax.Array,
                           eps: float = 1e-6) -> jax.Array:
    """Boolean accept mask for (B,) logits; fused shift+sigmoid+RNG+compare.

    `gamma_total` is the full gamma (static + any dynamic percentile term,
    computed by the caller — a percentile is a sort and does not belong in
    an elementwise kernel).
    """
    (b,) = logits.shape
    rows = max(1, -(-b // _LANES))
    padded = rows * _LANES
    # Pad with -inf-ish logits -> acceptance probability ~0 for pad slots.
    lg = jnp.full((padded,), -1e30, jnp.float32).at[:b].set(
        logits.astype(jnp.float32)).reshape(rows, _LANES)
    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    m = jnp.reshape(logit_max.astype(jnp.float32), (1,))
    g = jnp.reshape(gamma_total.astype(jnp.float32), (1,))

    mask = pl.pallas_call(
        functools.partial(_accept_kernel, eps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.int8),
    )(seed, lg, m, g)
    return mask.reshape(-1)[:b].astype(bool)
