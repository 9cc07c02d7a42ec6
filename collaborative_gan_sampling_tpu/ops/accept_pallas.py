"""Pallas fused DRS accept kernel (C5 fast path, image pipeline).

SURVEY.md section 7 stage 5: for conv discriminators the refinement backward
stays on the XLA-fused scan path, and the *elementwise accept step* is
lowered to Pallas: one VPU pass computing

    F_hat = (F - M) - log(1 - exp(F - M - eps)) - gamma_total
    accept = uniform() < sigmoid(F_hat)

with the uniforms generated *inside the kernel* from the TPU hardware PRNG
(pltpu.prng_random_bits) — no separate random tensor materialised in HBM.

Structure: the accept math is one shared kernel function (`_accept_math`)
with two entry kernels around it — the production kernel draws uniforms
from the hardware PRNG (TPU-only: interpret mode cannot lower
``prng_seed``, verified on this jax version), and a parity kernel takes
the uniforms as an input. The parity kernel is bitwise-comparable to the
jnp oracle (sampling/rejection.py) given the same uniforms, which is what
gives the kernel math a CPU regression gate (tests/test_accept_pallas.py
runs it with ``interpret=True``); the hardware-PRNG wrapper remains gated
by statistical tests on a real TPU.

Note on determinism: the in-kernel PRNG stream differs from jax.random's
threefry stream, so production accept masks are statistically equivalent
but not bitwise equal to the jnp path, which remains the default/oracle;
the kernel is opt-in via RefineConfig.use_pallas on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _accept_math(eps: float, logits, m, gamma, u):
    """The DRS accept decision, elementwise on a (rows, 128) block.

    Identical expression to the jnp oracle `drs_acceptance_prob` up to the
    expm1 guard: expm1 has no Mosaic lowering, and f - eps <= -2*eps < 0
    keeps 1 - exp(.) bounded away from 0 at f32 precision for the eps
    values used here.
    """
    f = jnp.minimum(logits - m, -eps)
    f_hat = f - jnp.log(1.0 - jnp.exp(f - eps)) - gamma
    p = jax.nn.sigmoid(f_hat)
    return (u < p).astype(jnp.int8)


def _accept_kernel_hw(eps: float, seed_ref, logits_ref, m_ref, gamma_ref,
                      out_ref):
    pltpu.prng_seed(seed_ref[0])
    shape = logits_ref[:].shape
    # bitcast: prng_random_bits can surface as int32; logical shift needs u32.
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Top 24 bits -> uniform in [0, 1). Mosaic lacks a u32->f32 cast, so the
    # shifted bits (< 2^24, hence value-preserving) go through int32.
    u = (pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
         * (1.0 / 16777216.0))
    out_ref[:] = _accept_math(eps, logits_ref[:], m_ref[0], gamma_ref[0], u)


def _accept_kernel_from_u(eps: float, logits_ref, m_ref, gamma_ref, u_ref,
                          out_ref):
    out_ref[:] = _accept_math(eps, logits_ref[:], m_ref[0], gamma_ref[0],
                              u_ref[:])


def _pad_lanes(v: jax.Array, fill: float) -> jax.Array:
    """(B,) f32 -> (rows, 128) block, padded with `fill`."""
    (b,) = v.shape
    rows = max(1, -(-b // _LANES))
    return jnp.full((rows * _LANES,), fill, jnp.float32).at[:b].set(
        v.astype(jnp.float32)).reshape(rows, _LANES)


@functools.partial(jax.jit, static_argnames=("eps",))
def drs_accept_mask_pallas(key: jax.Array, logits: jax.Array,
                           logit_max: jax.Array, gamma_total: jax.Array,
                           eps: float = 1e-6) -> jax.Array:
    """Boolean accept mask for (B,) logits; fused shift+sigmoid+RNG+compare.

    `gamma_total` is the full gamma (static + any dynamic percentile term,
    computed by the caller — a percentile is a sort and does not belong in
    an elementwise kernel). Production path; requires a real TPU.
    """
    (b,) = logits.shape
    # Pad with -inf-ish logits -> acceptance probability ~0 for pad slots.
    lg = _pad_lanes(logits, -1e30)
    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    m = jnp.reshape(logit_max.astype(jnp.float32), (1,))
    g = jnp.reshape(gamma_total.astype(jnp.float32), (1,))

    mask = pl.pallas_call(
        functools.partial(_accept_kernel_hw, eps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(lg.shape, jnp.int8),
    )(seed, lg, m, g)
    return mask.reshape(-1)[:b].astype(bool)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def drs_accept_mask_pallas_from_uniform(
        uniforms: jax.Array, logits: jax.Array, logit_max: jax.Array,
        gamma_total: jax.Array, eps: float = 1e-6,
        interpret: bool = False) -> jax.Array:
    """Accept mask from caller-supplied uniforms — the parity entry point.

    Runs the exact production accept math (`_accept_math`) with the random
    draw injected instead of generated, so the result is bitwise comparable
    to the jnp oracle given the same uniforms; with ``interpret=True`` it
    runs on CPU, which is the default test suite's regression gate for the
    kernel math.
    """
    (b,) = logits.shape
    lg = _pad_lanes(logits, -1e30)
    u = _pad_lanes(uniforms, 1.0)  # pad uniform 1.0 -> never accepted
    m = jnp.reshape(logit_max.astype(jnp.float32), (1,))
    g = jnp.reshape(gamma_total.astype(jnp.float32), (1,))

    mask = pl.pallas_call(
        functools.partial(_accept_kernel_from_u, eps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(lg.shape, jnp.int8),
        interpret=interpret,
    )(lg, m, g, u)
    return mask.reshape(-1)[:b].astype(bool)
