"""Statistical parity gate for the fused Pallas DRS accept kernel.

These tests need real TPU hardware: the in-kernel generator is the TPU
hardware PRNG (pltpu.prng_random_bits), and this jax version's interpret-mode
emulation returns all-zero bits (verified 2026-08-16), so a CPU run cannot
exercise the kernel meaningfully. The suite's CPU conftest therefore skips
them; they execute when pytest runs with a TPU backend, and the identical
checks were validated manually on the v5e (accept rate 0.00259 vs analytic
0.00240 at n=2^15; gamma monotonicity; per-key determinism).

The jnp implementation (sampling/rejection.py) remains the default/oracle;
the kernel is gated behind RefineConfig.use_pallas on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="fused accept kernel uses the TPU hardware PRNG; interpret-mode "
           "emulation yields zero bits on this jax version")


def _deps():
    from collaborative_gan_sampling_tpu.ops.accept_pallas import (
        drs_accept_mask_pallas,
    )
    from collaborative_gan_sampling_tpu.sampling.rejection import (
        drs_acceptance_prob,
    )
    return drs_accept_mask_pallas, drs_acceptance_prob


def test_acceptance_rate_matches_probability():
    drs_accept_mask_pallas, drs_acceptance_prob = _deps()
    n = 1 << 15
    logits = jax.random.normal(jax.random.PRNGKey(0), (n,)) * 2.0
    m = jnp.max(logits)
    p = drs_acceptance_prob(logits, m, gamma=0.0)
    mask = drs_accept_mask_pallas(jax.random.PRNGKey(1), logits, m,
                                  jnp.float32(0.0))
    got = float(jnp.mean(mask.astype(jnp.float32)))
    want = float(jnp.mean(p))
    assert abs(got - want) < 0.005


def test_monotone_in_gamma():
    drs_accept_mask_pallas, _ = _deps()
    logits = jax.random.normal(jax.random.PRNGKey(2), (1 << 14,))
    m = jnp.max(logits)
    loose = drs_accept_mask_pallas(jax.random.PRNGKey(3), logits, m,
                                   jnp.float32(-3.0))
    strict = drs_accept_mask_pallas(jax.random.PRNGKey(3), logits, m,
                                    jnp.float32(3.0))
    assert float(loose.mean()) > float(strict.mean())


def test_deterministic_given_key():
    drs_accept_mask_pallas, _ = _deps()
    logits = jax.random.normal(jax.random.PRNGKey(5), (512,))
    m = jnp.max(logits)
    a = drs_accept_mask_pallas(jax.random.PRNGKey(6), logits, m,
                               jnp.float32(0.0))
    b = drs_accept_mask_pallas(jax.random.PRNGKey(6), logits, m,
                               jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
