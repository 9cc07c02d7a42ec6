"""Parity gates for the fused Pallas DRS accept kernel.

Two tiers (SURVEY.md section 4 kernel-parity row):

* **CPU interpret-mode (default suite):** the kernel's accept math runs
  via `drs_accept_mask_pallas_from_uniform(interpret=True)` with injected
  uniforms and is compared BITWISE to the jnp oracle
  (sampling/rejection.py) — same uniforms, same mask. This is the
  regression gate that runs everywhere.
* **TPU-only (statistical):** the production entry point draws uniforms
  from the TPU hardware PRNG inside the kernel; interpret mode cannot
  lower ``prng_seed`` (NotImplementedError, verified on this jax
  version), so those checks need the real chip: acceptance rate vs
  analytic probability, gamma monotonicity, per-key determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="production accept kernel uses the TPU hardware PRNG; interpret "
           "mode cannot lower prng_seed on this jax version")


def _deps():
    from collaborative_gan_sampling_tpu.ops.accept_pallas import (
        drs_accept_mask_pallas,
        drs_accept_mask_pallas_from_uniform,
    )
    from collaborative_gan_sampling_tpu.sampling.rejection import (
        drs_acceptance_prob,
    )
    return (drs_accept_mask_pallas, drs_accept_mask_pallas_from_uniform,
            drs_acceptance_prob)


_interpret = jax.default_backend() != "tpu"


@pytest.mark.parametrize("n", [7, 128, 300, 1 << 12])
@pytest.mark.parametrize("gamma", [-2.0, 0.0, 1.5])
def test_kernel_math_bitwise_parity(n, gamma):
    """Same uniforms -> same mask as the jnp oracle, every size/gamma."""
    _, from_uniform, drs_acceptance_prob = _deps()
    k1, k2 = jax.random.split(jax.random.PRNGKey(n + int(gamma * 10) + 17))
    logits = jax.random.normal(k1, (n,)) * 3.0
    m = jnp.max(logits)
    u = jax.random.uniform(k2, (n,))
    want = np.asarray(u < drs_acceptance_prob(logits, m, gamma=gamma))
    got = np.asarray(from_uniform(u, logits, m, jnp.float32(gamma),
                                  interpret=_interpret))
    np.testing.assert_array_equal(got, want)


def test_kernel_math_logit_above_max_clamped():
    """Logits above the burn-in max M hit the eps clamp, as in the oracle."""
    _, from_uniform, drs_acceptance_prob = _deps()
    logits = jnp.array([-1.0, 0.0, 2.0, 5.0], jnp.float32)
    m = jnp.float32(1.0)  # two logits exceed M
    u = jnp.array([0.3, 0.3, 0.3, 0.3], jnp.float32)
    want = np.asarray(u < drs_acceptance_prob(logits, m, gamma=0.0))
    got = np.asarray(from_uniform(u, logits, m, jnp.float32(0.0),
                                  interpret=_interpret))
    np.testing.assert_array_equal(got, want)


def test_pad_slots_never_accepted():
    """Non-multiple-of-128 batches are padded; pads must not leak accepts."""
    _, from_uniform, _ = _deps()
    n = 5  # pads to 128
    logits = jnp.full((n,), 100.0, jnp.float32)  # everything real accepted
    u = jnp.zeros((n,), jnp.float32)
    got = from_uniform(u, logits, jnp.float32(100.0), jnp.float32(-10.0),
                       interpret=_interpret)
    assert got.shape == (n,)
    assert bool(jnp.all(got))


def test_bits_to_uniform_conversion_math():
    """The HW kernel's bits->uniform expression maps u32 to [0, 1).

    The conversion runs inside the TPU kernel (not interpretable); this
    pins the same arithmetic in jnp: top-24-bit shift is value-preserving
    through int32 and lands strictly inside [0, 1).
    """
    bits = jnp.array([0, 1, 255, 256, (1 << 32) - 1, 0x80000000],
                     dtype=jnp.uint32)
    u = ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
         * (1.0 / 16777216.0))
    assert float(u.min()) >= 0.0 and float(u.max()) < 1.0
    np.testing.assert_allclose(np.asarray(u[4]), (2**24 - 1) / 2**24)
    np.testing.assert_allclose(np.asarray(u[5]), 0.5)


@tpu_only
def test_acceptance_rate_matches_probability():
    drs_accept_mask_pallas, _, drs_acceptance_prob = _deps()
    n = 1 << 15
    logits = jax.random.normal(jax.random.PRNGKey(0), (n,)) * 2.0
    m = jnp.max(logits)
    p = drs_acceptance_prob(logits, m, gamma=0.0)
    mask = drs_accept_mask_pallas(jax.random.PRNGKey(1), logits, m,
                                  jnp.float32(0.0))
    got = float(jnp.mean(mask.astype(jnp.float32)))
    want = float(jnp.mean(p))
    assert abs(got - want) < 0.005


@tpu_only
def test_monotone_in_gamma():
    drs_accept_mask_pallas, _, _ = _deps()
    logits = jax.random.normal(jax.random.PRNGKey(2), (1 << 14,))
    m = jnp.max(logits)
    loose = drs_accept_mask_pallas(jax.random.PRNGKey(3), logits, m,
                                   jnp.float32(-3.0))
    strict = drs_accept_mask_pallas(jax.random.PRNGKey(3), logits, m,
                                    jnp.float32(3.0))
    assert float(loose.mean()) > float(strict.mean())


@tpu_only
def test_deterministic_given_key():
    drs_accept_mask_pallas, _, _ = _deps()
    logits = jax.random.normal(jax.random.PRNGKey(5), (512,))
    m = jnp.max(logits)
    a = drs_accept_mask_pallas(jax.random.PRNGKey(6), logits, m,
                               jnp.float32(0.0))
    b = drs_accept_mask_pallas(jax.random.PRNGKey(6), logits, m,
                               jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
