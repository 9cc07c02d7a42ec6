import jax
import jax.numpy as jnp
import numpy as np

from collaborative_gan_sampling_tpu.sampling.rejection import (
    drs_accept_mask,
    drs_acceptance_prob,
    drs_logit_shift,
    estimate_logit_max,
)


def _paper_f_hat(F, M, gamma, eps):
    """Literal DRS formula (arXiv:1810.06758 eq. 8):
    F_hat = F - M - log(1 - exp(F - M - eps)) - gamma."""
    return F - M - np.log(1 - np.exp(F - M - eps)) - gamma


def test_drs_shift_matches_paper_formula():
    F = np.array([-3.0, -1.0, 0.5, 1.9])
    M = 2.0
    gamma, eps = 0.3, 1e-6
    got = np.asarray(drs_logit_shift(jnp.asarray(F), jnp.float32(M),
                                     gamma, eps))
    want = _paper_f_hat(F, M, gamma, eps)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_drs_prob_monotone_in_logit():
    logits = jnp.linspace(-5, 2, 50)
    p = np.asarray(drs_acceptance_prob(logits, jnp.float32(2.0)))
    assert (np.diff(p) > 0).all()
    assert (p >= 0).all() and (p <= 1).all()


def test_drs_handles_logit_above_max():
    # New samples can exceed the burn-in max; must stay finite.
    p = drs_acceptance_prob(jnp.array([5.0]), jnp.float32(2.0))
    assert np.isfinite(np.asarray(p)).all()
    assert float(p[0]) > 0.5  # better-than-max sample gets high acceptance


def test_gamma_shifts_acceptance():
    logits = jnp.linspace(-3, 1, 100)
    p_loose = np.asarray(drs_acceptance_prob(logits, 1.0, gamma=-2.0)).mean()
    p_strict = np.asarray(drs_acceptance_prob(logits, 1.0, gamma=2.0)).mean()
    assert p_loose > p_strict


def test_dynamic_gamma_percentile_centers_acceptance():
    # With the dynamic gamma at the q-th percentile, the fraction of samples
    # with p > 0.5 should be about (100 - q)%.
    logits = jax.random.normal(jax.random.PRNGKey(0), (5000,)) * 3
    p = np.asarray(drs_acceptance_prob(logits, jnp.max(logits),
                                       gamma_percentile=80.0))
    frac_above = (p > 0.5).mean()
    assert abs(frac_above - 0.2) < 0.02


def test_accept_mask_rate_matches_probability():
    logits = jnp.zeros(20000)
    # All logits equal -> uniform acceptance probability.
    p = float(drs_acceptance_prob(logits[:1], jnp.float32(1.0))[0])
    mask = drs_accept_mask(jax.random.PRNGKey(1), logits, jnp.float32(1.0))
    rate = float(jnp.mean(mask.astype(jnp.float32)))
    assert abs(rate - p) < 0.02


def test_estimate_logit_max():
    class Stub:
        def discriminate(self, d_vars, x, labels=None, train=False):
            return jnp.sum(x, axis=-1)

    def sample_fn(key, n):
        return jax.random.normal(key, (n, 2)), None

    m = estimate_logit_max(Stub(), {}, sample_fn, jax.random.PRNGKey(0),
                           burn_in=2048, batch_size=256)
    # max of ~2048 N(0, sqrt(2)) draws: around 4.5, certainly in [3, 7]
    assert 3.0 < float(m) < 7.0


def test_acceptance_prob_monotone_in_gamma_and_logit():
    """DRS math invariants: p is non-increasing in gamma (larger shift =
    stricter) and non-decreasing in the raw logit (D-preferred samples are
    never less likely to be accepted)."""
    from collaborative_gan_sampling_tpu.sampling.rejection import (
        drs_acceptance_prob,
    )

    logits = jnp.linspace(-5.0, 3.0, 64)
    m = jnp.float32(3.5)
    p0 = np.asarray(drs_acceptance_prob(logits, m, gamma=0.0))
    p1 = np.asarray(drs_acceptance_prob(logits, m, gamma=1.0))
    p2 = np.asarray(drs_acceptance_prob(logits, m, gamma=3.0))
    assert (p1 <= p0 + 1e-7).all() and (p2 <= p1 + 1e-7).all()
    # Monotone in the logit (F_hat is increasing in F for F < M).
    assert (np.diff(p0) >= -1e-7).all()
    assert ((0.0 <= p0) & (p0 <= 1.0)).all()


def test_percentile_gamma_centres_acceptance():
    """Dynamic gamma: the sample AT the percentile gets exactly p = 0.5
    (sigmoid(F_hat - percentile(F_hat)) = sigmoid(0)), and raising the
    percentile strictly lowers the batch's mean acceptance. (The mean is
    NOT (100-pct)% — the sigmoid is soft, so below-percentile samples
    keep nonzero probability.)"""
    from collaborative_gan_sampling_tpu.sampling.rejection import (
        drs_acceptance_prob,
        drs_logit_shift,
    )

    logits = jax.random.normal(jax.random.PRNGKey(0), (4096,))
    m = jnp.max(logits) + 0.5
    means = []
    for pct in (50.0, 80.0):
        p = np.asarray(drs_acceptance_prob(logits, m,
                                           gamma_percentile=pct))
        shifted = np.asarray(drs_logit_shift(logits, m))
        at_pct = np.argmin(np.abs(shifted - np.percentile(shifted, pct)))
        assert abs(p[at_pct] - 0.5) < 0.02, (pct, p[at_pct])
        means.append(p.mean())
    assert means[1] < means[0]  # stricter percentile accepts less
