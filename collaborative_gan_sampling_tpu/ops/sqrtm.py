"""On-device PSD matrix square root via Newton-Schulz iteration.

The reference computes the Frechet distance's sqrtm(Sigma1 @ Sigma2) with
``scipy.linalg.sqrtm`` on the host (``fid.py``, approximate path — SURVEY.md
C13 / section 3.4) — a serial LAPACK Schur decomposition that forces a
device->host sync of both covariance matrices. Here the square root runs on
the MXU as ~2*iters matmuls (Newton-Schulz), keeping the entire FID
computation on device; scipy parity is pinned by tests.

Newton-Schulz converges quadratically for matrices with ||A/c - I|| < 1, so A
is pre-scaled by its Frobenius norm. Inputs are PSD (products of covariance
matrices are similar to PSD), which is exactly its domain of validity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sqrtm_newton_schulz(a: jax.Array, iters: int = 20) -> jax.Array:
    """Matrix square root of a PSD matrix `a` (n, n) in float32 on device."""
    n = a.shape[0]
    a = a.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(a * a)) + 1e-12
    eye = jnp.eye(n, dtype=jnp.float32)
    y0 = a / norm
    z0 = eye

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - z @ y)
        return (y @ t, t @ z)

    y, _ = jax.lax.fori_loop(0, iters, body, (y0, z0))
    return y * jnp.sqrt(norm)


def trace_sqrtm_product(s1: jax.Array, s2: jax.Array,
                        iters: int = 20, eps: float = 1e-6) -> jax.Array:
    """Tr((s1 @ s2)^(1/2)) for PSD s1, s2 — the FID cross term.

    s1 @ s2 is similar to the PSD matrix s1^(1/2) s2 s1^(1/2), so its square
    root exists; a small diagonal jitter keeps Newton-Schulz stable when the
    product is near-singular (rank-deficient feature covariances).
    """
    n = s1.shape[0]
    prod = s1 @ s2 + eps * jnp.eye(n, dtype=jnp.float32)
    return jnp.trace(sqrtm_newton_schulz(prod, iters))
