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
                        iters: int = 30, eps: float = 1e-6) -> jax.Array:
    """Tr((s1 @ s2)^(1/2)) for PSD s1, s2 — the FID cross term.

    s1 @ s2 is similar to the PSD matrix s1^(1/2) s2 s1^(1/2), so its square
    root exists. Finite-sample covariances are rank-deficient whenever
    samples < features, so a diagonal jitter *scaled to the matrix's own
    spectrum* (eps * mean diagonal) keeps Newton-Schulz convergent; the
    induced bias is subtracted in expectation via the standard
    tr((A + cI)^1/2) ~= tr(A^1/2) + n*sqrt(c) correction being negligible
    for eps << diag scale (validated against scipy in tests).
    """
    n = s1.shape[0]
    prod = s1 @ s2
    scale = jnp.trace(prod) / n
    prod = prod + (eps * scale) * jnp.eye(n, dtype=jnp.float32)
    return jnp.trace(sqrtm_newton_schulz(prod, iters))


def psd_sqrt_eigh(s: jax.Array) -> jax.Array:
    """Symmetric PSD square root via eigh with negative-eig clipping.

    Float32 sample covariances of rank-deficient feature sets carry small
    *negative* noise eigenvalues that make Newton-Schulz diverge; eigh +
    clip is unconditionally robust (and still on-device — jnp.linalg.eigh
    lowers to XLA's QDWH path on TPU).
    """
    s = 0.5 * (s + s.T)
    d, u = jnp.linalg.eigh(s)
    d = jnp.sqrt(jnp.maximum(d, 0.0))
    return (u * d[None, :]) @ u.T


def trace_sqrtm_product_eigh(s1: jax.Array, s2: jax.Array) -> jax.Array:
    """Robust Tr((s1 s2)^(1/2)): Tr(sqrt(eig(A s2 A))) with A = s1^(1/2).

    Exact for PSD inputs of any rank — the default FID cross-term path.
    Identity used: s1 s2 is similar to A s2 A (symmetric PSD), so their
    eigenvalues agree and the trace of the square root is the sum of the
    square roots of the eigenvalues.
    """
    a = psd_sqrt_eigh(s1.astype(jnp.float32))
    m = a @ s2.astype(jnp.float32) @ a
    m = 0.5 * (m + m.T)
    ev = jnp.linalg.eigvalsh(m)
    return jnp.sum(jnp.sqrt(jnp.maximum(ev, 0.0)))
