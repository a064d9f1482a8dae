"""Batched quadratic eigenproblems ``(λ²M + λC + K) v = 0``.

The vibration/damping shape class (mass, damping, stiffness).  Solved
by the first companion linearization to a 2n×2n GENERALIZED pencil

    A z = λ B z,   A = [[0, I], [−K, −C]],  B = [[I, 0], [0, M]],
    z = [v; λv],

handed to the shift-invert pencil solver (``ops.geig``), which is what
makes a SINGULAR mass matrix M legal: each rank deficiency of M
surfaces as an infinite eigenvalue of the pencil and is flagged, not
mangled.  Eigenvalues are invariant under equivalence
``P(λ²M + λC + K)Q``; right quadratic eigenvectors are read off the
top block of z (with the bottom block ``λv`` available as a
consistency check).

No counterpart in the reference (linear-only); rounds out the eigen
family alongside ``ops.roots`` (scalar polynomials — this is its
matrix-coefficient generalization).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geig import eig_generalized_shifted_batched


class QuadEigResult(NamedTuple):
    """2n eigenvalues per lane (``finite=False`` columns are the
    infinite eigenvalues a singular M induces).  ``vectors_*`` hold the
    quadratic eigenvectors v (top block of the companion vector),
    unit-normalized; ``resid`` is the true relative quadratic residual
    ``‖(λ²M + λC + K)v‖ / (|λ|²‖M‖ + |λ|‖C‖ + ‖K‖)`` for finite λ."""

    real: jax.Array          # [B, 2n]
    imag: jax.Array          # [B, 2n]
    vectors_real: jax.Array  # [B, n, 2n]
    vectors_imag: jax.Array  # [B, n, 2n]
    finite: jax.Array        # [B, 2n]
    valid: jax.Array         # [B, 2n]
    ok: jax.Array            # [B]
    resid: jax.Array         # [B, 2n]


def quadeig_batched(
    m: jax.Array,
    c: jax.Array,
    k: jax.Array,
    sigma: float | None = None,
) -> QuadEigResult:
    """Solve batched quadratic pencils; M may be singular (the regular-
    pencil requirement moves to ``det(λ²M + λC + K) ≢ 0``)."""
    f32 = jnp.result_type(m.dtype, jnp.float32)
    m = m.astype(f32)
    c = c.astype(f32)
    k = k.astype(f32)
    B, n, _ = m.shape
    eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (B, n, n))
    zero = jnp.zeros((B, n, n), f32)
    A = jnp.concatenate(
        [
            jnp.concatenate([zero, eye], axis=2),
            jnp.concatenate([-k, -c], axis=2),
        ],
        axis=1,
    )
    Bm = jnp.concatenate(
        [
            jnp.concatenate([eye, zero], axis=2),
            jnp.concatenate([zero, m], axis=2),
        ],
        axis=1,
    )
    res = eig_generalized_shifted_batched(A, Bm, sigma=sigma)
    Vr = res.vectors_real[:, :n, :]
    Vi = res.vectors_imag[:, :n, :]
    nrm = jnp.sqrt(jnp.sum(Vr * Vr + Vi * Vi, axis=1))
    nrm = jnp.maximum(nrm, 1e-30)[:, None, :]
    Vr, Vi = Vr / nrm, Vi / nrm

    # True quadratic residual for finite columns (re/im arithmetic).
    lr = jnp.where(res.finite, res.real, 0.0)
    li = jnp.where(res.finite, res.imag, 0.0)
    l2r = lr * lr - li * li
    l2i = 2.0 * lr * li

    def app(X, v_r, v_i):
        hp = jax.lax.Precision.HIGHEST
        return (
            jnp.einsum("bij,bjk->bik", X, v_r, precision=hp),
            jnp.einsum("bij,bjk->bik", X, v_i, precision=hp),
        )

    with jax.default_matmul_precision("float32"):
        Mr, Mi = app(m, Vr, Vi)
        Cr, Ci = app(c, Vr, Vi)
        Kr, Ki = app(k, Vr, Vi)
    rr = (
        l2r[:, None, :] * Mr - l2i[:, None, :] * Mi
        + lr[:, None, :] * Cr - li[:, None, :] * Ci + Kr
    )
    ri = (
        l2r[:, None, :] * Mi + l2i[:, None, :] * Mr
        + lr[:, None, :] * Ci + li[:, None, :] * Cr + Ki
    )
    def onenorm(x):
        return jnp.max(jnp.sum(jnp.abs(x), axis=1), axis=1)

    lam_abs = jnp.hypot(lr, li)
    scale = (
        lam_abs**2 * onenorm(m)[:, None]
        + lam_abs * onenorm(c)[:, None]
        + onenorm(k)[:, None]
    )
    resid = jnp.sqrt(jnp.sum(rr * rr + ri * ri, axis=1)) / jnp.maximum(
        scale, 1e-30
    )
    resid = jnp.where(res.finite, resid, 0.0)
    return QuadEigResult(
        res.real, res.imag, Vr, Vi, res.finite, res.valid, res.ok,
        resid,
    )
