"""Batched polynomial eigenproblems ``(Σ_i λ^i A_i) v = 0``.

``polyeig_batched`` solves matrix polynomials of any degree d by the
first companion linearization to a dn×dn GENERALIZED pencil

    A z = λ B z,
    A = [[0, I, 0, …], …, [−A₀, −A₁, …, −A_{d−1}]],
    B = blockdiag(I, …, I, A_d),
    z = [v; λv; λ²v; …; λ^{d−1}v],

handed to the shift-invert pencil solver (``ops.geig``), which is what
makes a SINGULAR leading coefficient A_d legal: each rank deficiency
of A_d surfaces as an infinite eigenvalue of the pencil and is
flagged, not mangled.  Right polynomial eigenvectors are read off the
top block of z.  ``quadeig_batched`` is the degree-2 entry point
(mass/damping/stiffness shape class, ``λ²M + λC + K``).

No counterpart in the reference (linear-only); rounds out the eigen
family alongside ``ops.roots`` (scalar polynomials — this is their
matrix-coefficient generalization: for 1×1 coefficients polyeig IS
the companion-matrix root finder).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .geig import eig_generalized_shifted_batched


class PolyEigResult(NamedTuple):
    """d·n eigenvalues per lane (``finite=False`` columns are the
    infinite eigenvalues a singular leading coefficient induces).
    ``vectors_*`` hold the polynomial eigenvectors v (top block of the
    companion vector), unit-normalized; ``resid`` is the true relative
    residual ``‖(Σ λ^i A_i)v‖ / Σ |λ|^i‖A_i‖₁`` for finite λ."""

    real: jax.Array          # [B, d·n]
    imag: jax.Array          # [B, d·n]
    vectors_real: jax.Array  # [B, n, d·n]
    vectors_imag: jax.Array  # [B, n, d·n]
    finite: jax.Array        # [B, d·n]
    valid: jax.Array         # [B, d·n]
    ok: jax.Array            # [B]
    resid: jax.Array         # [B, d·n]


# Degree-2 result keeps its historical name (same fields).
QuadEigResult = PolyEigResult


def polyeig_batched(
    coeffs: Sequence[jax.Array],
    sigma: float | None = None,
) -> PolyEigResult:
    """Solve batched matrix-polynomial pencils ``Σ_i λ^i A_i``.

    ``coeffs = [A₀, A₁, …, A_d]`` (lowest degree first, each
    ``[B, n, n]``, d ≥ 1).  The leading coefficient may be singular
    (the regular-pencil requirement moves to
    ``det(Σ λ^i A_i) ≢ 0``)."""
    if len(coeffs) < 2:
        raise ValueError(
            "polyeig needs at least [A0, A1] (degree >= 1); "
            f"got {len(coeffs)} coefficient(s)."
        )
    f32 = jnp.result_type(coeffs[0].dtype, jnp.float32)
    coeffs = [c.astype(f32) for c in coeffs]
    d = len(coeffs) - 1
    B, n, _ = coeffs[0].shape
    eye = jnp.broadcast_to(jnp.eye(n, dtype=f32), (B, n, n))
    zero = jnp.zeros((B, n, n), f32)

    rows = [
        jnp.concatenate(
            [eye if j == i + 1 else zero for j in range(d)], axis=2
        )
        for i in range(d - 1)
    ]
    last = jnp.concatenate([-c for c in coeffs[:d]], axis=2)
    A = jnp.concatenate(rows + [last], axis=1)
    Bm = jnp.concatenate(
        [
            jnp.concatenate(
                [
                    (coeffs[d] if i == d - 1 else eye)
                    if j == i
                    else zero
                    for j in range(d)
                ],
                axis=2,
            )
            for i in range(d)
        ],
        axis=1,
    )
    res = eig_generalized_shifted_batched(A, Bm, sigma=sigma)
    Vr = res.vectors_real[:, :n, :]
    Vi = res.vectors_imag[:, :n, :]
    nrm = jnp.sqrt(jnp.sum(Vr * Vr + Vi * Vi, axis=1))
    nrm = jnp.maximum(nrm, 1e-30)[:, None, :]
    Vr, Vi = Vr / nrm, Vi / nrm

    # True polynomial residual for finite columns (re/im arithmetic):
    # accumulate λ^i by the complex-power recurrence, apply each A_i.
    lr = jnp.where(res.finite, res.real, 0.0)
    li = jnp.where(res.finite, res.imag, 0.0)
    hp = jax.lax.Precision.HIGHEST

    def onenorm(x):
        return jnp.max(jnp.sum(jnp.abs(x), axis=1), axis=1)

    lam_abs = jnp.hypot(lr, li)
    with jax.default_matmul_precision("float32"):
        pr = jnp.ones_like(lr)   # λ^0 (re)
        pi = jnp.zeros_like(lr)  # λ^0 (im)
        pow_abs = jnp.ones_like(lam_abs)
        rr = jnp.zeros_like(Vr)
        ri = jnp.zeros_like(Vi)
        scale = jnp.zeros_like(lam_abs)
        for i, Ai in enumerate(coeffs):
            Ar = jnp.einsum("bij,bjk->bik", Ai, Vr, precision=hp)
            Aim = jnp.einsum("bij,bjk->bik", Ai, Vi, precision=hp)
            rr = rr + pr[:, None, :] * Ar - pi[:, None, :] * Aim
            ri = ri + pr[:, None, :] * Aim + pi[:, None, :] * Ar
            scale = scale + pow_abs * onenorm(Ai)[:, None]
            if i < d:
                pr, pi = pr * lr - pi * li, pr * li + pi * lr
                pow_abs = pow_abs * lam_abs
    resid = jnp.sqrt(jnp.sum(rr * rr + ri * ri, axis=1)) / jnp.maximum(
        scale, 1e-30
    )
    resid = jnp.where(res.finite, resid, 0.0)
    return PolyEigResult(
        res.real, res.imag, Vr, Vi, res.finite, res.valid, res.ok,
        resid,
    )


def quadeig_batched(
    m: jax.Array,
    c: jax.Array,
    k: jax.Array,
    sigma: float | None = None,
) -> QuadEigResult:
    """Solve batched quadratic pencils ``(λ²M + λC + K) v = 0``; M may
    be singular (rank deficiencies become flagged infinite
    eigenvalues).  The degree-2 entry point of
    :func:`polyeig_batched`."""
    return polyeig_batched([k, c, m], sigma=sigma)
