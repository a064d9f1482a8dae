"""Batched generalized eigenproblems ``A v = λ B v``.

Two production paths (the full QZ iteration — needed only when B is
singular/ill-conditioned — is not implemented; lanes where these
reductions are untrustworthy are flagged, not silently wrong):

- ``eigh_generalized_batched`` — symmetric A, SPD B (the dominant
  case: generalized Rayleigh quotients, LDA, vibration modes).
  Cholesky reduction ``B = L Lᵀ`` → standard symmetric problem
  ``(L⁻¹ A L⁻ᵀ) y = λ y`` → eigenvectors ``v = L⁻ᵀ y``, which are
  B-orthonormal (``vᵀ B v = I``).  Backward stable for
  well-conditioned B.
- ``eig_generalized_batched`` — general A, invertible B: reduce to
  the standard problem ``(B⁻¹A) v = λ v`` through the framework's LU
  solve, then the production Schur/strevc eigensolver.  Error scales
  with κ(B) (estimated per lane and reported).
- ``eig_generalized_shifted_batched`` — general A, B allowed SINGULAR
  (regular pencils): shift-invert spectral transformation
  ``M = (A − σB)⁻¹ B``, whose eigenpairs ``(μ, v)`` map to the
  pencil's by ``λ = σ + 1/μ`` with the SAME right vectors; ``μ ≈ 0``
  identifies the infinite eigenvalues a singular B induces.  Only
  needs SOME σ with ``A − σB`` invertible (true for every regular
  pencil), retried over a deterministic σ ladder per batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls



class GeneralizedEighResult(NamedTuple):
    w: jax.Array   # [B, n] ascending eigenvalues
    V: jax.Array   # [B, n, n] B-orthonormal eigenvectors (VᵀBV = I)
    ok: jax.Array  # [B] B was SPD (Cholesky finite)


@jax.jit
@f32_matmuls
def eigh_generalized_batched(
    a: jax.Array, b: jax.Array
) -> GeneralizedEighResult:
    """Solve ``A v = λ B v`` for symmetric A and SPD B per lane."""
    from .spd import cholesky_batched

    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    chol = cholesky_batched(b)
    L = chol.L
    a_sym = 0.5 * (a + jnp.swapaxes(a, 1, 2))
    # C = L⁻¹ A L⁻ᵀ (two batched triangular solves).
    C = jax.scipy.linalg.solve_triangular(L, a_sym, lower=True)
    C = jax.scipy.linalg.solve_triangular(
        L, jnp.swapaxes(C, 1, 2), lower=True
    )
    from .symmetric import eigh_batched

    r = eigh_batched(C)  # symmetrizes C; w ascending
    # v = L⁻ᵀ y.
    V = jax.scipy.linalg.solve_triangular(L, r.V, lower=True, trans=1)
    return GeneralizedEighResult(r.w, V, chol.ok)


class GeneralizedEigResult(NamedTuple):
    real: jax.Array          # [B, n]
    imag: jax.Array          # [B, n]
    vectors_real: jax.Array  # [B, n, n]
    vectors_imag: jax.Array  # [B, n, n]
    valid: jax.Array         # [B, n]
    ok: jax.Array            # [B] B invertible + eigensolve converged
    rcond_b: jax.Array       # [B] reciprocal condition estimate of B —
    #                          eigenvalue error scales with 1/rcond_b


def eig_generalized_batched(a: jax.Array, b: jax.Array):
    """Solve ``A v = λ B v`` for general square A and invertible B."""
    from .cond import _inv_onenorm_est
    from .lu import lu_factor_batched, lu_solve_batched
    from .schur import eig_batched

    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    b = b.astype(f32)
    res = lu_factor_batched(b)
    m = lu_solve_batched(res, a)          # B⁻¹ A
    eg = eig_batched(m)
    # κ₁(B) from the SAME factorization (Hager estimate — no second LU).
    onenorm = jnp.max(jnp.sum(jnp.abs(b), axis=1), axis=1)
    inv_est = jax.vmap(lambda r: _inv_onenorm_est(r, 5))(res)
    rc = jnp.where(
        res.ok,
        1.0 / jnp.maximum(onenorm * inv_est, 1e-30),
        0.0,
    )
    ok = res.ok & eg.converged & (rc > 0)
    return GeneralizedEigResult(
        eg.real, eg.imag, eg.vectors_real, eg.vectors_imag,
        eg.valid, ok, rc,
    )


class GeneralizedEigShifted(NamedTuple):
    """Pencil eigenpairs via shift-invert.  ``finite=False`` columns are
    the pencil's INFINITE eigenvalues (B-nullspace directions; their
    (real, imag) is (+inf, 0)).  ``sigma`` is the per-batch shift that
    was accepted; ``rcond_shift`` the reciprocal condition estimate of
    ``A − σB`` (accuracy scales with 1/rcond_shift)."""

    real: jax.Array          # [B, n]
    imag: jax.Array          # [B, n]
    vectors_real: jax.Array  # [B, n, n]
    vectors_imag: jax.Array  # [B, n, n]
    finite: jax.Array        # [B, n]
    valid: jax.Array         # [B, n]
    ok: jax.Array            # [B]
    sigma: jax.Array         # [B]
    rcond_shift: jax.Array   # [B]


@jax.jit
@f32_matmuls
def _shifted_core(a, b, sigma):
    from .cond import _inv_onenorm_est
    from .lu import lu_factor_batched, lu_solve_batched

    shifted = a - sigma[:, None, None] * b
    res = lu_factor_batched(shifted)
    m = lu_solve_batched(res, b)          # (A − σB)⁻¹ B
    onenorm = jnp.max(jnp.sum(jnp.abs(shifted), axis=1), axis=1)
    inv_est = jax.vmap(lambda r: _inv_onenorm_est(r, 5))(res)
    rc = jnp.where(
        res.ok, 1.0 / jnp.maximum(onenorm * inv_est, 1e-30), 0.0
    )
    norm_m = jnp.max(jnp.sum(jnp.abs(m), axis=1), axis=1)
    return m, res.ok, rc, norm_m


def eig_generalized_shifted_batched(
    a: jax.Array,
    b: jax.Array,
    sigma: float | None = None,
    mu_floor: float = 100.0,
    rcond_min: float = 1e-5,
):
    """Solve the regular pencil ``A v = λ B v`` with B possibly
    SINGULAR, via the shift-invert transformation.

    ``(A − σB)⁻¹ B v = μ v  ⇔  A v = (σ + 1/μ) B v`` — the standard
    eigenproblem of ``M`` delivers the pencil's eigenvectors directly
    and its eigenvalues through ``λ = σ + 1/μ``; ``|μ|`` at the μ-noise
    floor (below ``mu_floor·n·eps·‖M‖₁`` — a true infinite eigenvalue
    computes to μ = O(eps·‖M‖), and this scale, unlike a max|μ|-relative
    cutoff, does not shrink when σ happens to sit close to some
    eigenvalue) marks an infinite pencil eigenvalue.
    With ``sigma=None`` a deterministic ladder of shifts
    scaled by ``‖A‖₁/‖B‖₁`` is tried and each lane keeps the first
    whose ``A − σB`` is comfortably invertible (rcond ≥ rcond_min) —
    for a regular pencil almost every σ works, so the first try
    virtually always lands.
    """
    from .schur import eig_batched

    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    b = b.astype(f32)
    Bn = a.shape[0]

    norm_a = jnp.max(jnp.sum(jnp.abs(a), axis=1), axis=1)
    norm_b = jnp.max(jnp.sum(jnp.abs(b), axis=1), axis=1)
    rho = jnp.maximum(norm_a, 1e-30) / jnp.maximum(norm_b, 1e-30)
    if sigma is not None:
        ladder = [jnp.full((Bn,), sigma, f32)]
    else:
        # Irrational multipliers: a σ that hits an eigenvalue exactly
        # is measure-zero, and these avoid the common integer spectra.
        ladder = [
            c * rho for c in (1.077351, -0.538674, 3.912023, 0.276393)
        ]

    sig = ladder[0]
    m, okf, rc, norm_m = _shifted_core(a, b, sig)
    import numpy as _np

    for cand in ladder[1:]:
        bad = _np.asarray((~okf) | (rc < rcond_min))
        if not bad.any():
            break
        sig = jnp.where(jnp.asarray(bad), cand, sig)
        m2, ok2, rc2, nm2 = _shifted_core(a, b, sig)
        upd = jnp.asarray(bad)
        m = jnp.where(upd[:, None, None], m2, m)
        okf = jnp.where(upd, ok2, okf)
        rc = jnp.where(upd, rc2, rc)
        norm_m = jnp.where(upd, nm2, norm_m)

    eg = eig_batched(m)
    mu_re, mu_im = eg.real, eg.imag
    mu2 = mu_re * mu_re + mu_im * mu_im
    n = a.shape[1]
    eps = float(jnp.finfo(f32).eps)
    finite = jnp.sqrt(mu2) > (mu_floor * n * eps) * norm_m[:, None]
    inv_den = jnp.maximum(mu2, 1e-38)
    lam_re = sig[:, None] + mu_re / inv_den
    lam_im = -mu_im / inv_den
    lam_re = jnp.where(finite, lam_re, jnp.inf)
    lam_im = jnp.where(finite, lam_im, 0.0)
    ok = okf & eg.converged & (rc >= rcond_min)
    return GeneralizedEigShifted(
        lam_re, lam_im, eg.vectors_real, eg.vectors_imag,
        finite, eg.valid, ok, sig, rc,
    )
