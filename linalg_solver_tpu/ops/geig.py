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
