"""Batched condition-number estimation (1-norm, Hager/Higham).

The reference works over exact scalars, where "ill-conditioned" does
not exist; a floating-point device framework must expose conditioning
so callers can trust (or reject) a solve — this backs the failure-
detection story (``models.solver.solve_checked``) and the documented
contract of the mixed-precision refined solve
(``ops.lu_blocked.pallas_solve_mixed_batched``), whose refinement stops
contracting once κ(A) approaches the reciprocal of the factorization
precision.

``cond1_est_batched`` estimates κ₁(A) = ‖A‖₁·‖A⁻¹‖₁ from ONE LU
factorization: ‖A⁻¹‖₁ by the classic Hager power method on the dual
norm (LAPACK dlacon's core), which needs only solves with A and Aᵀ —
both served by the same packed L\\U (O(n²) per step after the O(n³)
factor).  The estimate is a LOWER bound on the true norm, in practice
within a small factor (usually exact for random matrices); LAPACK's
``rcond`` has the same contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .lu import LUResult, lu_factor, lu_solve
from ..utils.precision import f32_matmuls


@jax.jit
@f32_matmuls
def lu_solve_transposed(res: LUResult, b: jax.Array) -> jax.Array:
    """Solve ``aᵀ @ x = b`` given ``lu_factor(a)`` (single system).

    With ``P a = L U`` (``perm``: row i of Pa is row perm[i] of a),
    ``aᵀ = Uᵀ Lᵀ P``: forward-substitute the lower-triangular ``Uᵀ``,
    back-substitute the unit-upper ``Lᵀ``, then un-permute
    (``x = Pᵀ v`` ⇔ ``x[perm] = v``)."""
    lu, perm = res.lu, res.perm
    n = lu.shape[0]
    vector_input = b.ndim == 1
    if vector_input:
        b = b[:, None]
    b = b.astype(lu.dtype)
    rows = jnp.arange(n)

    # Forward: Uᵀ w = b.  Uᵀ[i, :i] = U[:i, i] (column i above diag).
    def fwd(i, w):
        ui = jnp.where(rows < i, lu[:, i], 0)
        return w.at[i].set((b[i] - ui @ w) / lu[i, i])

    w = lax.fori_loop(0, n, fwd, jnp.zeros_like(b))

    # Backward: Lᵀ v = w (unit diagonal).  Lᵀ[i, i+1:] = L[i+1:, i].
    def bwd(j, v):
        i = n - 1 - j
        li = jnp.where(rows > i, lu[:, i], 0)
        return v.at[i].set(w[i] - li @ v)

    v = lax.fori_loop(0, n, bwd, jnp.zeros_like(b))
    x = jnp.zeros_like(v).at[perm].set(v)
    return x[:, 0] if vector_input else x


def lu_solve_transposed_batched(res: LUResult, b: jax.Array) -> jax.Array:
    return jax.vmap(lu_solve_transposed)(res, b)


def _inv_onenorm_est(res: LUResult, iters: int) -> jax.Array:
    """Hager's estimate of ‖A⁻¹‖₁ from a factorization (single matrix).

    Fixed iteration count (jit-static); a converged iteration simply
    re-selects the same unit vector and leaves the running maximum
    unchanged, so no early-exit control flow is needed.  Finishes with
    dlacn2's alternating-sign probe as a second lower bound (catches
    the counterexamples where the power method stalls at a poor
    vertex)."""
    n = res.lu.shape[0]
    dtype = res.lu.dtype
    x = jnp.full((n,), 1.0 / n, dtype)
    est = jnp.zeros((), dtype)
    for _ in range(iters):
        y = lu_solve(res, x)
        est = jnp.maximum(est, jnp.sum(jnp.abs(y)))
        xi = jnp.where(y >= 0, 1.0, -1.0).astype(dtype)
        z = lu_solve_transposed(res, xi)
        j = jnp.argmax(jnp.abs(z))
        x = (jnp.arange(n) == j).astype(dtype)
    # Alternating probe: x̃ᵢ = (−1)ⁱ·(1 + i/(n−1)), est ≥ 2‖A⁻¹x̃‖₁/(3n).
    i = jnp.arange(n, dtype=dtype)
    alt = jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0) * (
        1.0 + i / jnp.maximum(n - 1, 1)
    )
    y_alt = lu_solve(res, alt.astype(dtype))
    est = jnp.maximum(est, 2.0 * jnp.sum(jnp.abs(y_alt)) / (3.0 * n))
    return est


@functools.partial(jax.jit, static_argnames=("iters",))
@f32_matmuls
def cond1_est_batched(a: jax.Array, iters: int = 5) -> jax.Array:
    """[B] estimate of κ₁ = ‖A‖₁·‖A⁻¹‖₁ per lane (inf for singular).

    A lower bound within a small factor of the truth — the standard
    LAPACK-style contract; use it to gate solves (κ·eps ≳ 1 means the
    solution carries no trusted digits) and to predict whether the
    mixed-precision refined solve will converge (κ ≲ 1/u_factor)."""
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    onenorm = jnp.max(jnp.sum(jnp.abs(a), axis=1), axis=1)
    res = jax.vmap(lu_factor)(a)
    inv_est = jax.vmap(lambda r: _inv_onenorm_est(r, iters))(res)
    kappa = onenorm * inv_est
    return jnp.where(res.ok, kappa, jnp.inf)


@functools.partial(jax.jit, static_argnames=("iters",))
def rcond_batched(a: jax.Array, iters: int = 5) -> jax.Array:
    """[B] reciprocal condition estimate 1/κ₁ (0 for singular) — the
    LAPACK ``rcond`` convention: compare against ``eps`` to decide how
    many digits of a solve survive."""
    kappa = cond1_est_batched(a, iters=iters)
    return jnp.where(jnp.isfinite(kappa), 1.0 / kappa, 0.0)
