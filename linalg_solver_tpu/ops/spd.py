"""Symmetric-positive-definite fast path: Cholesky solve / inverse / det.

The SPD counterpart of the symmetric-eigensolver fast path
(``ops.symmetric``): when a batch is known SPD (Gram matrices, normal
equations, covariance), Cholesky halves the work of LU, needs no
pivoting (unconditionally stable for SPD), and its failure IS the
definiteness test — XLA's batched ``cholesky`` returns NaN rows
exactly where a leading minor is nonpositive, surfaced here as a
per-lane ``ok`` flag rather than a wrong answer.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST



class CholeskyResult(NamedTuple):
    L: jax.Array   # [B, n, n] lower factor (a = L Lᵀ); NaN rows where
    #                not positive definite
    ok: jax.Array  # [B] matrix was SPD (factor finite)


def cholesky_batched(a: jax.Array) -> CholeskyResult:
    """Cholesky factor of a batched SPD matrix (symmetrized first).

    DIFFERENTIABLE: custom VJP with Murray's adjoint
    ``Ā = sym(L⁻ᵀ Φ(Lᵀ L̄) L⁻¹)`` where ``Φ`` takes the lower
    triangle with the diagonal halved — two triangular solves, no
    refactorization."""
    return _chol_vjp(a)


@jax.custom_vjp
def _chol_vjp(a):
    return _chol_impl(a)


def _chol_fwd(a):
    r = _chol_impl(a)
    return r, r.L


@f32_matmuls
def _chol_bwd(L, g):
    # f32_matmuls: keeps solve_triangular's blocked matmuls at f32
    # precision on TPU (gradients would otherwise drop to bf16).
    n = L.shape[-1]
    P = jnp.einsum("bji,bjk->bik", L, g.L, precision=_HIGH)
    phi = jnp.tril(P) - 0.5 * P * jnp.eye(n, dtype=L.dtype)
    # S = L⁻ᵀ Φ L⁻¹:  X = L⁻ᵀ Φ, then S = X L⁻¹ = (L⁻ᵀ Xᵀ)ᵀ
    X = jax.scipy.linalg.solve_triangular(L, phi, lower=True, trans=1)
    S = jnp.swapaxes(
        jax.scipy.linalg.solve_triangular(
            L, jnp.swapaxes(X, 1, 2), lower=True, trans=1
        ),
        1, 2,
    )
    return (0.5 * (S + jnp.swapaxes(S, 1, 2)),)


_chol_vjp.defvjp(_chol_fwd, _chol_bwd)


@jax.jit
@f32_matmuls
def _chol_impl(a: jax.Array) -> CholeskyResult:
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    sym = 0.5 * (a + jnp.swapaxes(a, 1, 2))
    L = jnp.linalg.cholesky(sym)
    return CholeskyResult(L, jnp.all(jnp.isfinite(L), axis=(1, 2)))


@jax.jit
@f32_matmuls
def cholesky_solve_batched(a: jax.Array, b: jax.Array):
    """Solve SPD systems ``a x = b`` (``b [B, n]`` or ``[B, n, k]``).
    Returns ``(x, ok)``; non-SPD lanes carry NaNs and ``ok=False``."""
    res = cholesky_batched(a)
    vector_input = b.ndim == 2
    b3 = (b[:, :, None] if vector_input else b).astype(res.L.dtype)
    y = jax.scipy.linalg.solve_triangular(res.L, b3, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        res.L, y, lower=True, trans=1
    )
    return (x[:, :, 0] if vector_input else x), res.ok


@jax.jit
@f32_matmuls
def cholesky_inverse_batched(a: jax.Array):
    """Inverse of a batched SPD matrix: two triangular solves against
    the identity.  Returns ``(inv, ok)``."""
    res = cholesky_batched(a)
    n = a.shape[-1]
    eye = jnp.broadcast_to(
        jnp.eye(n, dtype=res.L.dtype), res.L.shape
    )
    y = jax.scipy.linalg.solve_triangular(res.L, eye, lower=True)
    inv = jax.scipy.linalg.solve_triangular(
        res.L, y, lower=True, trans=1
    )
    return inv, res.ok


@jax.jit
@f32_matmuls
def logdet_spd_batched(a: jax.Array):
    """(sign-free) log-determinant of SPD batches:
    ``2·Σ log diag(L)`` — overflow-free where ``det`` itself would
    leave f32 range.  Returns ``(logdet, ok)``."""
    res = cholesky_batched(a)
    n = a.shape[-1]
    # mask-reduce, NOT jnp.diagonal: XLA lowers diagonal to a gather
    # (measured 0.67 ms on a [256,128,128] batch — ops/lu_blocked.py);
    # the multiply-reduce fuses into one pass.
    d = jnp.sum(
        res.L * jnp.eye(n, dtype=res.L.dtype), axis=-1
    )
    return 2.0 * jnp.sum(jnp.log(jnp.maximum(d, 1e-38)), axis=1), res.ok


class PivotedCholesky(NamedTuple):
    """Rank-revealing ``A ≈ L Lᵀ`` with ``L [B, n, r]`` built greedily
    on the largest remaining diagonal (LAPACK pstrf's pivot rule).
    ``piv[b, :rank[b]]`` are the chosen pivot indices in order;
    columns ≥ rank are exactly zero.  ``resid_diag`` is the trace of
    the unfactored remainder (the Nyström/trace error bound
    ``‖A − L Lᵀ‖_tr``)."""

    L: jax.Array           # [B, n, r]
    piv: jax.Array         # [B, r] i32
    rank: jax.Array        # [B] i32
    resid_diag: jax.Array  # [B]
    ok: jax.Array          # [B] no negative remaining diagonal beyond
    #                        roundoff was hit (input was numerically PSD)


@functools.partial(jax.jit, static_argnames=("max_rank", "rtol"))
@f32_matmuls
def pivoted_cholesky_batched(
    a: jax.Array,
    max_rank: int = 0,
    rtol: float = 0.0,
) -> PivotedCholesky:
    """Batched diagonal-pivoted Cholesky of PSD matrices — the
    rank-revealing / low-rank form (`scipy pstrf` semantics, early
    stop at ``max_rank`` for Nyström-style kernel approximation).

    Per step: pick the largest remaining diagonal (per lane), form the
    Schur-complement column against the already-built columns (one
    [B, n, r]·[B, r] GEMV — MXU work), normalize, downdate the
    diagonal.  Lanes stop when the remaining diagonal falls below
    ``rtol · trace(A)`` (default: PSD roundoff floor ``n·eps``) and
    freeze; ``rank`` is where each lane stopped.
    """
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    a = 0.5 * (a + jnp.swapaxes(a, 1, 2))
    B, n, _ = a.shape
    r = n if max_rank == 0 else min(max_rank, n)
    eps = float(jnp.finfo(f32).eps)
    if rtol == 0.0:
        rtol = n * eps

    d0 = jnp.diagonal(a, axis1=1, axis2=2)
    trace0 = jnp.maximum(jnp.sum(d0, axis=1), 1e-30)
    idx = jnp.arange(n)

    def step(j, carry):
        L, piv, D, rank, ok = carry
        # Largest remaining diagonal; used pivots carry -inf.
        p = jnp.argmax(D, axis=1).astype(jnp.int32)      # [B]
        d = jnp.take_along_axis(D, p[:, None], axis=1)[:, 0]
        active = (d > rtol * trace0) & (rank == j)
        # Column p of A and row p of L (one-hot selects — per-lane
        # dynamic index, MXU-friendly).
        oh = (idx[None, :] == p[:, None]).astype(f32)    # [B, n]
        col = jnp.einsum("bij,bj->bi", a, oh, precision=_HIGH)
        lrow = jnp.einsum("bnr,bn->br", L, oh, precision=_HIGH)
        col = col - jnp.einsum(
            "bnr,br->bn", L, lrow, precision=_HIGH
        )
        d_safe = jnp.sqrt(jnp.maximum(d, 1e-30))
        newcol = jnp.where(active[:, None], col / d_safe[:, None], 0.0)
        # The pivot row of the new column is exactly sqrt(d); entries
        # of already-used pivot rows are forced to zero (they are
        # eliminated exactly in exact arithmetic).
        used = D == -jnp.inf
        newcol = jnp.where(used, 0.0, newcol)
        newcol = jnp.where(
            oh > 0, jnp.where(active[:, None], d_safe[:, None], 0.0),
            newcol,
        )
        L = jax.lax.dynamic_update_slice(
            L, newcol[:, :, None], (0, 0, j)
        )
        D = D - newcol * newcol
        ok = ok & (jnp.min(jnp.where(used, 0.0, D), axis=1)
                   > -64.0 * n * eps * trace0)
        D = jnp.where((oh > 0) & active[:, None], -jnp.inf, D)
        piv = jax.lax.dynamic_update_slice(
            piv, p[:, None], (0, j)
        )
        rank = jnp.where(active, j + 1, rank)
        return L, piv, D, rank, ok

    L0 = jnp.zeros((B, n, r), f32)
    piv0 = jnp.zeros((B, r), jnp.int32)
    rank0 = jnp.zeros((B,), jnp.int32)
    ok0 = jnp.ones((B,), bool)
    L, piv, D, rank, ok = jax.lax.fori_loop(
        0, r, step, (L0, piv0, d0, rank0, ok0)
    )
    resid = jnp.sum(jnp.where(D == -jnp.inf, 0.0, jnp.maximum(D, 0.0)),
                    axis=1)
    return PivotedCholesky(L, piv, rank, resid, ok)
