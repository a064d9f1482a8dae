"""Batched orthonormalization utilities (MXU-friendly).

CholeskyQR2 over masked column sets: two CholeskyQR passes restore the
κ² conditioning loss of one, and everything is batched GEMMs + batched
``cholesky`` + triangular solves — no sequential per-column Householder
loop (``ops.eigen.householder_qr`` is a fori_loop per column: correct
but serial; these run at MXU throughput for [B, n, n] stacks).

Used by the spectral/Jordan pipelines to orthonormalize Gauss–Jordan
nullspace generators (RREF generators are independent but far from
orthogonal — at 256-dim eigenspaces the un-orthonormalized basis pushes
``κ(P)`` high enough that the f32 ``P·P⁻¹`` residual fails validation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def compact_columns(gens: jax.Array, gmask: jax.Array) -> jax.Array:
    """Move the masked columns of ``gens`` to the front (order kept),
    zeros elsewhere — one-hot matmuls, no gathers."""
    B, n, _ = gens.shape
    gm = gmask.astype(gens.dtype)
    tidx = jnp.arange(n)
    posj = jnp.cumsum(gm, axis=1) - 1                  # [B, j]
    t_oh = (
        (posj[:, :, None] == tidx[None, None, :]) * gm[:, :, None]
    )                                                  # [B, j, t]
    return jnp.einsum(
        "bij,bjt->bit", gens * gm[:, None, :], t_oh, precision=_HIGH
    )


def _right_tri_solve(g: jax.Array, L: jax.Array) -> jax.Array:
    """Solve ``Q Lᵀ = G`` for Q with L lower-triangular: Qᵀ = L⁻¹ Gᵀ."""
    qt = jax.scipy.linalg.solve_triangular(
        L, jnp.swapaxes(g, -1, -2), lower=True
    )
    return jnp.swapaxes(qt, -1, -2)


def _chol_qr(g: jax.Array, colmask: jax.Array, shift: float = 0.0):
    """One CholeskyQR pass on front-compacted columns; masked-out columns
    stay exactly zero (their Gram diagonal is patched to 1).  ``shift``
    adds a relative diagonal regularization (shifted CholeskyQR): the
    Gram matrix of a numerically rank-deficient column set is otherwise
    indefinite under roundoff, cholesky returns NaN, and the NaN
    propagates silently."""
    nc = g.shape[-1]
    gram = jnp.einsum("bji,bjk->bik", g, g, precision=_HIGH)
    eye = jnp.eye(nc, dtype=g.dtype)
    if shift:
        scale = jnp.trace(gram, axis1=1, axis2=2)[:, None, None]
        gram = gram + shift * scale * eye[None]
    gram = gram + (1.0 - colmask[:, None, :]) * eye[None]
    L = jnp.linalg.cholesky(gram)
    Q = _right_tri_solve(g, L)
    return Q * colmask[:, None, :]


def orthonormal_columns(gens: jax.Array, gmask: jax.Array):
    """Orthonormal basis of span(masked columns of gens), front-compacted:
    returns ``(Q [B, n, n], d [B])`` with the first ``d`` columns
    orthonormal and the rest exactly zero.

    Shifted CholeskyQR3: columns are pre-normalized, the FIRST pass
    carries a diagonal shift that keeps the Gram factorization positive
    definite even when the normalized set is ill-conditioned past
    1/√eps (plain CholeskyQR2 returns all-NaN there), and two unshifted
    refinement passes restore orthonormality to working precision."""
    B, n, _ = gens.shape
    d = gmask.sum(axis=1).astype(jnp.int32)            # [B]
    colmask = (
        jnp.arange(n)[None, :] < d[:, None]
    ).astype(gens.dtype)                               # [B, n]
    C = compact_columns(gens, gmask)
    norms = jnp.sqrt(jnp.sum(C * C, axis=1))
    C = C / jnp.maximum(norms, 1e-30)[:, None, :]
    eps = float(jnp.finfo(C.dtype).eps)
    Q = _chol_qr(C, colmask, shift=16.0 * n * eps)
    Q = _chol_qr(Q, colmask)
    Q = _chol_qr(Q, colmask)
    return Q, d
