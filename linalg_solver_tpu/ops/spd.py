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

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls



class CholeskyResult(NamedTuple):
    L: jax.Array   # [B, n, n] lower factor (a = L Lᵀ); NaN rows where
    #                not positive definite
    ok: jax.Array  # [B] matrix was SPD (factor finite)


@jax.jit
@f32_matmuls
def cholesky_batched(a: jax.Array) -> CholeskyResult:
    """Cholesky factor of a batched SPD matrix (symmetrized first)."""
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
