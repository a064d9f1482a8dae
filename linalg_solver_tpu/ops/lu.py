"""Batched LU factorization with partial pivoting (XLA path).

Right-looking LU over static-shape ``fori_loop`` bodies, ``vmap``-able over
a leading batch axis.  ``L`` (unit diagonal, below) and ``U`` (at/above)
are packed into one ``[n, n]`` array; the pivot permutation is returned in
row-swap form plus the accumulated sign.

This is the reference implementation the blocked Pallas kernel
(``ops.pallas.lu_kernel``) is validated against; the public entry points
dispatch on ``backend=``.

Determinant = sign × prod(diag U) — the numeric fast path for
``determinant`` (the exact path keeps the combinatorial planner for
sparse/symbolic derivations; see SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls
from jax import lax


class LUResult(NamedTuple):
    lu: jax.Array        # [..., n, n] packed L\U
    perm: jax.Array      # [..., n] int32: row i of PA is row perm[i] of A
    sign: jax.Array      # [...] ±1 (det of P)
    ok: jax.Array        # [...] bool: no zero pivot encountered


@functools.partial(jax.jit, static_argnames=())
@f32_matmuls
def lu_factor(a: jax.Array, tol: float = 0.0) -> LUResult:
    """Factor a single ``[n, n]`` matrix: P @ a = L @ U."""
    n = a.shape[0]
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    dtype = a.dtype
    rows = jnp.arange(n)
    tol_arr = jnp.asarray(tol, dtype)

    def body(k, carry):
        A, perm, sign, ok = carry
        col_abs = jnp.abs(A[:, k])
        masked = jnp.where(rows >= k, col_abs, -jnp.inf)
        p = jnp.argmax(masked)
        has_pivot = masked[p] > tol_arr

        # Swap rows k and p (in A and in the permutation record).
        do_swap = has_pivot & (p != k)
        row_k, row_p = A[k], A[p]
        A_sw = A.at[k].set(row_p).at[p].set(row_k)
        A = jnp.where(do_swap, A_sw, A)
        perm_sw = perm.at[k].set(perm[p]).at[p].set(perm[k])
        perm = jnp.where(do_swap, perm_sw, perm)
        sign = jnp.where(do_swap, -sign, sign)

        pivot = A[k, k]
        safe_pivot = jnp.where(has_pivot, pivot, 1)
        factors = jnp.where((rows > k) & has_pivot, A[:, k] / safe_pivot, 0)

        # Trailing update on columns > k; column k stores the multipliers.
        cols_right = (jnp.arange(n) > k).astype(dtype)
        A = A - factors[:, None] * (A[k] * cols_right)[None, :]
        A = A.at[:, k].set(jnp.where(rows > k, factors, A[:, k]))

        ok = ok & has_pivot
        return A, perm, sign, ok

    A, perm, sign, ok = lax.fori_loop(
        0, n, body,
        (a, jnp.arange(n, dtype=jnp.int32), jnp.asarray(1, dtype),
         jnp.bool_(True)),
    )
    return LUResult(A, perm, sign, ok)


def lu_factor_batched(a: jax.Array, tol: float = 0.0) -> LUResult:
    return jax.vmap(functools.partial(lu_factor, tol=tol))(a)


@jax.jit
@f32_matmuls
def lu_solve(res: LUResult, b: jax.Array) -> jax.Array:
    """Solve ``a @ x = b`` given ``lu_factor(a)`` (single system;
    ``b`` may be a vector or ``[n, k]`` block of right-hand sides)."""
    lu, perm = res.lu, res.perm
    n = lu.shape[0]
    vector_input = b.ndim == 1
    if vector_input:
        b = b[:, None]
    b = b.astype(lu.dtype)
    pb = b[perm]

    rows = jnp.arange(n)

    # Forward: L y = P b (unit lower triangular).
    def fwd(i, y):
        # y[i] -= L[i, :i] @ y[:i]
        li = jnp.where(rows < i, lu[i], 0)
        return y.at[i].set(pb[i] - li @ y)

    y = lax.fori_loop(0, n, fwd, jnp.zeros_like(pb))

    # Backward: U x = y.
    def bwd(j, x):
        i = n - 1 - j
        ui = jnp.where(rows > i, lu[i], 0)
        return x.at[i].set((y[i] - ui @ x) / lu[i, i])

    x = lax.fori_loop(0, n, bwd, jnp.zeros_like(pb))
    return x[:, 0] if vector_input else x


def lu_solve_batched(res: LUResult, b: jax.Array) -> jax.Array:
    return jax.vmap(lu_solve)(res, b)


@jax.jit
def det_lu(a: jax.Array) -> jax.Array:
    """Determinant via LU: sign × product of U's diagonal."""
    res = lu_factor(a)
    diag = jnp.diagonal(res.lu)
    return jnp.where(res.ok, res.sign * jnp.prod(diag), 0)


def det_lu_batched(a: jax.Array) -> jax.Array:
    return jax.vmap(det_lu)(a)


@jax.jit
def solve_lu(a: jax.Array, b: jax.Array) -> jax.Array:
    """Unique-solution solve via LU with partial pivoting.  For singular /
    rectangular systems use ``ops.solve.solve`` (affine subspace result)."""
    return lu_solve(lu_factor(a), b)


def solve_lu_batched(a: jax.Array, b: jax.Array) -> jax.Array:
    return jax.vmap(solve_lu)(a, b)
