"""Fraction-free (Bareiss) elimination on device: BIT-EXACT integer
linear algebra.

The float Gauss–Jordan/LU paths need tolerances; for integer matrices the
Bareiss algorithm keeps every intermediate an exact integer (each 2×2
cross-multiplication step is exactly divisible by the previous pivot), so
zero tests, pivot choices, determinants and ranks are exact — matching the
exact host path bit for bit, with no tolerance knobs.

TPU has no native f64/i64 vector arithmetic, so the working type is
int32: exactness holds while intermediates stay below 2³¹.  Bareiss
intermediates are bounded by Hadamard's inequality — ``bareiss_safe``
checks a given (n, max|entry|) against it.  Config-1-sized problems
(8×8, entries in [-5, 5]) fit comfortably.

Pivoting uses the reference's **first nonzero row** rule
(reference linalg.py:548-567), so pivot sequences bit-match the exact
path by construction.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def bareiss_safe(n: int, amax: int) -> bool:
    """True if an n×n integer matrix with entries |a| ≤ amax can NEVER
    overflow int32 during Bareiss elimination (worst-case Hadamard bound
    on the pre-division cross products).

    This is very conservative — real matrices stay far below Hadamard's
    bound, which is why ``bareiss_batched`` also verifies at runtime and
    reports per-element ``ok`` flags: results are exact iff ``ok``."""
    def minor_bound(k):
        return (amax * amax * k) ** (k / 2)

    # Step k multiplies entries bounded by minor_bound(k+1) with the
    # pivot (also a (k+1)-minor); the difference doubles the magnitude.
    worst = max(
        2 * minor_bound(k + 1) ** 2 for k in range(max(n - 1, 1))
    )
    return worst < 2**31


class BareissResult(NamedTuple):
    det: jax.Array    # [B] int32 — exact determinant
    rank: jax.Array   # [B] int32 — exact rank
    ok: jax.Array     # [B] bool — False if int32 overflow was detected


@functools.partial(jax.jit, static_argnames=())
def bareiss_batched(a: jax.Array) -> BareissResult:
    """Exact determinant and rank of an integer batch ``[B, n, n]``.

    Fraction-free elimination with first-nonzero-row pivoting and column
    skipping on rank deficiency.  Overflow is detected by mirroring the
    computation in float64-free fashion: any intermediate whose float32
    mirror exceeds 2³⁰ marks the element as unreliable (``ok=False``).
    """
    B, n, _ = a.shape
    M = a.astype(jnp.int32)
    rows = jnp.arange(n)

    def body(j, carry):
        M, r, prev, sign, rank, ok = carry
        # col j at-or-below pivot row r (per batch element): first nonzero.
        col = M[:, :, j]
        eligible = (rows[None, :] >= r[:, None]) & (col != 0)
        p = jnp.argmax(eligible, axis=1)
        has_pivot = eligible.any(axis=1)

        # Swap rows r and p via one-hot exchange.
        do_swap = has_pivot & (p != r)
        oh_r = (rows[None, :] == r[:, None]).astype(M.dtype)
        oh_p = (rows[None, :] == p[:, None]).astype(M.dtype)
        row_r = jnp.einsum("bn,bnk->bk", oh_r, M)
        row_p = jnp.einsum("bn,bnk->bk", oh_p, M)
        delta = (row_r - row_p) * do_swap[:, None].astype(M.dtype)
        M = M - oh_r[:, :, None] * delta[:, None, :] \
              + oh_p[:, :, None] * delta[:, None, :]
        sign = jnp.where(do_swap, -sign, sign)

        # Fraction-free elimination of rows below r:
        #   M[i, :] := (M[i, :]·piv − M[i, j]·row_r) / prev   (exact)
        piv = jnp.einsum("bn,bn->b", oh_r.astype(M.dtype), M[:, :, j])
        pivot_row = jnp.einsum("bn,bnk->bk", oh_r, M)
        below = (rows[None, :] > r[:, None]) & has_pivot[:, None]
        factors = M[:, :, j] * below.astype(M.dtype)

        # Overflow sentinel BEFORE multiplying: the cross products
        # |M[i,:]|·|piv| + |M[i,j]|·|row_r| for the updated rows must stay
        # below 2³¹ or int32 wraps silently.  Only rows at/below the pivot
        # participate.
        active = (rows[None, :] >= r[:, None]).astype(jnp.float32)
        max_m = jnp.max(
            jnp.abs(M).astype(jnp.float32) * active[:, :, None],
            axis=(1, 2),
        )
        piv_f = jnp.abs(piv).astype(jnp.float32)
        overflow_risk = 2.0 * max_m * jnp.maximum(piv_f, 1.0) >= 2.0**31
        ok = ok & ~(overflow_risk & has_pivot)

        updated = (
            M * piv[:, None, None] - factors[:, :, None] * pivot_row[:, None, :]
        )
        # Exact division by the previous pivot (Bareiss invariant).
        updated = updated // prev[:, None, None]
        M = jnp.where(below[:, :, None], updated, M)

        rank = rank + has_pivot.astype(jnp.int32)
        prev = jnp.where(has_pivot, piv, prev)
        r = r + has_pivot.astype(jnp.int32)
        return M, r, prev, sign, rank, ok

    init = (
        M,
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), jnp.int32),
        jnp.ones((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), bool),
    )
    M, r, prev, sign, rank, ok = lax.fori_loop(0, n, body, init)

    # After full elimination the last pivot IS det(A) up to the swap sign
    # (Bareiss invariant: the pivot at step k is the leading k×k minor of
    # the pivoted matrix).  Rank-deficient matrices have det 0.
    det = jnp.where(rank == n, sign * prev, 0)
    return BareissResult(det.astype(jnp.int32), rank, ok)


def bareiss_det_batched(a: jax.Array) -> jax.Array:
    return bareiss_batched(a).det


def bareiss_rank_batched(a: jax.Array) -> jax.Array:
    return bareiss_batched(a).rank
