"""Batched Gauss–Jordan reduction (RREF) on device, with event recording.

The numeric counterpart of the exact path's ``row_reduce``
(``linalg_solver_tpu.exact.elimination``): same algorithm shape — forward
sweep with pivot search / swap / normalize / eliminate-below, then a
reverse sweep above the pivots — expressed as ``lax.fori_loop`` bodies with
static shapes so XLA compiles one fused program, and ``vmap``-able over a
leading batch axis.

Pivot rules:

- ``"first"`` — first row at-or-below the pivot row whose entry exceeds
  ``tol`` in magnitude.  With ``tol=0`` on integer-valued inputs this
  bit-matches the reference's exact pivot sequence
  (reference linalg.py:548-567).
- ``"partial"`` — largest-magnitude entry at-or-below the pivot row
  (numerically stable; default for float data).

Every structural step is recorded into a fixed-size event buffer
``(code, arg1, arg2)`` so the host trace layer
(``linalg_solver_tpu.trace.events``) can replay the derivation as LaTeX:
``SWAP(r, i)``, ``NORM(r, j)``, ``ELIM_BELOW(j, r)``, ``ELIM_ABOVE(j, r)``.
Step labels S/N/E match the exact path's scheme.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

# Event codes.
EV_SWAP = 0
EV_NORM = 1
EV_ELIM_BELOW = 2
EV_ELIM_ABOVE = 3

EVENT_NAMES = {
    EV_SWAP: "SWAP",
    EV_NORM: "NORM",
    EV_ELIM_BELOW: "ELIM_BELOW",
    EV_ELIM_ABOVE: "ELIM_ABOVE",
}


class RREFResult(NamedTuple):
    """Result of a (batched) Gauss–Jordan reduction.

    All fields are padded to static sizes; ``num_pivots`` / ``num_events``
    give the valid prefixes.
    """

    reduced: jax.Array          # [..., m, n] reduced matrix
    pivot_rows: jax.Array       # [..., k_max] int32, padded with -1
    pivot_cols: jax.Array       # [..., k_max] int32, padded with -1
    num_pivots: jax.Array       # [...] int32
    det: jax.Array              # [...] product of pivots × swap sign
                                #   (determinant of the square left block
                                #    when bar_col == m == that block's n)
    events: jax.Array           # [..., e_max, 3] int32
    num_events: jax.Array       # [...] int32


def _first_nonzero_pivot(col_abs: jax.Array, eligible: jax.Array,
                         tol: jax.Array) -> tuple[jax.Array, jax.Array]:
    mask = (col_abs > tol) & eligible
    return jnp.argmax(mask), mask.any()


def _partial_pivot(col_abs: jax.Array, eligible: jax.Array,
                   tol: jax.Array) -> tuple[jax.Array, jax.Array]:
    masked = jnp.where(eligible, col_abs, -jnp.inf)
    idx = jnp.argmax(masked)
    return idx, masked[idx] > tol


@functools.partial(
    jax.jit, static_argnames=("bar_col", "pivot_rule", "record_events")
)
def rref(
    a: jax.Array,
    bar_col: Optional[int] = None,
    tol: float = 0.0,
    pivot_rule: str = "first",
    record_events: bool = True,
) -> RREFResult:
    """Gauss–Jordan reduce a single ``[m, n]`` matrix.

    ``bar_col`` bounds pivoting (exclusive): columns at/after the bar are
    transformed but never chosen as pivots — ``[A|b]`` uses ``n-1``,
    ``[A|I]`` uses A's width.  Defaults to ``n - 1``.
    """
    m, n = a.shape
    if bar_col is None:
        bar_col = n - 1
    if not 0 <= bar_col <= n:
        raise ValueError(f"bar_col {bar_col} out of range for {n} columns")
    k_max = min(m, bar_col)
    e_max = max(4 * k_max, 1)

    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    dtype = a.dtype
    tol_arr = jnp.asarray(tol, dtype)
    row_idx = jnp.arange(m)

    select_pivot = (
        _first_nonzero_pivot if pivot_rule == "first" else _partial_pivot
    )
    if pivot_rule not in ("first", "partial"):
        raise ValueError(f"unknown pivot rule: {pivot_rule!r}")

    def push_event(events, ec, code, x, y, enabled):
        if not record_events:
            return events, ec
        entry = jnp.array([code, 0, 0], jnp.int32).at[1].set(x).at[2].set(y)
        new_events = lax.dynamic_update_slice(
            events, entry[None, :], (ec, 0)
        )
        events = jnp.where(enabled, new_events, events)
        return events, ec + enabled.astype(jnp.int32)

    def forward_body(j, carry):
        A, r, piv_rows, piv_cols, k, det, events, ec = carry
        col = A[:, j]
        eligible = row_idx >= r
        pivot_row, has_pivot = select_pivot(jnp.abs(col), eligible, tol_arr)

        # --- swap rows r and pivot_row -----------------------------------
        do_swap = has_pivot & (pivot_row != r)
        row_r = A[r]
        row_p = A[pivot_row]
        A_sw = A.at[r].set(row_p).at[pivot_row].set(row_r)
        A = jnp.where(do_swap, A_sw, A)
        det = jnp.where(do_swap, -det, det)
        events, ec = push_event(events, ec, EV_SWAP, r, pivot_row, do_swap)

        # --- normalize pivot row -----------------------------------------
        # Event gating is tolerance-based: float pivots land 1-ulp off
        # exact values (0.99999994 vs the exact path's 1), and the event
        # stream must match the exact path's step sequence.
        pivot_val = A[r, j]
        needs_norm = has_pivot & (jnp.abs(pivot_val - 1) > tol_arr)
        normalized = A[r] / jnp.where(has_pivot, pivot_val, 1)
        A = A.at[r].set(jnp.where(has_pivot, normalized, A[r]))
        det = jnp.where(has_pivot, det * pivot_val, det)
        events, ec = push_event(events, ec, EV_NORM, r, j, needs_norm)

        # --- eliminate below ---------------------------------------------
        factors = jnp.where((row_idx > r) & has_pivot, A[:, j], 0)
        any_elim = (jnp.abs(factors) > tol_arr).any()
        A = A - factors[:, None] * A[r][None, :]
        events, ec = push_event(events, ec, EV_ELIM_BELOW, j, r, any_elim)

        # --- record pivot -------------------------------------------------
        piv_rows = jnp.where(
            has_pivot, piv_rows.at[k].set(r.astype(jnp.int32)), piv_rows
        )
        piv_cols = jnp.where(has_pivot, piv_cols.at[k].set(j), piv_cols)
        k = k + has_pivot.astype(jnp.int32)
        r = r + has_pivot.astype(jnp.int32)
        return A, r, piv_rows, piv_cols, k, det, events, ec

    init = (
        a,
        jnp.int32(0),
        jnp.full((k_max,), -1, jnp.int32),
        jnp.full((k_max,), -1, jnp.int32),
        jnp.int32(0),
        jnp.asarray(1, dtype),
        jnp.zeros((e_max, 3), jnp.int32),
        jnp.int32(0),
    )
    if k_max > 0:
        A, _, piv_rows, piv_cols, k, det, events, ec = lax.fori_loop(
            0, bar_col, forward_body, init
        )
    else:
        A, _, piv_rows, piv_cols, k, det, events, ec = init

    # --- backward sweep: eliminate above pivots, last pivot first --------
    def backward_body(step, carry):
        A, events, ec = carry
        kk = k - 1 - step
        valid = kk >= 0
        kk_safe = jnp.maximum(kk, 0)
        row = piv_rows[kk_safe]
        colj = piv_cols[kk_safe]
        col = A[:, colj]
        factors = jnp.where((row_idx < row) & valid, col, 0)
        any_elim = (jnp.abs(factors) > tol_arr).any()
        A = A - factors[:, None] * A[row][None, :]
        events, ec = push_event(
            events, ec, EV_ELIM_ABOVE, colj, row, any_elim
        )
        return A, events, ec

    if k_max > 0:
        A, events, ec = lax.fori_loop(
            0, k_max, backward_body, (A, events, ec)
        )

    det = jnp.where(k == jnp.minimum(m, bar_col), det, jnp.asarray(0, dtype))
    return RREFResult(A, piv_rows, piv_cols, k, det, events, ec)


def rref_batched(
    a: jax.Array,
    bar_col: Optional[int] = None,
    tol: float = 0.0,
    pivot_rule: str = "first",
    record_events: bool = True,
) -> RREFResult:
    """``rref`` vmapped over a leading batch axis ``[B, m, n]``."""
    fn = functools.partial(
        rref,
        bar_col=bar_col,
        tol=tol,
        pivot_rule=pivot_rule,
        record_events=record_events,
    )
    return jax.vmap(fn)(a)
