"""Blocked rank-revealing Gauss–Jordan for large N (beyond the VMEM
kernel's one-tile limit, n ≳ 420).

The VMEM kernel (``ops.pallas.gj_kernel``) holds the whole working array
on-chip — ideal until one lane tile outgrows VMEM.  This module covers
the large-N regime with a panel/update decomposition whose FLOPs land on
the MXU:

- **Panel eliminate** (``_panel_eliminate``): nb column steps on the
  [B, n, nb] panel at the XLA level — masked-argmax partial pivoting
  among rows not yet consumed by earlier panels, column skipping under a
  per-matrix tolerance (the rank-revealing part), and the same fused
  all-rows update as the kernel (full Gauss–Jordan: entries above AND
  below pivots are eliminated).
- **Trailing update**: the panel's composed row transform in block form.
  With ρ = this panel's pivot rows and ω = all other rows,

      E = [[P_ρ⁻¹, 0], [−P_ω·P_ρ⁻¹, I]],

  so every non-panel column updates as ``T ← T − (P − Sᵀ)·(P_ρ⁻¹·S·T)``
  where ``S`` is the pivot-row selector and ``P`` the pre-elimination
  panel — two [n, nb]×[nb, w] GEMMs per panel plus one nb×nb batched
  inverse.  Row selects/scatters are one-hot matmuls (``ops.select``),
  never gathers.

The output triple (reduced, perm, pivots) matches the VMEM kernel's
``GJResult`` contract exactly — pivot column of step k is k, ``perm``
holds the chosen pivot row, ``pivots`` the pre-normalization pivot value
(0 = skipped column) — so ``ops.solve._extract_from_rref`` serves both
paths (reference ``row_reduce`` semantics, linalg.py:534-630, at batch
scale).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


class BlockedRREF(NamedTuple):
    reduced: jax.Array   # [B, s, w] full RREF
    perm: jax.Array      # [B, s] pivot row per column-step
    pivots: jax.Array    # [B, s] pre-normalization pivot values (0 = skip)


def _panel_eliminate(panel, used, tol):
    """Eliminate the ``nb`` columns of ``panel [B, n, nb]``: pivot search
    by max-|value| among rows with ``used == 0``, skip columns whose best
    candidate is ≤ tol, fused all-rows elimination per step.  Returns the
    reduced panel, updated ``used``, the stacked per-step coefficient
    vectors ``C`` (the elimination multipliers — the trailing update
    replays them), and per-column (pivot_row, pivot_val)."""
    B, n, nb = panel.shape
    dtype = panel.dtype
    rows_i = jnp.arange(n)

    def step(c, carry):
        panel, used, C, perm_p, pivs_p = carry
        col = lax.dynamic_slice_in_dim(panel, c, 1, axis=2)[:, :, 0]
        masked = jnp.where(used > 0, -jnp.inf, jnp.abs(col))
        p = jnp.argmax(masked, axis=1)                    # [B]
        oh = (rows_i[None, :] == p[:, None]).astype(dtype)
        pivot_val = jnp.sum(col * oh, axis=1)             # [B]
        has = jnp.abs(pivot_val) > tol
        inv = 1.0 / jnp.where(has, pivot_val, 1.0)
        pivot_row = jnp.einsum(
            "bn,bnc->bc", oh, panel, precision=_HIGH
        )                                                 # [B, nb]
        # Eliminate with coeff 0 at the pivot row, then write the
        # normalized pivot row exactly.  The fused one-pass form
        # (coeff[p] = 1 − 1/piv) computes row_p/piv as a DIFFERENCE and
        # loses ~eps·|piv| relative accuracy on the pivot row — measured
        # as a flat ~25× residual gap vs the sequential path.
        hasf = has.astype(dtype)
        coeff = jnp.where(oh > 0, 0.0, col * inv[:, None]) * hasf[:, None]
        panel = panel - coeff[:, :, None] * pivot_row[:, None, :]
        norm_row = inv[:, None] * pivot_row                # [B, nb]
        panel = jnp.where(
            (oh * hasf[:, None])[:, :, None] > 0,
            norm_row[:, None, :], panel,
        )
        used = jnp.maximum(used, oh * hasf[:, None])
        C = lax.dynamic_update_slice_in_dim(
            C, coeff[:, :, None], c, axis=2
        )
        perm_p = lax.dynamic_update_slice_in_dim(
            perm_p, p.astype(jnp.int32)[:, None], c, axis=1
        )
        pivs_p = lax.dynamic_update_slice_in_dim(
            pivs_p,
            jnp.where(has, pivot_val, 0.0)[:, None], c, axis=1,
        )
        return panel, used, C, perm_p, pivs_p

    return lax.fori_loop(
        0, nb, step,
        (
            panel, used,
            jnp.zeros((B, n, nb), dtype),
            jnp.zeros((B, nb), jnp.int32),
            jnp.zeros((B, nb), dtype),
        ),
    )


@functools.partial(jax.jit, static_argnames=("nb",))
@f32_matmuls
def rref_blocked(
    a: jax.Array,
    tol: Optional[jax.Array] = None,
    nb: int = 128,
) -> BlockedRREF:
    """Full RREF of ``a [B, s, w]`` (``w ≥ s``; columns past ``s`` are the
    augmented part).  ``tol [B]`` is the pivot threshold (default 0)."""
    B, s, w = a.shape
    dtype = jnp.result_type(a.dtype, jnp.float32)
    W = a.astype(dtype)
    if tol is None:
        tol = jnp.zeros((B,), dtype)
    tol = jnp.broadcast_to(jnp.asarray(tol, dtype), (B,))

    rows_i = jnp.arange(s)
    used = jnp.zeros((B, s), dtype)
    perm = jnp.zeros((B, s), jnp.int32)
    pivs = jnp.zeros((B, s), dtype)
    eye_nb_full = jnp.eye(nb, dtype=dtype)

    for j0 in range(0, s, nb):
        npanel = min(nb, s - j0)
        panel_in = lax.slice_in_dim(W, j0, j0 + npanel, axis=2)
        red_panel, used, C, perm_p, pivs_p = _panel_eliminate(
            panel_in, used, tol
        )
        take = (pivs_p != 0).astype(dtype)                 # [B, np]
        # Pivot-row selector S [B, np, s] (zero rows for skipped cols).
        S = (
            (perm_p[:, :, None] == rows_i[None, None, :]).astype(dtype)
            * take[:, :, None]
        )
        # The panel's composed transform replayed EXACTLY: step c updated
        # every non-pivot row by coeff_c · Y_c and replaced row r_c by
        # inv_c · Y_c, where Y_c is the pivot row's value at its time of
        # use:
        #     Y = L̃⁻¹ · S·T,   L̃ = I + tril(S·C, −1).
        # L̃ is unit-lower-triangular with partial-pivoting-bounded
        # multipliers — the LAPACK-stable form (solving through the
        # pre-elimination pivot block instead was measured to cost
        # ~eps·κ digits).  Pivot rows are then reconstructed as
        # inv·Y − triu(S·C, 1)·Y — a clean product, NOT the fused
        # (1 − 1/piv) difference form, which loses ~eps·|piv| on the
        # pivot row (measured as a flat ~25× residual gap).
        SC = jnp.einsum("bps,bsc->bpc", S, C, precision=_HIGH)
        eye_np = eye_nb_full[:npanel, :npanel]
        Ltil = jnp.tril(SC, -1) + eye_np[None]
        inv_c = jnp.where(take > 0, 1.0 / jnp.where(
            pivs_p != 0, pivs_p, 1.0), 1.0)            # [B, np]
        pivind = S.sum(axis=1)                         # [B, s]

        def update(block):
            if block.shape[2] == 0:
                return block
            T_rho = jnp.einsum(
                "bps,bsw->bpw", S, block, precision=_HIGH
            )
            Y = jax.scipy.linalg.solve_triangular(
                Ltil, T_rho, lower=True, unit_diagonal=True
            )
            elim = block - jnp.einsum(
                "bsp,bpw->bsw", C, Y, precision=_HIGH
            )
            piv_rows = inv_c[:, :, None] * Y - jnp.einsum(
                "bpq,bqw->bpw", jnp.triu(SC, 1), Y, precision=_HIGH
            )
            return (
                elim * (1.0 - pivind)[:, :, None]
                + jnp.einsum(
                    "bps,bpw->bsw", S, piv_rows, precision=_HIGH
                )
            )

        left = update(lax.slice_in_dim(W, 0, j0, axis=2))
        right = update(lax.slice_in_dim(W, j0 + npanel, w, axis=2))
        W = jnp.concatenate([left, red_panel, right], axis=2)
        perm = lax.dynamic_update_slice_in_dim(perm, perm_p, j0, axis=1)
        pivs = lax.dynamic_update_slice_in_dim(pivs, pivs_p, j0, axis=1)

    return BlockedRREF(W, perm, pivs)


def solve_affine_blocked_batched(
    a: jax.Array,
    b: jax.Array,
    tol: Optional[jax.Array] = None,
    nb: int = 128,
):
    """Large-N batched affine solve (possibly singular/rectangular):
    square-pad the augmented system, run the blocked RREF, and reuse the
    kernel path's extraction.  Semantics match
    ``solve_batched(pivot_rule="partial")`` (unique RREF for a given
    pivot-column set)."""
    from .solve import _extract_from_rref, augment_square_padded

    n = a.shape[2]
    aug, tol = augment_square_padded(a, b, tol)
    res = rref_blocked(aug, tol=tol, nb=min(nb, aug.shape[1]))
    return _extract_from_rref(res.reduced, res.perm, res.pivots, n, tol)


def rank_blocked_batched(
    a: jax.Array, tol: Optional[jax.Array] = None, nb: int = 128
) -> jax.Array:
    """Large-N batched numerical rank by blocked pivot counting."""
    B, m, n = a.shape
    dtype = jnp.result_type(a.dtype, jnp.float32)
    s = max(m, n)
    if m != n:
        # pad/concat, not zeros().at[].set — see augment_square_padded
        # (eager scatter compiles can segfault XLA:CPU late in long
        # processes).
        a = jnp.concatenate(
            [a.astype(dtype), jnp.zeros((B, m, s - n), dtype)], axis=2
        )
        a = jnp.concatenate(
            [a, jnp.zeros((B, s - m, s), dtype)], axis=1
        )
    if tol is None:
        eps = jnp.finfo(dtype).eps
        tol = max(m, n) * 100 * eps * jnp.max(jnp.abs(a), axis=(1, 2))
    res = rref_blocked(a.astype(dtype), tol=tol, nb=min(nb, s))
    return jnp.sum(jnp.abs(res.pivots) > 0, axis=-1).astype(jnp.int32)
