"""Blocked, batch-vectorized LU with partial pivoting — the MXU path.

Unlike ``ops.lu`` (per-matrix ``fori_loop``, vmapped), this implementation
is written once over the whole batch so every step is a wide vector/matrix
op:

- the N sequential pivot steps touch only the current ``[B, N, NB]``
  panel (pivot search, row swap, scale, rank-1 update — VPU work
  vectorized across the batch),
- row swaps outside the panel are deferred LAPACK-style and applied as
  ONE batched gather per panel,
- the U block is produced with a divide-and-conquer unit-triangular
  inverse (log₂ NB batched matmuls) and the trailing update is a single
  ``[B, N-k, NB] @ [B, NB, N-k]`` batched GEMM — the 2/3·N³ FLOPs land on
  the MXU.

Solve uses the same block structure: two triangular-block substitutions
built from the cached panel inverses.

This is the performance backbone behind ``dispatch.solve_batched`` for
square batches; ``ops.pallas.lu_kernel`` moves the panel loop into VMEM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls
from jax import lax


class BlockedLUResult(NamedTuple):
    lu: jax.Array     # [B, N, N] packed L\U (post-pivoting)
    perm: jax.Array   # [B, N] row i of (PA) = row perm[i] of A
    sign: jax.Array   # [B]
    ok: jax.Array     # [B]


def invert_unit_lower(L: jax.Array) -> jax.Array:
    """Inverse of a batched unit-lower-triangular ``[..., n, n]`` matrix by
    divide and conquer: log₂(n) levels of batched matmuls (MXU work).

    ``[[A, 0], [C, B]]⁻¹ = [[A⁻¹, 0], [−B⁻¹ C A⁻¹, B⁻¹]]``.
    """
    n = L.shape[-1]
    if n == 1:
        return jnp.ones_like(L)
    h = n // 2
    A = L[..., :h, :h]
    C = L[..., h:, :h]
    Bm = L[..., h:, h:]
    Ai = invert_unit_lower(A)
    Bi = invert_unit_lower(Bm)
    top = jnp.concatenate(
        [Ai, jnp.zeros_like(L[..., :h, h:])], axis=-1
    )
    bottom = jnp.concatenate([-(Bi @ (C @ Ai)), Bi], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def invert_upper(U: jax.Array) -> jax.Array:
    """Inverse of a batched upper-triangular matrix (non-unit diagonal)."""
    n = U.shape[-1]
    if n == 1:
        return 1.0 / U
    h = n // 2
    A = U[..., :h, :h]
    Bm = U[..., :h, h:]
    C = U[..., h:, h:]
    Ai = invert_upper(A)
    Ci = invert_upper(C)
    top = jnp.concatenate([Ai, -(Ai @ (Bm @ Ci))], axis=-1)
    bottom = jnp.concatenate(
        [jnp.zeros_like(U[..., h:, :h]), Ci], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


def _panel_factor(panel, k0, nb, row_idx, tol):
    """Factor one ``[B, N, nb]`` panel (global column range [k0, k0+nb)).

    Returns the factored panel, the per-step pivot rows ``[nb, B]``, the
    panel-local permutation ``[B, N]`` (for the deferred out-of-panel
    swaps), the sign update and the ok mask.
    """
    Bsz, N, _ = panel.shape

    def step(jj, carry):
        panel, local_perm, sign, ok = carry
        j = k0 + jj  # global pivot row for this panel column
        col = lax.dynamic_slice_in_dim(panel, jj, 1, axis=2)[:, :, 0]
        eligible = row_idx[None, :] >= j
        masked = jnp.where(eligible, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(masked, axis=1)                      # [B]
        has_pivot = jnp.take_along_axis(
            masked, p[:, None], axis=1
        )[:, 0] > tol

        # Swap rows j and p inside the panel (one-hot row exchange, no
        # gather) + record the exchange in local_perm.
        do_swap = has_pivot & (p != j)
        rows_j = jnp.full((Bsz,), j, jnp.int32)
        swap_src = jnp.where(do_swap, p, rows_j).astype(jnp.int32)
        onehot_j = (row_idx[None, :] == rows_j[:, None]).astype(panel.dtype)
        onehot_p = (row_idx[None, :] == swap_src[:, None]).astype(panel.dtype)
        row_j_vals = jnp.einsum("bn,bnk->bk", onehot_j, panel)
        row_p_vals = jnp.einsum("bn,bnk->bk", onehot_p, panel)
        delta = (row_j_vals - row_p_vals)[:, None, :]
        panel = panel - onehot_j[:, :, None] * delta + onehot_p[:, :, None] * delta

        lp_j = jnp.take_along_axis(local_perm, rows_j[:, None], 1)[:, 0]
        lp_p = jnp.take_along_axis(local_perm, swap_src[:, None], 1)[:, 0]
        oh_j = row_idx[None, :] == rows_j[:, None]
        oh_p = row_idx[None, :] == swap_src[:, None]
        local_perm = jnp.where(oh_j, lp_p[:, None], local_perm)
        local_perm = jnp.where(
            oh_p & do_swap[:, None], lp_j[:, None], local_perm
        )
        sign = jnp.where(do_swap, -sign, sign)

        # Scale below-diagonal entries and rank-1 update the panel.
        col = lax.dynamic_slice_in_dim(panel, jj, 1, axis=2)[:, :, 0]
        pivot_val = jnp.einsum("bn,bn->b", onehot_j, col)
        safe = jnp.where(has_pivot, pivot_val, 1.0)
        below = row_idx[None, :] > j
        factors = jnp.where(
            below & has_pivot[:, None], col / safe[:, None], 0.0
        )
        pivot_row = jnp.einsum("bn,bnk->bk", onehot_j, panel)
        cols_right = (
            jnp.arange(panel.shape[2])[None, None, :] > jj
        ).astype(panel.dtype)
        panel = panel - factors[:, :, None] * pivot_row[:, None, :] * cols_right
        # Write the multipliers into panel column jj (below the diagonal).
        col_onehot = (
            jnp.arange(panel.shape[2])[None, None, :] == jj
        ).astype(panel.dtype)
        new_col = jnp.where(below, factors, col)
        panel = panel * (1 - col_onehot) + new_col[:, :, None] * col_onehot

        ok = ok & has_pivot
        return panel, local_perm, sign, ok

    local_perm0 = jnp.broadcast_to(
        row_idx[None, :], (Bsz, N)
    ).astype(jnp.int32)
    sign0 = jnp.ones((Bsz,), panel.dtype)
    ok0 = jnp.ones((Bsz,), bool)
    return lax.fori_loop(
        0, nb, step, (panel, local_perm0, sign0, ok0)
    )


def _panel_factor_two_level(panel, nb, nbi, tol):
    """Two-level panel factorization: the per-column pivot loop runs over
    ``nbi``-wide inner panels (halving the loop-carried slab), with inner
    trailing updates propagating into the rest of the ``nb``-wide panel as
    GEMMs.  Equivalent to ``_panel_factor(panel, 0, nb, ...)``."""
    Bsz, M, _ = panel.shape
    dtype = panel.dtype
    perm_total = jnp.broadcast_to(
        jnp.arange(M)[None, :], (Bsz, M)
    ).astype(jnp.int32)
    sign = jnp.ones((Bsz,), dtype)
    ok = jnp.ones((Bsz,), bool)

    for c0 in range(0, nb, nbi):
        sub = panel[:, c0:, c0:c0 + nbi]
        sub, lperm, psign, pok = _panel_factor(
            sub, 0, nbi, jnp.arange(M - c0), tol
        )
        sign = sign * psign
        ok = ok & pok

        lower = jnp.take_along_axis(
            panel[:, c0:, :], lperm[:, :, None], axis=1
        )
        lower = jnp.concatenate(
            [lower[:, :, :c0], sub, lower[:, :, c0 + nbi:]], axis=2
        )
        pt_lower = jnp.take_along_axis(perm_total[:, c0:], lperm, axis=1)
        perm_total = jnp.concatenate(
            [perm_total[:, :c0], pt_lower], axis=1
        )

        if c0 + nbi < nb:
            L11 = jnp.tril(sub[:, :nbi, :], -1) + jnp.eye(nbi, dtype=dtype)
            L21 = sub[:, nbi:, :]
            A12 = lower[:, :nbi, c0 + nbi:]
            A22 = lower[:, nbi:, c0 + nbi:]
            U12 = invert_unit_lower(L11) @ A12
            A22 = A22 - L21 @ U12
            lower = jnp.concatenate(
                [lower[:, :, :c0 + nbi],
                 jnp.concatenate([U12, A22], axis=1)], axis=2
            )
        panel = jnp.concatenate([panel[:, :c0, :], lower], axis=1)

    return panel, perm_total, sign, ok


@functools.partial(
    jax.jit, static_argnames=("nb", "panel_backend", "interpret")
)
@f32_matmuls
def blocked_lu_batched(
    a: jax.Array, nb: int = 128, tol: float = 0.0,
    panel_backend: str = "xla", interpret: bool = False,
) -> BlockedLUResult:
    """Blocked batched LU: ``P A = L U`` for every matrix in ``[B, N, N]``.

    ``panel_backend="pallas"`` runs the panel pivot loop in a VMEM-resident
    Pallas kernel (``ops.pallas.lu_panel_kernel``); the trailing GEMMs are
    identical either way.
    """
    Bsz, N, _ = a.shape
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    nb = min(nb, N)
    assert N % nb == 0, f"N={N} must be divisible by nb={nb}"
    row_idx = jnp.arange(N)
    tol_arr = jnp.asarray(tol, a.dtype)

    A = a
    perm = jnp.broadcast_to(row_idx[None, :], (Bsz, N)).astype(jnp.int32)
    sign = jnp.ones((Bsz,), a.dtype)
    ok = jnp.ones((Bsz,), bool)

    for k0 in range(0, N, nb):
        # The panel phase only ever touches rows >= k0 (rows above hold
        # finished U entries), so slice them off: halves the panel-loop
        # and gather traffic on average.
        sub_rows = N - k0
        panel = A[:, k0:, k0:k0 + nb]          # [B, N-k0, nb]
        if panel_backend == "pallas":
            from .pallas.lu_panel_kernel import panel_factor

            pres = panel_factor(panel, 0, nb, interpret=interpret)
            panel, local_perm = pres.panel, pres.local_perm
            psign, pok = pres.sign, pres.ok
        elif panel_backend == "two_level" and nb >= 32:
            panel, local_perm, psign, pok = _panel_factor_two_level(
                panel, nb, nb // 2, tol_arr
            )
        else:
            panel, local_perm, psign, pok = _panel_factor(
                panel, 0, nb, jnp.arange(sub_rows), tol_arr
            )
        sign = sign * psign
        ok = ok & pok

        # Deferred swaps: apply the panel's permutation to the remaining
        # rows of everything OUTSIDE the panel columns in one batched
        # gather, then write the factored panel back.
        lower = jnp.take_along_axis(
            A[:, k0:, :], local_perm[:, :, None], axis=1
        )
        lower = jnp.concatenate(
            [lower[:, :, :k0], panel, lower[:, :, k0 + nb:]], axis=2
        )
        perm_lower = jnp.take_along_axis(perm[:, k0:], local_perm, axis=1)
        perm = jnp.concatenate([perm[:, :k0], perm_lower], axis=1)

        if k0 + nb < N:
            # U block: U12 = L11^{-1} A12 ; trailing: A22 -= L21 U12.
            L11 = jnp.tril(panel[:, :nb, :], -1) + jnp.eye(
                nb, dtype=A.dtype
            )
            L21 = panel[:, nb:, :]
            A12 = lower[:, :nb, k0 + nb:]
            A22 = lower[:, nb:, k0 + nb:]
            U12 = invert_unit_lower(L11) @ A12
            A22 = A22 - L21 @ U12
            lower = jnp.concatenate(
                [lower[:, :, :k0 + nb],
                 jnp.concatenate([U12, A22], axis=1)], axis=2
            )
        A = jnp.concatenate([A[:, :k0, :], lower], axis=1)

    return BlockedLUResult(A, perm, sign, ok)


@functools.partial(jax.jit, static_argnames=("nb",))
@f32_matmuls
def blocked_solve_batched(
    a: jax.Array, b: jax.Array, nb: int = 128
) -> jax.Array:
    """Factor + solve ``a @ x = b`` for a batch (``b: [B, N]`` or
    ``[B, N, K]``), all MXU-blocked."""
    res = blocked_lu_batched(a, nb=nb)
    return blocked_lu_solve(res, b)


@functools.partial(jax.jit, static_argnames=("nb",))
@f32_matmuls
def blocked_lu_solve(
    res: BlockedLUResult, b: jax.Array, nb: int = 64
) -> jax.Array:
    """Block forward/backward substitution: only the nb×nb diagonal blocks
    are inverted (divide-and-conquer); off-diagonal contributions are
    batched GEMMs.  Far cheaper than inverting the full triangulars."""
    lu, perm = res.lu, res.perm
    N = lu.shape[-1]
    nb = min(nb, N)
    vector_input = b.ndim == 2
    if vector_input:
        b = b[:, :, None]
    b = b.astype(lu.dtype)
    pb = jnp.take_along_axis(b, perm[:, :, None], axis=1)

    if N % nb:
        nb = N  # fallback: single block

    m = N // nb
    eye = jnp.eye(nb, dtype=lu.dtype)

    # Forward: L y = P b (unit lower triangular).
    ys = []
    for i in range(m):
        ri = slice(i * nb, (i + 1) * nb)
        rhs = pb[:, ri]
        for j in range(i):
            rhs = rhs - lu[:, ri, j * nb:(j + 1) * nb] @ ys[j]
        L_ii = jnp.tril(lu[:, ri, ri], -1) + eye
        ys.append(invert_unit_lower(L_ii) @ rhs)

    # Backward: U x = y.
    xs: list = [None] * m
    for i in reversed(range(m)):
        ri = slice(i * nb, (i + 1) * nb)
        rhs = ys[i]
        for j in range(i + 1, m):
            rhs = rhs - lu[:, ri, j * nb:(j + 1) * nb] @ xs[j]
        U_ii = jnp.triu(lu[:, ri, ri])
        xs[i] = invert_upper(U_ii) @ rhs

    x = jnp.concatenate(xs, axis=1)
    return x[:, :, 0] if vector_input else x


@functools.partial(jax.jit, static_argnames=("nb",))
@f32_matmuls
def blocked_inverse_batched(a: jax.Array, nb: int = 64) -> jax.Array:
    """Batched inverse: LU factor + block substitution against I."""
    B, N, _ = a.shape
    res = blocked_lu_batched(a, nb=nb)
    eye = jnp.broadcast_to(jnp.eye(N, dtype=res.lu.dtype), (B, N, N))
    return blocked_lu_solve(res, eye, nb=nb)


@jax.jit
def blocked_det_batched(a: jax.Array) -> jax.Array:
    res = blocked_lu_batched(a)
    diag = jnp.diagonal(res.lu, axis1=-2, axis2=-1)
    return jnp.where(res.ok, res.sign * jnp.prod(diag, axis=-1), 0.0)
