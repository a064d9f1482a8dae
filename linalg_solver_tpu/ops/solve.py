"""Batched linear-system solving, nullspaces, inverses and rank on device.

Built on the Gauss–Jordan engine (``ops.rref``).  Results with
data-dependent dimensionality (solution-space dimension, rank) are returned
in padded+masked form so everything stays ``jit``-compatible:

``BatchedAffineSubspace`` is the device analog of the exact path's
``AffineSubspace`` (reference linalg.py:491-522): a particular solution per
batch element plus a padded ``[n, n]`` generator matrix whose first
``dim`` masked columns form the nullspace basis; ``is_consistent`` plays
the role of ``NoSolution``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

from .rref import RREFResult, rref


class BatchedAffineSubspace(NamedTuple):
    """Padded affine solution set ``particular + span(generators[:, :dim])``."""

    particular: jax.Array    # [..., n]
    generators: jax.Array    # [..., n, n]; first `dim` columns valid
    gen_mask: jax.Array      # [..., n] bool; True for valid generator columns
    dim: jax.Array           # [...] int32
    is_consistent: jax.Array  # [...] bool; False => NoSolution

    def basis_list(self, b: int = None):
        """Host helper: valid generator columns as a list of vectors (single
        element if ``b`` is None, else batch element ``b``)."""
        gens = self.generators if b is None else self.generators[b]
        mask = self.gen_mask if b is None else self.gen_mask[b]
        return [gens[:, j] for j in range(gens.shape[1]) if bool(mask[j])]


class InverseResult(NamedTuple):
    inverse: jax.Array       # [..., n, n]
    is_invertible: jax.Array  # [...] bool


def _pivot_onehots(res: RREFResult, n: int) -> tuple[jax.Array, jax.Array]:
    """Per-pivot one-hot encodings: rows_onehot[k] selects pivot row k,
    cols_onehot[k] selects its column.  Invalid (padded) pivots are zero."""
    k_max = res.pivot_rows.shape[-1]
    valid = jnp.arange(k_max) < res.num_pivots
    rows_oh = (
        jax.nn.one_hot(res.pivot_rows, res.reduced.shape[-2], dtype=res.reduced.dtype)
        * valid[:, None]
    )
    cols_oh = (
        jax.nn.one_hot(res.pivot_cols, n, dtype=res.reduced.dtype)
        * valid[:, None]
    )
    return rows_oh, cols_oh


def _extract_affine(res: RREFResult, n: int, tol: float) -> BatchedAffineSubspace:
    """From a reduced ``[A|b]`` (bar at column n), build the padded affine
    solution set."""
    R = res.reduced
    rows_oh, cols_oh = _pivot_onehots(res, n)
    # pivot_col_mask[j] = 1 iff column j is a pivot column.
    pivot_col_mask = cols_oh.sum(axis=0)
    free_mask_f = 1 - pivot_col_mask
    free_mask = free_mask_f > 0.5

    rhs = R[:, n]
    # particular[c_k] = rhs[r_k]:  sum_k cols_oh[k] * (rows_oh[k] @ rhs)
    pivot_rhs = rows_oh @ rhs                    # [k_max]
    particular = cols_oh.T @ pivot_rhs           # [n]

    # Generators: for each free column j, g_j = e_j - sum_k e_{c_k} R[r_k, j].
    pivot_rows_vals = rows_oh @ R[:, :n]         # [k_max, n] rows at pivots
    correction = cols_oh.T @ pivot_rows_vals     # [n, n]
    gen_all = jnp.eye(n, dtype=R.dtype) - correction
    generators = gen_all * free_mask_f[None, :]

    # Consistency: no row that is zero on the left but nonzero at the bar.
    left_zero = (jnp.abs(R[:, :n]) <= tol).all(axis=1)
    inconsistent = (left_zero & (jnp.abs(rhs) > tol)).any()

    dim = free_mask.sum().astype(jnp.int32)
    return BatchedAffineSubspace(
        particular=particular,
        generators=generators,
        gen_mask=free_mask,
        dim=dim,
        is_consistent=~inconsistent,
    )


@functools.partial(jax.jit, static_argnames=("pivot_rule",))
@f32_matmuls
def solve(
    a: jax.Array,
    b: jax.Array,
    tol: Optional[float] = None,
    pivot_rule: str = "first",
) -> BatchedAffineSubspace:
    """Solution set of ``a @ x = b`` for a single ``[m, n]`` system.

    ``tol=None`` uses a data-relative threshold (``100·max(m,n)·eps·max
    |[A|b]|``); pass an explicit value (e.g. 0) for exact-semantics runs
    on integer data."""
    m, n = a.shape
    aug = jnp.concatenate(
        [a, b.reshape(m, 1).astype(a.dtype)], axis=1
    )
    if tol is None:
        eps = jnp.finfo(jnp.result_type(a.dtype, jnp.float32)).eps
        tol = 100 * max(m, n + 1) * eps * jnp.max(jnp.abs(aug))
    res = rref(aug, bar_col=n, tol=tol, pivot_rule=pivot_rule,
               record_events=False)
    return _extract_affine(res, n, tol)


def solve_batched(a, b, tol: Optional[float] = None, pivot_rule: str = "first"):
    """``solve`` over leading batch axes: ``a[B,m,n]``, ``b[B,m]``."""
    return jax.vmap(
        functools.partial(solve, tol=tol, pivot_rule=pivot_rule)
    )(a, b)


@functools.partial(jax.jit, static_argnames=("interpret",))
@f32_matmuls
def solve_affine_gj_batched(
    a: jax.Array,
    b: jax.Array,
    tol: Optional[jax.Array] = None,
    interpret: bool = False,
) -> BatchedAffineSubspace:
    """Affine solution sets for a whole batch via the VMEM-resident
    Gauss–Jordan kernel (``ops.pallas.gj_kernel``) — the fast path for
    possibly-singular/rectangular systems when one lane tile fits VMEM.

    Semantically equal to ``solve_batched(..., pivot_rule="partial")``:
    the in-place kernel considers the same pivot candidates (unpivoted
    rows ≡ rows below the cursor after swaps), and the reduced row
    echelon form — hence particular solution, generator matrix, masks —
    is unique for a given pivot-column set.  Extraction exploits that
    the kernel's pivot COLUMN for step j is j itself, so the one-hot
    algebra of ``_extract_affine`` collapses to row selects and masks.

    ``a: [B, m, n]``, ``b: [B, m]``; ``tol`` is per-matrix ``[B]``
    (default: data-relative ``100·max(m,n+1)·eps·max|[A|b]|``).
    """
    from .pallas.gj_kernel import VMEM_TILE_BUDGET_BIG, gauss_jordan_tiled

    n = a.shape[2]
    aug, tol = augment_square_padded(a, b, tol)
    res = gauss_jordan_tiled(
        aug, tol=tol, interpret=interpret, budget=VMEM_TILE_BUDGET_BIG
    )
    return _extract_from_rref(
        res.reduced, res.perm, res.pivots, n, tol
    )


def augment_square_padded(a, b, tol):
    """Square-padded augmented system ``[A | b]`` with the shared
    data-relative default tolerance (``100·max(m,n+1)·eps·max|[A|b]|``).
    The VMEM-kernel and blocked-RREF paths MUST build identical systems
    and tolerances — dispatch routes between them purely by size, and a
    divergence would change rank decisions across that boundary."""
    B, m, n = a.shape
    s = max(m, n)
    dtype = jnp.result_type(a.dtype, jnp.float32)
    # Built by concatenation, not ``zeros().at[].set``: the eager
    # scatter lowering here reproducibly segfaulted the XLA:CPU JIT
    # late in long test processes (same compile succeeds early in a
    # fresh process); pad/concat is also cheaper.
    top = jnp.concatenate(
        [
            a.astype(dtype),
            jnp.zeros((B, m, s - n), dtype),
            b.astype(dtype)[..., None],
        ],
        axis=2,
    )
    aug = jnp.concatenate(
        [top, jnp.zeros((B, s - m, s + 1), dtype)], axis=1
    )
    if tol is None:
        eps = jnp.finfo(dtype).eps
        tol = (
            100 * max(m, n + 1) * eps
            * jnp.max(jnp.abs(aug), axis=(1, 2))
        )
    return aug, jnp.broadcast_to(jnp.asarray(tol, dtype), (B,))


def _extract_from_rref(R, perm, pivs, n: int, tol):
    """Affine-subspace extraction from a square-padded RREF triple:
    ``R [B, s, s+1]`` reduced (last column = RHS), ``perm [B, s]`` pivot
    row per column-step, ``pivs [B, s]`` pre-normalization pivot value
    (0 = column skipped).  Shared by the VMEM kernel path and the
    blocked large-N path — both emit this contract."""
    from .select import take_rows_mxu

    B, s, _ = R.shape
    dtype = R.dtype
    tol = jnp.broadcast_to(jnp.asarray(tol, dtype), (B,))

    col_mask = (pivs != 0).astype(dtype)             # [B, s] pivot cols
    # Rows of R in pivot order: Rp[k] = R[perm[k]] (pivot col of step k
    # is k, so no column one-hots are needed).
    Rp = take_rows_mxu(R, perm)                      # [B, s, s+1]
    particular = (Rp[:, :, s] * col_mask)[:, :n]

    # Generators: g_j = e_j − Σ_k e_k · Rp[k, j] on free columns j < n.
    correction = col_mask[:, :, None] * Rp[:, :, :s]
    gen_all = jnp.eye(s, dtype=dtype)[None] - correction
    free_mask_f = (1 - col_mask)[:, :n]
    generators = gen_all[:, :n, :n] * free_mask_f[:, None, :]

    # Consistency: a physical row with zero left side but nonzero RHS.
    oh_perm = (
        perm[:, :, None]
        == jnp.arange(s, dtype=perm.dtype)[None, None, :]
    ).astype(dtype)
    pivot_row_mask = jnp.einsum(
        "bks,bk->bs", oh_perm, col_mask
    )                                                # [B, s] physical
    left_zero = (
        jnp.abs(R[:, :, :s]) <= tol[:, None, None]
    ).all(axis=2)
    inconsistent = (
        (pivot_row_mask == 0)
        & left_zero
        & (jnp.abs(R[:, :, s]) > tol[:, None])
    ).any(axis=1)

    dim = free_mask_f.sum(axis=1).astype(jnp.int32)
    return BatchedAffineSubspace(
        particular=particular,
        generators=generators,
        gen_mask=free_mask_f > 0.5,
        dim=dim,
        is_consistent=~inconsistent,
    )


def solve_affine_gj_supported(m: int, n: int) -> bool:
    """One VMEM lane tile must hold the square-padded augmented array
    (big budget: this path has no blocked alternative, so it may claim
    most of VMEM — n up to ~400)."""
    try:
        from .pallas.gj_kernel import VMEM_TILE_BUDGET_BIG, supported

        s = max(m, n)
        return supported(s, s + 1, budget=VMEM_TILE_BUDGET_BIG)
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("pivot_rule",))
def nullspace(
    a: jax.Array, tol: Optional[float] = None, pivot_rule: str = "first"
) -> BatchedAffineSubspace:
    """Kernel of ``a`` as an affine subspace through the origin."""
    m = a.shape[0]
    return solve(a, jnp.zeros((m,), a.dtype), tol=tol, pivot_rule=pivot_rule)


def nullspace_batched(a, tol: Optional[float] = None, pivot_rule: str = "first"):
    return jax.vmap(
        functools.partial(nullspace, tol=tol, pivot_rule=pivot_rule)
    )(a)


@functools.partial(jax.jit, static_argnames=("pivot_rule",))
@f32_matmuls
def inverse(
    a: jax.Array, tol: float = 0.0, pivot_rule: str = "partial"
) -> InverseResult:
    """Inverse via Gauss–Jordan on ``[A | I]``."""
    n = a.shape[0]
    aug = jnp.concatenate([a, jnp.eye(n, dtype=a.dtype)], axis=1)
    res = rref(aug, bar_col=n, tol=tol, pivot_rule=pivot_rule,
               record_events=False)
    inv = res.reduced[:, n:]
    ok = res.num_pivots == n
    return InverseResult(
        jnp.where(ok, inv, jnp.full_like(inv, jnp.nan)), ok
    )


def inverse_batched(a, tol: float = 0.0, pivot_rule: str = "partial"):
    return jax.vmap(
        functools.partial(inverse, tol=tol, pivot_rule=pivot_rule)
    )(a)


@functools.partial(jax.jit, static_argnames=("pivot_rule",))
def rank(
    a: jax.Array, tol: Optional[float] = None, pivot_rule: str = "partial"
) -> jax.Array:
    """Numerical rank = number of pivots found by Gauss–Jordan.

    ``tol=None`` uses the standard data-relative threshold
    ``max(m, n) * eps * max|a|`` (same convention as SVD-based ranks).
    """
    if tol is None:
        # Gauss-Jordan residues are larger than SVD's, so the threshold is
        # 100x the usual max(m,n)*eps*|A| rank tolerance.
        eps = jnp.finfo(jnp.result_type(a.dtype, jnp.float32)).eps
        tol = max(a.shape) * 100 * eps * jnp.max(jnp.abs(a))
    res = rref(a, bar_col=a.shape[1], tol=tol, pivot_rule=pivot_rule,
               record_events=False)
    return res.num_pivots


def rank_batched(a, tol: Optional[float] = None, pivot_rule: str = "partial"):
    return jax.vmap(functools.partial(rank, tol=tol, pivot_rule=pivot_rule))(a)


@functools.partial(jax.jit, static_argnames=("pivot_rule",))
def det_gj(
    a: jax.Array, tol: float = 0.0, pivot_rule: str = "partial"
) -> jax.Array:
    """Determinant as a byproduct of Gauss–Jordan (sign × pivot product).
    The high-throughput path is ``ops.lu.det_lu``."""
    n = a.shape[0]
    res = rref(a, bar_col=n, tol=tol, pivot_rule=pivot_rule,
               record_events=False)
    return res.det


def det_gj_batched(a, tol: float = 0.0, pivot_rule: str = "partial"):
    return jax.vmap(
        functools.partial(det_gj, tol=tol, pivot_rule=pivot_rule)
    )(a)
