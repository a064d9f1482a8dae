"""Pallas TPU kernel: batched Gauss–Jordan with in-place partial pivoting.

The HBM-bound part of batched elimination is the pivot loop re-reading the
matrix every step.  This kernel keeps a whole *tile of matrices* resident
in VMEM for the entire elimination, with the **batch in the lane
dimension**: the working array is ``[N, W, BT]`` (rows × columns ×
batch-tile, BT = 128 lanes), so each elimination step is a dense
``[N, W, BT]`` VPU op in which every lane processes its own matrix — no
serialization over the batch, no HBM traffic between steps.

Pivoting is *in place* (no row swaps): step ``j`` selects, per lane, the
largest-magnitude unpivoted row in column ``j``; if it exceeds the
per-matrix tolerance the row is normalized, column ``j`` is eliminated
from all other rows, and the row is marked pivoted — otherwise the column
is skipped (rank deficiency).  The pivot-row choice is recorded in
``perm``; logical row order is recovered afterwards with one cheap XLA
gather.  Row extraction/writeback use one-hot masks — O(N·W·BT) VPU work
per step, all in VMEM.

Outputs per tile: reduced array, pivot order, and pivot values (det =
parity(perm) × Π pivots; rank = #pivots above tolerance).

Feasible when one lane-aligned tile fits VMEM (``N·W·128·4`` bytes ≤
~8MB ⇒ N ≲ 88 for the augmented inverse layout); ``ops.lu_blocked``
covers larger N.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: lane width of the TPU vector unit — batch tiles are sized to this.
LANES = 128

#: default VMEM budget for one working tile (bytes).  This is the
#: DISPATCH-crossover budget, deliberately conservative: above it the
#: blocked-LU path wins for solve/det/inverse, so ``supports()`` must
#: keep routing those there.
_VMEM_TILE_BUDGET = 8 * 2**20

#: opt-in budget for callers with no blocked alternative (the affine
#: solve / nullspace / eigenspace paths): one tile may use most of the
#: ~128MB VMEM (the per-step temporaries are row-sized).  Reaches
#: n ≈ 400 for [n, n+1] augmented systems.
VMEM_TILE_BUDGET_BIG = 88 * 2**20


def _gj_kernel(a_hbm, tol_ref, out_hbm, perm_ref, piv_ref, work, sems,
               *, n: int, w: int, bt: int):
    """One batch tile: eliminate columns 0..n-1 of the [n, w, bt] array.

    The big array stays in HBM; each program DMAs its lane-tile into the
    single VMEM ``work`` buffer, eliminates there, and DMAs back — one
    working buffer instead of Mosaic's double-buffered in/out blocks
    (which would blow the 16MB VMEM budget at [64, 128, 128] tiles).
    Dynamic indexing goes through the ref; index arrays use one-hot
    selects (Mosaic supports neither on loop-carried values).
    """
    i = pl.program_id(0)
    dtype = work.dtype

    load = pltpu.make_async_copy(
        a_hbm.at[:, :, pl.ds(i * bt, bt)], work, sems.at[0]
    )
    load.start()
    load.wait()

    out_ref = work
    tol = tol_ref[0, :]                                   # [bt]
    rows = lax.broadcasted_iota(jnp.int32, (n, bt), 0)

    def step(j, carry):
        pivoted, perm, pivs = carry                       # pivoted: f32 0/1
        col = out_ref[:, pl.ds(j, 1), :][:, 0, :]         # [n, bt]
        masked = jnp.where(pivoted > 0, -jnp.inf, jnp.abs(col))
        p = jnp.argmax(masked, axis=0)                    # [bt]
        oh_p = (rows == p[None, :]).astype(dtype)         # [n, bt]

        pivot_val = jnp.sum(col * oh_p, axis=0)           # [bt]
        has_pivot = jnp.abs(pivot_val) > tol              # [bt]
        safe = jnp.where(has_pivot, pivot_val, 1.0)
        inv_piv = 1.0 / safe

        arr = out_ref[:]
        # Extract the (unnormalized) pivot row: [w, bt].
        pivot_row = jnp.sum(arr * oh_p[:, None, :], axis=0)

        # One fused update: new[r] = arr[r] − coeff[r]·pivot_row with
        #   coeff[r≠p] = col[r]/piv   (eliminates column j), and
        #   coeff[p]   = 1 − 1/piv    (normalizes the pivot row in place:
        #                              arr[p] − (1−1/piv)·arr[p] = arr[p]/piv).
        act = has_pivot.astype(dtype)                     # [bt]
        coeff = jnp.where(
            oh_p > 0, 1.0 - inv_piv[None, :], col * inv_piv[None, :]
        ) * act[None, :]
        arr = arr - coeff[:, None, :] * pivot_row[None, :, :]
        out_ref[:] = arr

        newly = ((rows == p[None, :]) & has_pivot[None, :]).astype(dtype)
        pivoted = jnp.maximum(pivoted, newly)
        at_j = rows == j                                  # [n, bt]
        perm = jnp.where(at_j, p[None, :].astype(jnp.int32), perm)
        pivs = jnp.where(
            at_j,
            jnp.where(has_pivot, pivot_val, 0.0)[None, :].astype(dtype),
            pivs,
        )
        return pivoted, perm, pivs

    _, perm, pivs = lax.fori_loop(
        0, n, step,
        (
            jnp.zeros((n, bt), dtype),
            jnp.zeros((n, bt), jnp.int32),
            jnp.zeros((n, bt), dtype),
        ),
    )
    perm_ref[:] = perm
    piv_ref[:] = pivs

    store = pltpu.make_async_copy(
        work, out_hbm.at[:, :, pl.ds(i * bt, bt)], sems.at[1]
    )
    store.start()
    store.wait()


class GJResult(NamedTuple):
    reduced: jax.Array   # [B, N, W] fully reduced array (rows in pivot-place)
    perm: jax.Array      # [B, N] perm[j] = physical row holding pivot j
    pivots: jax.Array    # [B, N] pivot values in elimination order (0 if none)


def tile_size(n: int, w: int, budget: Optional[int] = None) -> int:
    """Lane-aligned batch tile for an ``[n, w]`` working array, or 0 if one
    tile doesn't fit the VMEM budget."""
    budget = _VMEM_TILE_BUDGET if budget is None else budget
    if n * w * LANES * 4 <= budget:
        return LANES
    return 0


def supported(
    n: int, w: Optional[int] = None, budget: Optional[int] = None
) -> bool:
    w = w if w is not None else 2 * n
    w = ((w + 7) // 8) * 8  # the wrapper pads to the sublane tile
    return tile_size(n, w, budget) > 0


@functools.partial(jax.jit, static_argnames=("interpret", "budget"))
def _gj_call(
    a_t: jax.Array, tol: jax.Array, interpret: bool,
    budget: Optional[int] = None,
):
    n, w, B = a_t.shape
    bt = tile_size(n, w, budget)
    grid = (B // bt,)
    kernel = functools.partial(_gj_kernel, n=n, w=w, bt=bt)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full array, HBM
            pl.BlockSpec((1, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full array, HBM
            pl.BlockSpec((n, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, w, B), a_t.dtype),
            jax.ShapeDtypeStruct((n, B), jnp.int32),
            jax.ShapeDtypeStruct((n, B), a_t.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, w, bt), a_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(a_t, tol)


def gauss_jordan_tiled(
    a: jax.Array,
    tol: Optional[jax.Array] = None,
    interpret: bool = False,
    budget: Optional[int] = None,
) -> GJResult:
    """Run the kernel over a ``[B, N, W]`` batch (``W >= N``; columns past
    ``N`` are the augmented part, carried along).  ``tol`` is a per-matrix
    pivot threshold ``[B]`` (default 0: any nonzero pivots).  ``budget``
    overrides the VMEM tile budget (``VMEM_TILE_BUDGET_BIG`` for callers
    with no blocked alternative)."""
    B, n, w_in = a.shape
    # The column dimension sits in the sublane axis of the [N, W, BT]
    # working tile: unaligned widths (e.g. [A|b] with w = n+1) fault the
    # DMA slicing on hardware — pad to the f32 tile multiple of 8 with
    # zero columns (carried along untouched by the elimination).
    w = ((w_in + 7) // 8) * 8
    if w != w_in:
        a = jnp.concatenate(
            [a, jnp.zeros((B, n, w - w_in), a.dtype)], axis=2
        )
    bt = tile_size(n, w, budget)
    if bt == 0:
        raise ValueError(
            f"Gauss–Jordan tile [{n}, {w}] exceeds the VMEM budget; "
            f"use the blocked XLA path instead"
        )
    pad = (-B) % bt
    dtype = jnp.result_type(a.dtype, jnp.float32)
    if pad:
        filler = jnp.broadcast_to(
            jnp.eye(n, w, dtype=a.dtype), (pad, n, w)
        )
        a = jnp.concatenate([a, filler], axis=0)
    if tol is None:
        tol = jnp.zeros((a.shape[0],), dtype)
    elif tol.shape[0] != a.shape[0]:
        tol = jnp.concatenate(
            [tol.astype(dtype), jnp.zeros((pad,), dtype)]
        )

    a_t = jnp.transpose(a, (1, 2, 0)).astype(dtype)  # [N, W, Bp]
    reduced, perm, pivs = _gj_call(
        a_t, tol.astype(dtype)[None, :], interpret, budget
    )
    out = GJResult(
        jnp.transpose(reduced, (2, 0, 1))[:B, :, :w_in],
        jnp.transpose(perm, (1, 0))[:B],
        jnp.transpose(pivs, (1, 0))[:B],
    )
    return out


def _perm_parity(perm: jax.Array) -> jax.Array:
    """Sign of the pivot-order permutation via inversion counting."""
    n = perm.shape[-1]
    pi = perm.astype(jnp.int32)
    k_lt_l = jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
    inversions = jnp.sum(
        (pi[..., :, None] > pi[..., None, :]) & k_lt_l, axis=(-2, -1)
    )
    return jnp.where(inversions % 2 == 0, 1.0, -1.0)


def inverse_batched(a: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched inverse via the GJ kernel on ``[A | I]``."""
    B, n, _ = a.shape
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (B, n, n))
    res = gauss_jordan_tiled(
        jnp.concatenate([a, eye], axis=2), interpret=interpret
    )
    right = res.reduced[:, :, n:]
    # Row j of A^{-1} lives in physical row perm[j] (one-hot GEMM: the
    # TPU gather lowering runs ~14x slower — see ops.select).
    from ..select import take_rows_mxu

    return take_rows_mxu(right, res.perm)


def solve_batched(
    a: jax.Array, b: jax.Array, interpret: bool = False
) -> jax.Array:
    """Batched unique-solution solve via GJ on ``[A | b]``."""
    B, n, _ = a.shape
    vector_input = b.ndim == 2
    rhs = b[:, :, None] if vector_input else b
    res = gauss_jordan_tiled(
        jnp.concatenate([a, rhs.astype(a.dtype)], axis=2),
        interpret=interpret,
    )
    right = res.reduced[:, :, n:]
    from ..select import take_rows_mxu

    x = take_rows_mxu(right, res.perm)
    return x[:, :, 0] if vector_input else x


def det_batched(a: jax.Array, interpret: bool = False) -> jax.Array:
    """Batched determinant: parity(pivot order) × Π pivot values."""
    res = gauss_jordan_tiled(a, interpret=interpret)
    return _perm_parity(res.perm) * jnp.prod(res.pivots, axis=-1)


def rank_batched(
    a: jax.Array, tol: Optional[jax.Array] = None, interpret: bool = False
) -> jax.Array:
    """Batched numerical rank (pivots above a per-matrix tolerance).
    Rectangular input is square-padded with zero columns/rows."""
    B, m, n = a.shape
    if m != n:
        size = max(m, n)
        padded = jnp.zeros((B, size, size), a.dtype)
        a = padded.at[:, :m, :n].set(a)
    if tol is None:
        # Gauss-Jordan residues are larger than SVD's, so the threshold is
        # 100x the usual max(m,n)*eps*|A| rank tolerance.
        eps = jnp.finfo(jnp.result_type(a.dtype, jnp.float32)).eps
        tol = (
            max(m, n) * 100 * eps * jnp.max(jnp.abs(a), axis=(1, 2))
        )
    res = gauss_jordan_tiled(
        a, tol=tol, interpret=interpret, budget=VMEM_TILE_BUDGET_BIG
    )
    return jnp.sum(jnp.abs(res.pivots) > 0, axis=-1).astype(jnp.int32)
