"""Blocked Pallas TPU kernels.

- ``gj_kernel``       — VMEM-resident batched Gauss–Jordan (batch in the
  lane dimension) for small/medium N: inverse, solve, det, rank.
- ``lu_panel_kernel`` — VMEM-resident LU panel factorization plugged into
  the blocked XLA LU for large N.

``supports(op)`` / ``is_supported()`` are the dispatch hooks used by
``ops.dispatch``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import gj_kernel
from .gj_kernel import gauss_jordan_tiled, GJResult


def is_supported() -> bool:
    """Pallas TPU kernels need a TPU backend (tests use interpret mode
    explicitly)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


_OPS = {"inverse", "solve", "det", "rank"}

#: augmented width the GJ kernel needs per op
_WIDTH = {
    "inverse": lambda n: 2 * n,
    "solve": lambda n: n + 1,
    "det": lambda n: n,
    "rank": lambda n: n,
}

#: per-op VMEM tile budget.  solve/det/inverse keep the conservative
#: dispatch-crossover budget (the blocked-LU path wins above it); rank
#: has NO rank-revealing blocked alternative (LU-diagonal counting breaks
#: on zero pivots mid-factorization), so it may claim the big budget.
_BUDGET = {"rank": gj_kernel.VMEM_TILE_BUDGET_BIG}


def supports(op: str, n: int | None = None) -> bool:
    if op not in _OPS:
        return False
    if n is None:
        return True
    if op == "inverse":
        # the fused RBT kernel reaches n=180 (its [n, 2n, 128] work +
        # copies budget), well past the pivoted GJ tile: at n=128 it
        # measured 0.21 ms/128 matrices vs the phase-structured path's
        # ~1.2 ms (round-4 chip probe)
        from . import inv_rbt_kernel

        if inv_rbt_kernel.supported(n):
            return True
    return gj_kernel.supported(n, _WIDTH[op](n), budget=_BUDGET.get(op))


def inverse_batched(a: jax.Array) -> jax.Array:
    """Small-N batched inverse: the fused RBT no-pivot kernel where the
    shape supports it (in-kernel butterflies + span-restricted GJ +
    probe-gated pivoted rescue — 2.27M vs the pivoted kernel's 0.90M
    64x64 matrices/s on chip, round-3 bench examples/bench_r3_inv.py),
    else the deterministic pivoted GJ kernel."""
    from . import inv_rbt_kernel

    if inv_rbt_kernel.supported(a.shape[-1]):
        return inv_rbt_kernel.inverse_rbt_fused_batched(a)
    return gj_kernel.inverse_batched(a)


def solve_batched(a: jax.Array, b: jax.Array) -> jax.Array:
    return gj_kernel.solve_batched(a, b)


def det_batched(a: jax.Array) -> jax.Array:
    return gj_kernel.det_batched(a)


def rank_batched(a: jax.Array, tol=None) -> jax.Array:
    return gj_kernel.rank_batched(a, tol=tol)
