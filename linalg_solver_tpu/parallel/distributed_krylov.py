"""Distributed Krylov solves of ONE huge square system, row-sharded.

The shape class between ``distributed_lu`` (dense direct, column-block-
cyclic) and the batched iterative family (``ops.krylov``): one [N, N]
operator too large for a chip, solved iteratively with its rows sharded
over a mesh axis.  The design keeps every Krylov VECTOR replicated and
only the MATRIX sharded, which makes the communication signature
minimal and fixed:

- matvec: local ``[N/p, N] × [N]`` GEMV (all MXU work), then ONE
  ``all_gather`` of the [N/p] pieces over ICI per operator application;
- every dot product/axpy runs redundantly on replicated vectors —
  zero collectives;
- so CG costs exactly one all_gather per iteration, BiCGSTAB two,
  GMRES(m) one per Arnoldi step.

The iteration bodies are NOT reimplemented: the ``ops.krylov``
matrix-free cores run unchanged inside ``shard_map`` with the
collective folded into the matvec closure — same per-lane freezing,
same honesty contract (true-residual ``converged`` flags).

No counterpart in the reference (single-process, SURVEY.md §2.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.krylov import (
    KrylovResult,
    bicgstab_matvec,
    cg_matvec,
    gmres_matvec,
)
from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


def _local_matvec(a_loc, axis: str):
    """Row-sharded operator application on a replicated [1, N] vector:
    local GEMV + one tiled all_gather."""

    def mv(v):
        y_loc = jnp.einsum("mn,n->m", a_loc, v[0], precision=_HIGH)
        return lax.all_gather(y_loc, axis, tiled=True)[None]

    return mv


def _local_jacobi(a_loc, axis: str):
    """Replicated 1/diag(A) from the sharded rows (one gather, once)."""
    rows = a_loc.shape[0]
    off = lax.axis_index(axis) * rows
    i = jnp.arange(rows)
    d_loc = a_loc[i, off + i]
    d = lax.all_gather(d_loc, axis, tiled=True)
    dinv = 1.0 / jnp.maximum(jnp.abs(d), jnp.finfo(a_loc.dtype).tiny)
    return lambda v: dinv[None] * v


def _run(core, a, b, mesh, axis, precond, **kw):
    f32 = jnp.result_type(a.dtype, jnp.float32)

    def body(a_loc, b_full):
        mv = _local_matvec(a_loc, axis)
        M = _local_jacobi(a_loc, axis) if precond else None
        res = core(mv, b_full[None], precond=M, **kw)
        return (
            res.x[0], res.converged[0], res.iters, res.resnorm[0]
        )

    x, conv, iters, rn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(None)),
        out_specs=(P(None), P(), P(), P()),
        check_vma=False,
    )(a.astype(f32), b.astype(f32))
    return KrylovResult(x, conv, iters, rn)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "tol", "max_iters", "precond"),
)
@f32_matmuls
def distributed_cg(
    a: jax.Array, b: jax.Array, mesh: Mesh, axis: str = "dp",
    tol=None, max_iters: int = 0, precond: bool = True,
) -> KrylovResult:
    """CG on ONE row-sharded SPD [N, N] system (x, b replicated;
    N must divide by the mesh axis size).  One all_gather/iteration."""
    return _run(cg_matvec, a, b, mesh, axis, precond,
                tol=tol, max_iters=max_iters)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "tol", "max_iters", "precond"),
)
@f32_matmuls
def distributed_bicgstab(
    a: jax.Array, b: jax.Array, mesh: Mesh, axis: str = "dp",
    tol=None, max_iters: int = 0, precond: bool = True,
) -> KrylovResult:
    """BiCGSTAB on ONE row-sharded GENERAL square system."""
    return _run(bicgstab_matvec, a, b, mesh, axis, precond,
                tol=tol, max_iters=max_iters)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "tol", "restart", "max_restarts", "precond",
    ),
)
@f32_matmuls
def distributed_gmres(
    a: jax.Array, b: jax.Array, mesh: Mesh, axis: str = "dp",
    tol=None, restart: int = 32, max_restarts: int = 16,
    precond: bool = True,
) -> KrylovResult:
    """GMRES(m) on ONE row-sharded GENERAL square system."""
    return _run(gmres_matvec, a, b, mesh, axis, precond,
                tol=tol, restart=restart, max_restarts=max_restarts)
