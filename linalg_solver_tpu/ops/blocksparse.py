"""Block-sparse operators: TPU-idiomatic sparse matvec + iterative
solves/eigensolves.

TPU sparsity is BLOCK sparsity: scalar-CSR gathers lower to slow
scalar loads, but a matrix whose nonzeros cluster into dense
``bs × bs`` tiles runs every step on the MXU.  Storage is coordinate
block format — ``blocks [nnzb, bs, bs]`` plus block-row/col indices —
and the matvec is three batched contractions:

1. gather block-columns of v by a ONE-HOT ``[nnzb, nb]`` GEMM (the
   framework-wide rule: XLA's TPU gather runs ~14× below the
   equivalent one-hot matmul — ``ops.select``),
2. apply all stored blocks at once (``einsum('kij,bkj->bki')``),
3. scatter-add into block-rows by the transposed one-hot GEMM (the
   segment-sum, also MXU work).

Cost is O(nnzb·bs²) for the block work + O(nnzb·nb·bs) for the one-hot
select/reduce — the latter dominates only when the matrix is extremely
sparse AND huge, exactly where a scalar-gather format would thrash the
TPU anyway.  The operator closes over the standard batched-vector
calling convention, so it composes directly with ``ops.krylov`` (CG /
BiCGSTAB / GMRES), ``ops.arnoldi`` (partial eigenpairs), and
``ops.funm.expm_multiply_matvec``.

No counterpart in the reference: its sparsity machinery (`reference
linalg-helper/src/nonzeros.rs`, `adjacency.rs`) plans exact scalar
elimination; this is the numeric-scale analog.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .krylov import (
    KrylovResult,
    bicgstab_matvec,
    cg_matvec,
    gmres_matvec,
)

_HIGH = jax.lax.Precision.HIGHEST


class BlockSparse(NamedTuple):
    """One ``n × n`` block-sparse operator, ``n = nb · bs``.  Blocks
    are stored in any order; ``(rows[k], cols[k])`` locates
    ``blocks[k]``.  Duplicate coordinates sum (COO semantics)."""

    blocks: jax.Array  # [nnzb, bs, bs]
    rows: jax.Array    # [nnzb] i32 — block-row index
    cols: jax.Array    # [nnzb] i32 — block-col index
    nb: int            # blocks per side (static)

    @property
    def bs(self) -> int:
        return self.blocks.shape[-1]

    @property
    def n(self) -> int:
        return self.nb * self.bs


def blocksparse_from_dense(
    a: jax.Array, bs: int, tol: float = 0.0
) -> BlockSparse:
    """Extract the nonzero ``bs × bs`` tiles of a dense [n, n] matrix
    (host-side constructor: the block PATTERN becomes static shape).
    A block is kept when its max|entry| exceeds ``tol``."""
    import numpy as np

    a = np.asarray(a)
    n = a.shape[0]
    if n % bs:
        raise ValueError(f"n={n} not divisible by block size {bs}")
    nb = n // bs
    tiles = a.reshape(nb, bs, nb, bs).transpose(0, 2, 1, 3)
    mag = np.abs(tiles).max(axis=(2, 3))
    rows, cols = np.nonzero(mag > tol)
    return BlockSparse(
        jnp.asarray(tiles[rows, cols].astype(np.float32)),
        jnp.asarray(rows.astype(np.int32)),
        jnp.asarray(cols.astype(np.int32)),
        nb,
    )


def blocksparse_to_dense(op: BlockSparse) -> jax.Array:
    """Materialize [n, n] (tests / small fallback)."""
    nb, bs = op.nb, op.bs
    oh_r = (op.rows[:, None] == jnp.arange(nb)[None, :]).astype(
        op.blocks.dtype
    )
    oh_c = (op.cols[:, None] == jnp.arange(nb)[None, :]).astype(
        op.blocks.dtype
    )
    tiles = jnp.einsum(
        "kr,kc,kij->ricj", oh_r, oh_c, op.blocks, precision=_HIGH
    )
    return tiles.reshape(nb * bs, nb * bs)


def make_blocksparse_matvec(op: BlockSparse):
    """Batched matvec closure ``v [B, n] → A v [B, n]`` — feed to the
    matrix-free Krylov/Arnoldi/expmv entry points."""
    nb, bs = op.nb, op.bs
    oh_c = (op.cols[:, None] == jnp.arange(nb)[None, :]).astype(
        op.blocks.dtype
    )                                                  # [nnzb, nb]
    oh_r = (op.rows[:, None] == jnp.arange(nb)[None, :]).astype(
        op.blocks.dtype
    )

    def matvec(v):
        B = v.shape[0]
        vb = v.reshape(B, nb, bs)
        vc = jnp.einsum("kn,bnj->bkj", oh_c, vb, precision=_HIGH)
        yk = jnp.einsum(
            "kij,bkj->bki", op.blocks, vc, precision=_HIGH
        )
        yb = jnp.einsum("kn,bki->bni", oh_r, yk, precision=_HIGH)
        return yb.reshape(B, nb * bs).astype(v.dtype)

    return matvec


def _jacobi_from_blocks(op: BlockSparse):
    """Replicated 1/diag preconditioner from the diagonal blocks."""
    nb, bs = op.nb, op.bs
    is_diag = (op.rows == op.cols).astype(op.blocks.dtype)
    oh_r = (op.rows[:, None] == jnp.arange(nb)[None, :]).astype(
        op.blocks.dtype
    )
    bdiag = jnp.einsum(
        "kii->ki", op.blocks
    ) * is_diag[:, None]                               # [nnzb, bs]
    d = jnp.einsum(
        "kn,ki->ni", oh_r, bdiag, precision=_HIGH
    ).reshape(nb * bs)
    dinv = 1.0 / jnp.maximum(
        jnp.abs(d), jnp.finfo(op.blocks.dtype).eps
    )
    return lambda v: dinv[None, :] * v


def blocksparse_solve(
    op: BlockSparse,
    b: jax.Array,
    method: str = "gmres",
    tol=None,
    precond: bool = True,
    **kw,
) -> KrylovResult:
    """Iterative solve ``A x = b`` (``b [B, n]``) on a block-sparse
    operator: ``method`` ∈ cg (SPD) / bicgstab / gmres, Jacobi
    preconditioning from the diagonal blocks.  Same honesty contract
    as ``ops.krylov``."""
    mv = make_blocksparse_matvec(op)
    M = _jacobi_from_blocks(op) if precond else None
    if method == "cg":
        return cg_matvec(mv, b, tol=tol, precond=M, **kw)
    if method == "bicgstab":
        return bicgstab_matvec(mv, b, tol=tol, precond=M, **kw)
    if method == "gmres":
        return gmres_matvec(mv, b, tol=tol, precond=M, **kw)
    raise ValueError(f"method={method!r} not in cg/bicgstab/gmres")


def blocksparse_eigs(
    op: BlockSparse,
    k: int,
    batch: int = 1,
    which: str = "LM",
    **kw,
):
    """k exterior eigenpairs of the block-sparse operator via the
    matrix-free Krylov–Schur eigensolver (``batch`` independent
    Krylov runs share the compile)."""
    from .arnoldi import eigs_arnoldi_matvec

    mv = make_blocksparse_matvec(op)
    v0 = jax.random.normal(
        jax.random.PRNGKey(0), (batch, op.n), op.blocks.dtype
    )
    return eigs_arnoldi_matvec(mv, v0, k, which=which, **kw)
