"""Distributed factorizations of ONE tall matrix, row-sharded over the
mesh (TSQR-class algorithms).

`distributed_lu` scales a single SQUARE system by column blocks; this
module scales the TALL case — [M, n] with M far beyond one chip's HBM,
n small enough that an [n, n] Gram matrix is replicated cheaply (the
regression/embedding shape class).  Every algorithm here has the same
communication signature: ONE ``psum`` of an [n, n] (or [n, k]) local
product per pass over ICI, all O(M) work local to the shard —
bandwidth-optimal, like TSQR, but expressed as Gram products so the
per-shard compute is pure MXU GEMMs:

- ``distributed_cholqr2``   — shifted CholeskyQR2: Q row-sharded,
  R replicated (numerically a TSQR).
- ``distributed_lstsq``     — least squares through that QR +
  refinement (residual GEMM local, one psum per step).
- ``distributed_polar_tall``/``distributed_svd_tall`` — QDWH polar
  iterations (local triangular solves against the replicated Cholesky
  factor of I + c·Gram) and the SVD from the polar factor + replicated
  eigh; U stays row-sharded end to end.

Everything runs under ``shard_map`` over an existing mesh axis and is
mesh-shape-invariant (tested 1/2/4/8 shards).  No counterpart in the
reference (single-process, SURVEY.md §2.3) — this is the framework's
native scale-out for the tall shape class.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..utils.precision import f32_matmuls
from ..ops.svd import _qdwh_coeffs

_HIGH = jax.lax.Precision.HIGHEST


def _psum_gram(x_loc, y_loc, axis: str):
    """psum of the local [n, k] product xᵀy — the ONE collective."""
    g = jnp.einsum("mi,mk->ik", x_loc, y_loc, precision=_HIGH)
    return lax.psum(g, axis)


def _cholqr2_local(a_loc, axis: str):
    """Shard-local body: shifted CholeskyQR2 of the row-sharded tall
    matrix.  Returns (q_loc, R) with R replicated."""
    M, n = a_loc.shape
    dtype = a_loc.dtype
    eps = float(jnp.finfo(dtype).eps)
    eye = jnp.eye(n, dtype=dtype)

    # Column pre-scaling (global column norms — one psum).
    sq = lax.psum(jnp.sum(a_loc * a_loc, axis=0), axis)
    d = jnp.maximum(jnp.sqrt(sq), 1e-30)
    g = a_loc / d[None, :]

    gram = _psum_gram(g, g, axis)
    # Shifted first pass (as in ops.lstsq): trace of the column-scaled
    # Gram (= n) sets the relative shift scale.
    shift = 16.0 * n * eps
    L1 = jnp.linalg.cholesky(gram + shift * jnp.trace(gram) * eye)
    q = jax.scipy.linalg.solve_triangular(
        L1, g.T, lower=True
    ).T
    gram2 = _psum_gram(q, q, axis)
    L2 = jnp.linalg.cholesky(gram2)
    q = jax.scipy.linalg.solve_triangular(L2, q.T, lower=True).T
    R = jnp.einsum("ji,kj->ik", L2, L1, precision=_HIGH) * d[None, :]
    return q, R


class DistributedQR(NamedTuple):
    q: jax.Array   # [M, n] row-sharded orthonormal
    R: jax.Array   # [n, n] replicated upper-triangular
    ok: jax.Array  # [] all factors finite


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
@f32_matmuls
def distributed_cholqr2(
    a: jax.Array, mesh: Mesh, axis: str = "dp"
) -> DistributedQR:
    """QR of one row-sharded tall [M, n] matrix: a = q @ R."""

    def body(a_loc):
        q, R = _cholqr2_local(a_loc, axis)
        ok = jnp.all(jnp.isfinite(R))
        return q, R, ok

    spec_in = P(axis, None)
    q, R, ok = shard_map(
        body, mesh=mesh,
        in_specs=(spec_in,),
        out_specs=(spec_in, P(None, None), P()),
    )(a.astype(jnp.result_type(a.dtype, jnp.float32)))
    return DistributedQR(q, R, ok)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "ir_steps")
)
@f32_matmuls
def distributed_lstsq(
    a: jax.Array, b: jax.Array, mesh: Mesh,
    axis: str = "dp", ir_steps: int = 1,
) -> jax.Array:
    """Least-squares solution of one row-sharded tall system:
    ``x = argmin ‖a@x − b‖₂`` with ``a [M, n]``, ``b [M]`` or
    ``[M, k]``; x is replicated.  One psum per substitution/refinement
    pass; the residual GEMM is local to each shard."""
    vector_input = b.ndim == 1
    b2 = b[:, None] if vector_input else b
    f32 = jnp.result_type(a.dtype, jnp.float32)

    def body(a_loc, b_loc):
        q, R = _cholqr2_local(a_loc, axis)

        def solve_ls(rhs_loc):
            y = _psum_gram(q, rhs_loc, axis)         # [n, k]
            return jax.scipy.linalg.solve_triangular(
                R, y, lower=False
            )

        x = solve_ls(b_loc)
        for _ in range(ir_steps):
            r_loc = b_loc - jnp.einsum(
                "mi,ik->mk", a_loc, x, precision=_HIGH
            )
            x = x + solve_ls(r_loc)
        return x

    x = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(None, None),
    )(a.astype(f32), b2.astype(f32))
    return x[:, 0] if vector_input else x


class DistributedPolar(NamedTuple):
    up: jax.Array  # [M, n] row-sharded orthogonal polar factor
    H: jax.Array   # [n, n] replicated symmetric PSD factor (a = up@H)
    ok: jax.Array


class DistributedSVD(NamedTuple):
    U: jax.Array   # [M, n] row-sharded
    s: jax.Array   # [n] replicated, descending
    V: jax.Array   # [n, n] replicated
    ok: jax.Array


def _polar_local(a_loc, axis: str, iters: int, l0: float):
    dtype = a_loc.dtype
    n = a_loc.shape[1]
    eye = jnp.eye(n, dtype=dtype)
    # σmax ≤ √(‖A‖₁·‖A‖∞): column sums need a psum, row sums a pmax.
    n1 = jnp.max(lax.psum(jnp.sum(jnp.abs(a_loc), axis=0), axis))
    ninf = lax.pmax(jnp.max(jnp.sum(jnp.abs(a_loc), axis=1)), axis)
    alpha = jnp.maximum(jnp.sqrt(n1 * ninf), 1e-30)
    x = a_loc / alpha
    l = jnp.asarray(l0, dtype)
    for _ in range(iters):
        a_k, b_k, c_k, l = _qdwh_coeffs(l)
        gram = _psum_gram(x, x, axis)
        W = jnp.linalg.cholesky(eye + c_k * gram)
        y = jax.scipy.linalg.solve_triangular(W, x.T, lower=True)
        y = jax.scipy.linalg.solve_triangular(
            W, y, lower=True, trans=1
        ).T
        x = (b_k / c_k) * x + (a_k - b_k / c_k) * y
    H = _psum_gram(x, a_loc, axis)
    H = 0.5 * (H + H.T)
    ok = jnp.all(jnp.isfinite(H))
    return x, H, ok


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "iters"))
@f32_matmuls
def distributed_polar_tall(
    a: jax.Array, mesh: Mesh, axis: str = "dp", iters: int = 8
) -> DistributedPolar:
    """Polar decomposition ``a = up @ H`` of one row-sharded tall
    matrix via QDWH — per iteration: one [n, n] psum, a replicated
    Cholesky, local triangular solves over the shard's rows."""
    up, H, ok = shard_map(
        lambda al: _polar_local(al, axis, iters, 1e-3),
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(None, None), P()),
    )(a.astype(jnp.result_type(a.dtype, jnp.float32)))
    return DistributedPolar(up, H, ok)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "iters"))
@f32_matmuls
def distributed_svd_tall(
    a: jax.Array, mesh: Mesh, axis: str = "dp", iters: int = 8
) -> DistributedSVD:
    """Thin SVD of one row-sharded tall [M, n] matrix: the QDWH polar
    factor stays sharded, the [n, n] eigensolve is replicated, and
    ``U = up @ V`` is a local GEMM per shard."""
    pol = distributed_polar_tall(a, mesh, axis=axis, iters=iters)
    w, V = jnp.linalg.eigh(pol.H)
    s = jnp.maximum(w[::-1], 0.0)
    V = V[:, ::-1]

    def body(up_loc, V_rep):
        return jnp.einsum(
            "mi,ik->mk", up_loc, V_rep, precision=_HIGH
        )

    U = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=P(axis, None),
    )(pol.up, V)
    return DistributedSVD(U, s, V, pol.ok)


class DistributedRSVD(NamedTuple):
    U: jax.Array       # [M, k] row-sharded
    s: jax.Array       # [k] replicated, descending
    V: jax.Array       # [n, k] replicated
    valid: jax.Array   # [k] replicated — False beyond numerical rank
    ok: jax.Array


def _orth_rank_revealing_dist(Y_loc, axis: str):
    """Rank-revealing orthonormalization of a row-sharded sample block
    (the distributed twin of ``ops.randomized._orth_rank_revealing``):
    eigh of the psum'd Gram, dropped directions zeroed, one patched
    Cholesky refinement — all O(M) work local."""
    ell = Y_loc.shape[1]
    dtype = Y_loc.dtype
    eps = float(jnp.finfo(dtype).eps)
    eye = jnp.eye(ell, dtype=dtype)
    gram = _psum_gram(Y_loc, Y_loc, axis)
    w, P = jnp.linalg.eigh(gram)
    wmax = jnp.maximum(w[-1:], jnp.finfo(dtype).tiny)
    valid = w > (4.0 * eps) * wmax
    scale = jnp.where(
        valid, 1.0 / jnp.sqrt(jnp.maximum(w, 1e-30)), 0.0
    )
    Q = jnp.einsum(
        "mi,ik->mk", Y_loc, P * scale[None, :], precision=_HIGH
    )
    validf = valid.astype(dtype)
    g2 = _psum_gram(Q, Q, axis)
    g2 = (
        g2 * validf[:, None] * validf[None, :]
        + (1.0 - validf)[None, :] * eye
    )
    L = jnp.linalg.cholesky(g2)
    Q = jax.scipy.linalg.solve_triangular(
        L, Q.T, lower=True
    ).T * validf[None, :]
    return Q, jnp.all(jnp.isfinite(Q))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "oversample", "power_iters"),
)
@f32_matmuls
def distributed_randomized_svd(
    a: jax.Array, mesh: Mesh, k: int,
    key: jax.Array = None, axis: str = "dp",
    oversample: int = 8, power_iters: int = 2,
) -> DistributedRSVD:
    """Rank-k randomized SVD of ONE row-sharded [M, n] matrix — the
    scale-out composition of ``ops.randomized`` over the mesh: probe
    GEMMs and the final ``U = QŨ`` are local to each shard, every
    orthonormalization/Gram is one [ell, ell] (or [ell, n]) psum, and
    the tiny core SVD is replicated.  For M far beyond one chip's HBM
    with a modest target rank, this touches each shard's rows O(q)
    times and moves only O(ell²+ell·n) bytes over ICI per pass."""
    from ..ops.svd import svd_batched

    M, n = a.shape
    ell = min(k + oversample, n)
    if k > n:
        raise ValueError(f"k={k} exceeds n={n}")
    if key is None:
        key = jax.random.PRNGKey(0)
    f32 = jnp.result_type(a.dtype, jnp.float32)

    def body(a_loc, omega):
        Y = jnp.einsum(
            "mi,ik->mk", a_loc, omega, precision=_HIGH
        )
        ok = jnp.asarray(True)
        for _ in range(power_iters):
            Q, okq = _orth_rank_revealing_dist(Y, axis)
            ok = ok & okq
            Z = _psum_gram(a_loc, Q, axis)            # [n, ell] = AᵀQ
            # Z is fully replicated — reuse the batched rank-revealing
            # orthonormalization (incl. its refinement pass) directly.
            from ..ops.randomized import _orth_rank_revealing

            Qz, okz = _orth_rank_revealing(Z[None])
            ok = ok & okz[0]
            Y = jnp.einsum(
                "mi,ik->mk", a_loc, Qz[0], precision=_HIGH
            )
        Q, okq = _orth_rank_revealing_dist(Y, axis)
        ok = ok & okq
        Bcore = _psum_gram(Q, a_loc, axis)            # [ell, n]
        # every shard's local finiteness must hold — all-reduce so the
        # flag is replicated.
        ok = lax.pmin(ok.astype(jnp.int32), axis) > 0
        return Q, Bcore, ok

    omega = jax.random.normal(key, (n, ell), f32)
    Q, Bcore, ok = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=(P(axis, None), P(None, None), P()),
    )(a.astype(f32), omega)

    core = svd_batched(Bcore[None])
    s = core.s[0, :k]
    V = core.V[0, :, :k]
    Ucore = core.U[0, :, :k]

    def apply_u(q_loc, u_rep):
        return jnp.einsum(
            "mi,ik->mk", q_loc, u_rep, precision=_HIGH
        )

    U = shard_map(
        apply_u, mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=P(axis, None),
    )(Q, Ucore)
    eps = float(jnp.finfo(f32).eps)
    # Rank floor relative to s[0]: scale with the SAMPLE width ell (the
    # Gram/QDWH roundoff that creates spurious tiny values), NOT the
    # row count — an M-scaled threshold goes all-False at M ≳ 1/eps,
    # exactly the huge-M regime this op targets.
    valid = s > (ell * eps) * jnp.maximum(s[:1], 1e-30)
    return DistributedRSVD(U, s, V, valid, ok & core.ok[0])
