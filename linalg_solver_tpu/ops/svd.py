"""Batched SVD via QDWH polar decomposition + symmetric eigensolve.

The reference has no SVD (its scalar domain is exact, where rank comes
from elimination); a complete floating-point framework needs one — it
backs the robust rank decision, the pseudoinverse, and the 2-norm
condition number.  TPU-first algorithm choice: NO bidiagonalization
(sequential Householder + QR iteration — the classic CPU route is a
scalar-loop worst case for XLA).  Instead:

1. **QDWH** (dynamically-weighted Halley, Nakatsukasa–Bai–Gygi):
   the polar factor ``A = U_p H`` computed by a fixed, jit-static
   number of rational iterations ``X ← X(aI + bXᵀX)(I + cXᵀX)⁻¹`` —
   each iteration is one batched Gram GEMM + one batched Cholesky +
   two triangular solves, all MXU work, cubically convergent.
2. **eigh** of the (symmetric PSD) ``H = U_pᵀA``: ``H = VΣVᵀ`` via the
   direct symmetric solver (``jnp.linalg.eigh`` under this module's
   f32 precision contract; H is explicitly symmetrized first), then
   ``U = U_p V``.

This is the same family XLA uses internally for ``jnp.linalg.svd`` on
TPU, but under this framework's f32 matmul-precision contract (the
default one-pass-bf16 contraction corrupts Gram matrices at ~1e-3
relative — see ``utils.precision``) and batch-vectorized end to end.

f32 conditioning contract: the Cholesky-variant iteration factors
``Z = I + c·XᵀX`` whose condition is ~``c``; the weighting schedule is
started from a clamped lower bound ``l₀ = 1e-3`` so the first factor
stays within f32 Cholesky range, and the extra iterations the clamp
costs are covered by the fixed ``iters=8`` (singular values below
``1e-3·σmax`` converge a step or two later; κ ≳ 1e5 input is beyond
any f32 SVD).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


class SVDResult(NamedTuple):
    """Thin SVD ``a = U @ diag(s) @ Vᵀ`` with ``s`` descending."""

    U: jax.Array   # [B, m, k]  (k = min(m, n))
    s: jax.Array   # [B, k]     descending, ≥ 0
    V: jax.Array   # [B, n, k]
    ok: jax.Array  # [B]        iteration stayed finite


def _qdwh_coeffs(l):
    """Per-lane dynamic Halley weights (a, b, c) and the updated lower
    bound, from the current σ-interval lower bound ``l`` ∈ (0, 1]."""
    l2 = l * l
    d = jnp.cbrt(4.0 * (1.0 - l2) / (l2 * l2))
    h = jnp.sqrt(1.0 + d)
    inner = 8.0 - 4.0 * d + 8.0 * (2.0 - l2) / (l2 * h)
    a = h + 0.5 * jnp.sqrt(jnp.maximum(inner, 0.0))
    b = (a - 1.0) ** 2 / 4.0
    c = a + b - 1.0
    l_new = l * (a + b * l2) / (1.0 + c * l2)
    return a, b, c, jnp.minimum(l_new, 1.0)


def _qdwh_polar(x: jax.Array, l0: float, iters: int):
    """Orthogonal polar factor of a scaled tall batch (σmax ≲ 1).

    Cholesky-variant QDWH: ``X⁺ = (b/c)X + (a − b/c)·X(I + cXᵀX)⁻¹``.
    """
    B, m, n = x.shape
    dtype = x.dtype
    eye = jnp.eye(n, dtype=dtype)
    l = jnp.full((B,), l0, dtype)
    for _ in range(iters):
        a, b, c, l = _qdwh_coeffs(l)
        gram = jnp.einsum("bji,bjk->bik", x, x, precision=_HIGH)
        Z = eye[None] + c[:, None, None] * gram
        W = jnp.linalg.cholesky(Z)
        # Y = X Z⁻¹  (Z = W Wᵀ):  solve Wᵀ from the right, then W.
        y = jax.scipy.linalg.solve_triangular(
            W, jnp.swapaxes(x, 1, 2), lower=True
        )
        y = jax.scipy.linalg.solve_triangular(
            W, y, lower=True, trans=1
        )
        y = jnp.swapaxes(y, 1, 2)
        x = (b / c)[:, None, None] * x + (
            a - b / c
        )[:, None, None] * y
    ok = jnp.all(jnp.isfinite(x), axis=(1, 2))
    return x, ok


class PolarResult(NamedTuple):
    """Polar decomposition ``a = up @ H`` (H symmetric PSD)."""

    up: jax.Array  # [B, m, n] orthogonal (partial isometry for m > n)
    H: jax.Array   # [B, n, n]
    ok: jax.Array  # [B]


@functools.partial(jax.jit, static_argnames=("iters",))
@f32_matmuls
def polar_batched(a: jax.Array, iters: int = 8) -> PolarResult:
    """Polar decomposition of a batched [B, m, n] matrix (m ≥ n) —
    the QDWH iteration exposed directly (orthogonal Procrustes,
    nearest-orthogonal-matrix, matrix-sign building block)."""
    B, m, n = a.shape
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    n1 = jnp.max(jnp.sum(jnp.abs(a), axis=1), axis=1)
    ninf = jnp.max(jnp.sum(jnp.abs(a), axis=2), axis=1)
    alpha = jnp.maximum(jnp.sqrt(n1 * ninf), 1e-30)
    up, ok = _qdwh_polar(a / alpha[:, None, None], l0=1e-3, iters=iters)
    H = jnp.einsum("bji,bjk->bik", up, a, precision=_HIGH)
    H = 0.5 * (H + jnp.swapaxes(H, 1, 2))
    return PolarResult(up, H, ok)


def svd_batched(a: jax.Array, iters: int = 8) -> SVDResult:
    """Thin SVD of a batched real matrix ``[B, m, n]`` (any shape).

    DIFFERENTIABLE: custom VJP with the classical thin-SVD adjoint
    (V square, so the right null-space term vanishes):
    ``Ā = U [diag(s̄) + (J+Jᵀ)Σ + Σ(K+Kᵀ)] Vᵀ + (I − UUᵀ) Ū Σ⁻¹ Vᵀ``
    with ``J = F ∘ (Uᵀ Ū)``, ``K = F ∘ (Vᵀ V̄)``,
    ``F_ij = 1/(s_j² − s_i²)``.  Near-equal singular-value pairs (gap
    ≤ n·eps·σmax²) contribute zero instead of blowing up — σ gradients
    stay exact there; individual singular-VECTOR gradients are only
    defined for simple singular values."""
    if a.shape[1] < a.shape[2]:
        res = _svd_vjp(jnp.swapaxes(a, 1, 2), iters)
        return SVDResult(res.V, res.s, res.U, res.ok)
    return _svd_vjp(a, iters)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _svd_vjp(a, iters):
    return _svd_impl(a, iters)


def _svd_fwd(a, iters):
    r = _svd_impl(a, iters)
    return r, (r.U, r.s, r.V)


def _svd_bwd(iters, res, g):
    U, s, V = res
    B, m, n = U.shape
    dt = U.dtype
    den = s[:, None, :] ** 2 - s[:, :, None] ** 2
    tiny = n * jnp.finfo(dt).eps * jnp.maximum(
        s[:, 0] ** 2, 1e-30
    )[:, None, None]
    F = jnp.where(jnp.abs(den) > tiny,
                  1.0 / jnp.where(den == 0, 1.0, den), 0.0)
    F = F * (1.0 - jnp.eye(n, dtype=dt))
    J = F * jnp.einsum("bji,bjk->bik", U, g.U, precision=_HIGH)
    K = F * jnp.einsum("bji,bjk->bik", V, g.V, precision=_HIGH)
    inner = (
        g.s[:, :, None] * jnp.eye(n, dtype=dt)
        + (J + jnp.swapaxes(J, 1, 2)) * s[:, None, :]
        + (K + jnp.swapaxes(K, 1, 2)) * s[:, :, None]
    )
    abar = jnp.einsum("bij,bjk,blk->bil", U, inner, V, precision=_HIGH)
    # left null-space term: (I − UUᵀ) Ū Σ⁻¹ Vᵀ (zero when m == n)
    if m > n:
        tiny_s = n * jnp.finfo(dt).eps * jnp.maximum(s[:, :1], 1e-30)
        sinv = jnp.where(s > tiny_s, 1.0 / jnp.maximum(s, 1e-30), 0.0)
        GsV = g.U * sinv[:, None, :]
        proj = GsV - jnp.einsum(
            "bij,bkj,bkl->bil", U, U, GsV, precision=_HIGH
        )
        abar = abar + jnp.einsum(
            "bij,bkj->bik", proj, V, precision=_HIGH
        )
    return (abar,)


_svd_vjp.defvjp(_svd_fwd, _svd_bwd)


@functools.partial(jax.jit, static_argnames=("iters",))
@f32_matmuls
def _svd_impl(a: jax.Array, iters: int = 8) -> SVDResult:
    # H = U_pᵀ A is symmetric PSD up to roundoff; eigh gives V and Σ.
    pol = polar_batched(a, iters=iters)
    up, ok = pol.up, pol.ok
    w, V = jnp.linalg.eigh(pol.H)
    s = jnp.maximum(w[:, ::-1], 0.0)          # descending, clamp -eps
    V = V[:, :, ::-1]
    U = jnp.einsum("bij,bjk->bik", up, V, precision=_HIGH)
    return SVDResult(U, s, V, ok)


@functools.partial(jax.jit, static_argnames=("iters",))
def pinv_batched(
    a: jax.Array, rcond: float = None, iters: int = 8
) -> jax.Array:
    """Moore–Penrose pseudoinverse ``[B, n, m]`` (numpy semantics:
    singular values ≤ rcond·σmax are treated as zero; default rcond
    matches ``max(m, n)·eps``)."""
    B, m, n = a.shape
    if rcond is None:
        rcond = max(m, n) * float(jnp.finfo(jnp.float32).eps)
    res = svd_batched(a, iters=iters)
    cutoff = rcond * res.s[:, :1]
    sinv = jnp.where(res.s > cutoff, 1.0 / jnp.maximum(res.s, 1e-30), 0.0)
    return jnp.einsum(
        "bik,bk,bjk->bij", res.V, sinv, res.U, precision=_HIGH
    )


@functools.partial(jax.jit, static_argnames=("iters",))
def cond2_batched(a: jax.Array, iters: int = 8) -> jax.Array:
    """[B] spectral condition number σmax/σmin (inf where σmin ≈ 0)."""
    res = svd_batched(a, iters=iters)
    smin = res.s[:, -1]
    return jnp.where(
        smin > 0, res.s[:, 0] / jnp.maximum(smin, 1e-30), jnp.inf
    )


@functools.partial(jax.jit, static_argnames=("iters",))
def rank_svd_batched(
    a: jax.Array, tol: float = None, iters: int = 8
) -> jax.Array:
    """[B] numerical rank by singular-value thresholding (the robust
    oracle for the elimination-based ``ops.solve.rank_batched``)."""
    B, m, n = a.shape
    res = svd_batched(a, iters=iters)
    if tol is None:
        tol_arr = (
            max(m, n)
            * jnp.finfo(res.s.dtype).eps
            * res.s[:, :1]
        )
    else:
        tol_arr = jnp.full((B, 1), tol, res.s.dtype)
    return jnp.sum(res.s > tol_arr, axis=1).astype(jnp.int32)
