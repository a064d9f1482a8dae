"""Batched LOBPCG: extreme eigenpairs of SPD matrices.

The iterative counterpart of ``ops.symmetric.eigh_batched`` for the
regime where only a few extreme eigenpairs are wanted: k eigenpairs
cost O(iters · n² · 3k) GEMV/GEMM work instead of the full O(n³)
eigendecomposition — the win is real once ``k ≪ n`` (leading PCA
components, smallest modes of a stiffness matrix, spectral-gap
estimates).

TPU-first structure: the search basis ``S = [X | R | P] [B, n, 3k]``
is a static shape; every step is batched GEMMs (``AᐧS``, Gram matrices,
basis rotations — MXU work) plus one ``eigh`` of the tiny projected
``[B, 3k, 3k]`` pencil.  Per-lane convergence masks freeze finished
lanes.  Degenerate basis columns (converged residuals, first-iteration
P) are replaced by fresh random directions each step, keeping the
CholeskyQR2 orthonormalization full-rank without data-dependent
shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


class LOBPCGResult(NamedTuple):
    w: jax.Array          # [B, k] eigenvalues (ascending)
    V: jax.Array          # [B, n, k] orthonormal eigenvectors
    converged: jax.Array  # [B] all k residuals below tolerance
    iters: jax.Array      # [] i32 — iterations executed
    resnorm: jax.Array    # [B, k] final ‖A v − λ v‖ / ‖A‖


def _mm(x, y):
    return jnp.einsum("bij,bjk->bik", x, y, precision=_HIGH)


def _chol_qr2(S, eps_scale):
    """CholeskyQR2 with a tiny ridge — orthonormalizes [B, n, m]
    columns at MXU throughput; rank-deficient inputs stay finite (the
    caller guarantees full rank by column refresh)."""
    B, n, m = S.shape
    eye = jnp.eye(m, dtype=S.dtype)
    for _ in range(2):
        G = jnp.einsum("bji,bjk->bik", S, S, precision=_HIGH)
        ridge = eps_scale * jnp.trace(G, axis1=1, axis2=2) / m
        L = jnp.linalg.cholesky(G + ridge[:, None, None] * eye)
        # S ← S L⁻ᵀ via a triangular solve on the right.
        S = jnp.swapaxes(
            jax.scipy.linalg.solve_triangular(
                L, jnp.swapaxes(S, 1, 2), lower=True
            ),
            1, 2,
        )
    return S


@functools.partial(
    jax.jit, static_argnames=("k", "largest", "max_iters", "nguard")
)
@f32_matmuls
def lobpcg_batched(
    a: jax.Array,
    k: int,
    largest: bool = False,
    tol: Optional[float] = None,
    max_iters: int = 200,
    key: Optional[jax.Array] = None,
    nguard: int = 2,
) -> LOBPCGResult:
    """``k`` extreme eigenpairs of each SPD (symmetric suffices for
    correctness of the extremal pairs) matrix in ``[B, n, n]``.

    ``largest=False`` returns the k smallest eigenvalues (ascending),
    ``largest=True`` the k largest (still ascending).  Requires
    ``3k ≤ n``.

    ``nguard`` extra block vectors iterate alongside the wanted k but
    are never reported or convergence-tested — the standard insurance
    against the residual test latching on a NON-extreme invariant
    subspace (a k-block that drifts orthogonal to an extreme mode has
    small residuals too; guards catch the missing mode before the
    wanted block can converge without it).  Auto-shrinks to fit 3(k+g)
    ≤ n.
    """
    B, n, _ = a.shape
    if 3 * k > n:
        raise ValueError(
            f"lobpcg_batched needs 3k <= n, got k={k}, n={n}; use "
            f"ops.symmetric.eigh_batched for full spectra"
        )
    k_want = k
    k = min(k + max(nguard, 0), n // 3)
    dtype = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(dtype)
    eps = float(jnp.finfo(dtype).eps)
    if tol is None:
        tol = 100.0 * eps
    tol = jnp.asarray(tol, dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    anorm = jnp.maximum(
        jnp.max(jnp.sum(jnp.abs(a), axis=2), axis=1),
        jnp.finfo(dtype).tiny,
    )  # [B]

    m = 3 * k
    sign = -1.0 if largest else 1.0

    def equilibrate(S, it):
        """Unit-normalize every basis column (X columns are ~1 already;
        R columns carry the ‖A‖·residual scale, P columns a fraction of
        it — without equilibration the Gram ridge swamps the small
        columns and the iteration is not scale-invariant: ‖A‖ ~ 1e-7
        input never converged).  Exactly-zero columns (first-iteration
        P, fully-converged residuals) become fresh random directions —
        full-rank basis, static shapes."""
        colnorm = jnp.sqrt(jnp.sum(S * S, axis=1))          # [B, m]
        rnd = jax.random.normal(
            jax.random.fold_in(key, it), (B, n, m), dtype
        )
        rnd = rnd / jnp.sqrt(jnp.sum(rnd * rnd, axis=1))[:, None, :]
        dead = (colnorm <= jnp.finfo(dtype).tiny ** 0.5)[:, None, :]
        S = jnp.where(
            dead, rnd, S / jnp.maximum(colnorm, 1e-30)[:, None, :]
        )
        return S

    def rayleigh_ritz(S, it):
        S = equilibrate(S, it)
        Q = _chol_qr2(S, 10.0 * eps)
        AQ = _mm(a, Q)
        T = jnp.einsum("bji,bjk->bik", Q, AQ, precision=_HIGH)
        T = 0.5 * (T + jnp.swapaxes(T, 1, 2))
        # eigh ascending; for largest=True flip via -T so the wanted
        # end is always the FIRST k slots.
        w_all, Y = jnp.linalg.eigh(sign * T)
        wk = sign * w_all[:, :k]                            # [B, k]
        Yk = Y[:, :, :k]                                    # [B, m, k]
        X = _mm(Q, Yk)                                      # [B, n, k]
        # implicit P: the X-block rows of Y zeroed — the component of
        # the new X outside the previous X span (classic LOBPCG).
        Yp = Yk.at[:, :k, :].set(0.0)
        P = _mm(Q, Yp)
        return X, P, wk

    # --- init: random X, one Rayleigh–Ritz on [X | AX | rand] ---
    X0 = jax.random.normal(key, (B, n, k), dtype)
    S0 = jnp.concatenate(
        [X0, _mm(a, X0),
         jax.random.normal(jax.random.fold_in(key, 17), (B, n, k), dtype)],
        axis=2,
    )
    X, P, w = rayleigh_ritz(S0, 0)

    def residual(X, w):
        R = _mm(a, X) - X * w[:, None, :]
        return R, jnp.sqrt(jnp.sum(R * R, axis=1)) / anorm[:, None]

    R, rn = residual(X, w)
    done0 = jnp.all(rn[:, :k_want] <= tol, axis=1)

    def cond(st):
        X, P, w, R, rn, done, it = st
        return (it < max_iters) & ~jnp.all(done)

    def body(st):
        X, P, w, R, rn, done, it = st
        S = jnp.concatenate([X, R, P], axis=2)
        Xn, Pn, wn = rayleigh_ritz(S, it + 1)
        keep = done[:, None, None]
        X = jnp.where(keep, X, Xn)
        P = jnp.where(keep, P, Pn)
        w = jnp.where(done[:, None], w, wn)
        R, rn = residual(X, w)   # one A·X per iteration, reused as the
        #                          next basis block AND the done check
        done = done | jnp.all(rn[:, :k_want] <= tol, axis=1)
        return X, P, w, R, rn, done, it + 1

    X, P, w, R, rn, done, it = lax.while_loop(
        cond, body, (X, P, w, R, rn, done0, jnp.zeros((), jnp.int32))
    )
    # drop guards; internal order is extremal-first.
    w, X, rn = w[:, :k_want], X[:, :, :k_want], rn[:, :k_want]
    if largest:
        # return ascending.
        w, X, rn = w[:, ::-1], X[:, :, ::-1], rn[:, ::-1]
    return LOBPCGResult(w, X, jnp.all(rn <= 4.0 * tol, axis=1), it, rn)
