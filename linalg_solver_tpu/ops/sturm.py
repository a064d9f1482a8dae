"""Batched tridiagonal eigensolver: Sturm-count bisection.

Symmetric tridiagonals are what Lanczos, spline/ADI operators and
orthogonal-polynomial recurrences produce; their spectrum is computable
WITHOUT the O(n³) dense eigensolver.  The Sturm sequence of
``T − xI``'s LDLᵀ factorization counts eigenvalues below x in one
O(n) scan (dstebz's core), and bisection on that count is perfectly
TPU-shaped: ALL B·n eigenvalues bisect simultaneously — each bisection
step is one scan over the matrix dimension whose body does
``[B, n]``-wide elementwise VPU work, so the whole spectrum costs
O(n² · ~30 steps) per lane with zero sequential dependence between
eigenvalues (the dense ``eigh`` is O(n³) with heavy MXU+communication).

Eigenvectors come from Fernando's TWISTED FACTORIZATION (the MRRR
``getvec`` kernel) — four more scans, no linear solves — with
per-vector TRUE residuals reported: the known failure mode of any
shift-based vector method (clustered eigenvalues → near-parallel
vectors) is surfaced, never hidden.  (Inverse iteration through the
pivot-free PCR solver was tried first and floored at ~1e-3·‖T‖
residuals — the near-singular shifted solves are exactly PCR's
no-pivot weak spot; the twisted factorization measures ~1e-7.)

No counterpart in the reference (dense exact arithmetic only); the
device-native member of the structured family next to ``ops.banded``
and ``ops.toeplitz``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


def sturm_count_batched(
    d: jax.Array, e: jax.Array, x: jax.Array
) -> jax.Array:
    """Number of eigenvalues of the symmetric tridiagonal (diag ``d``
    [B, n], off-diag ``e`` [B, n−1]) strictly below each query point
    (``x`` [B, G]) — the LDLᵀ negative-pivot count, safeguarded
    dstebz-style (pivots floored at ``pivmin`` so a split chain never
    divides by zero)."""
    B, n = d.shape
    dtype = d.dtype
    e2 = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), (e * e).astype(dtype)], axis=1
    )
    emax = jnp.max(jnp.abs(e), axis=1, initial=0.0)
    pivmin = jnp.maximum(
        jnp.finfo(dtype).eps * emax * emax,
        jnp.finfo(dtype).tiny,
    )[:, None]                           # [B, 1]

    def step(carry, i):
        q, cnt = carry                   # [B, G]
        di = lax.dynamic_index_in_dim(d, i, 1, keepdims=True)  # [B,1]
        e2i = lax.dynamic_index_in_dim(e2, i, 1, keepdims=True)
        q_new = (di - x) - e2i / q
        # guard BEFORE counting (dstebz): an exactly-zero pivot counts
        # as negative — x sitting exactly on an eigenvalue must report
        # it below, or bisection collapses onto the wrong interval.
        q_new = jnp.where(jnp.abs(q_new) < pivmin,
                          -pivmin * jnp.ones_like(q_new), q_new)
        cnt = cnt + (q_new < 0).astype(jnp.int32)
        return (q_new, cnt), None

    q0 = jnp.ones_like(x)
    cnt0 = jnp.zeros(x.shape, jnp.int32)
    (q, cnt), _ = lax.scan(step, (q0, cnt0), jnp.arange(n))
    return cnt


class TridiagEigResult(NamedTuple):
    w: jax.Array          # [B, n] ascending eigenvalues
    converged: jax.Array  # [B] all intervals shrank below the f32
    #                       resolution (2·eps·|w| + pivmin)


@jax.jit
@f32_matmuls
def eigh_tridiagonal_batched(
    d: jax.Array, e: jax.Array
) -> TridiagEigResult:
    """ALL eigenvalues of a batch of symmetric tridiagonals by Sturm
    bisection from the Gershgorin enclosure — every (lane, index) pair
    bisects in parallel."""
    f32 = jnp.result_type(d.dtype, jnp.float32)
    d = d.astype(f32)
    e = e.astype(f32)
    B, n = d.shape
    epad = jnp.concatenate(
        [jnp.zeros((B, 1), f32), jnp.abs(e), jnp.zeros((B, 1), f32)],
        axis=1,
    )
    r = epad[:, :-1] + epad[:, 1:]
    lo = jnp.min(d - r, axis=1, keepdims=True)           # [B, 1]
    hi = jnp.max(d + r, axis=1, keepdims=True)
    scale = jnp.maximum(jnp.abs(lo), jnp.abs(hi))
    lo = lo - 2 * jnp.finfo(f32).eps * scale - jnp.finfo(f32).tiny
    hi = hi + 2 * jnp.finfo(f32).eps * scale + jnp.finfo(f32).tiny

    k = jnp.arange(n)[None, :]                            # target index
    a0 = jnp.broadcast_to(lo, (B, n))
    b0 = jnp.broadcast_to(hi, (B, n))
    eps = jnp.finfo(f32).eps

    def cond(st):
        a, b, it = st
        width = b - a
        tol = 2 * eps * jnp.maximum(jnp.abs(a), jnp.abs(b)) + 1e-30
        return (it < 64) & jnp.any(width > tol)

    def body(st):
        a, b, it = st
        m = 0.5 * (a + b)
        cnt = sturm_count_batched(d, e, m)
        below = cnt <= k           # fewer than k+1 eigs strictly below m
        a = jnp.where(below, m, a)
        b = jnp.where(below, b, m)
        return a, b, it + 1

    a, b, it = lax.while_loop(
        cond, body, (a0, b0, jnp.zeros((), jnp.int32))
    )
    w = 0.5 * (a + b)
    tol = 4 * eps * jnp.maximum(jnp.abs(w), 1.0)
    conv = jnp.all((b - a) <= tol + 1e-30, axis=1) | (it < 64)
    return TridiagEigResult(w, jnp.broadcast_to(conv, (B,)))


class TridiagEigVecResult(NamedTuple):
    V: jax.Array      # [B, n, n] — column j pairs with w[:, j]
    resid: jax.Array  # [B, n] true ‖T v − w v‖ / ‖T‖ per vector
    ok: jax.Array     # [B, n] resid at the f32 floor AND the ratio
    #                   chains stayed finite.  Clustered eigenvalues
    #                   may yield near-parallel columns (the classical
    #                   limitation of any single-shift vector method) —
    #                   such columns still have small residuals; check
    #                   pairwise angles if orthogonality matters.


@jax.jit
@f32_matmuls
def tridiag_eigenvectors_batched(
    d: jax.Array, e: jax.Array, w: jax.Array
) -> TridiagEigVecResult:
    """Eigenvectors for precomputed tridiagonal eigenvalues ``w`` by
    Fernando's TWISTED FACTORIZATION (the MRRR ``getvec`` kernel,
    Parlett–Dhillon): run the LDLᵀ pivot recurrence forward (``s``)
    and backward (``p``) on ``T − λI``, pick the twist index k
    minimizing ``|γ_k| = |s_k + p_k − a_k|`` (where the factorizations
    meet with the smallest perturbation — provably the eigenvector's
    LARGEST component), then read the vector off the two ratio chains
    ``v_i = −(b_i/s_i)·v_{i+1}`` (i < k) and
    ``v_{i+1} = −(b_i/p_{i+1})·v_i`` (i ≥ k).  Four scans, NO linear
    solves — measured ~100× more accurate than inverse iteration
    through the pivot-free PCR solver (whose near-singular shifted
    solves floor the residual at ~1e-3·‖T‖)."""
    f32 = jnp.result_type(d.dtype, jnp.float32)
    d = d.astype(f32)
    e = e.astype(f32)
    w = w.astype(f32)
    B, n = d.shape
    if n == 1:
        # Trivial 1×1 case: there is no off-diagonal to scan over
        # (jnp.take on the empty ``e`` would fail) — the eigenvector
        # is [1]; residual is |d − w| relative to ‖T‖ = |d|.
        resid = jnp.abs(d - w) / jnp.maximum(jnp.abs(d), 1e-30)
        return TridiagEigVecResult(
            jnp.ones((B, 1, 1), f32),
            resid,
            resid <= 100 * jnp.finfo(f32).eps,
        )
    eps = jnp.finfo(f32).eps
    tnorm = jnp.max(
        jnp.abs(d), axis=1
    ) + 2 * jnp.max(jnp.abs(e), axis=1, initial=0.0)      # [B]

    BN = B * n
    a = (d[:, None, :] - w[:, :, None]).reshape(BN, n)    # d − λ
    b = jnp.broadcast_to(e[:, None, :], (B, n, n - 1)).reshape(
        BN, n - 1
    )
    b2 = b * b
    pivmin = (
        eps * eps * jnp.maximum(tnorm, 1e-30) ** 2
    )[:, None].repeat(n, axis=1).reshape(BN)

    def guard(q):
        pm = pivmin if q.ndim == 1 else pivmin[:, None]
        return jnp.where(jnp.abs(q) < pm, -pm * jnp.ones_like(q), q)

    # forward pivots s_i = a_i − b_{i−1}²/s_{i−1}
    def fwd(s_prev, i):
        ai = jnp.take(a, i, axis=1)
        b2i = jnp.where(i > 0, jnp.take(b2, jnp.maximum(i - 1, 0),
                                        axis=1), 0.0)
        s = ai - b2i / guard(s_prev)
        return s, s

    _, sT = lax.scan(fwd, jnp.ones((BN,), f32), jnp.arange(n))
    s = sT.T                                              # [BN, n]

    # backward pivots p_i = a_i − b_i²/p_{i+1}
    def bwd(p_next, i):
        ai = jnp.take(a, i, axis=1)
        b2i = jnp.where(i < n - 1, jnp.take(b2, jnp.minimum(i, n - 2),
                                            axis=1), 0.0)
        p = ai - b2i / guard(p_next)
        return p, p

    _, pT = lax.scan(
        bwd, jnp.ones((BN,), f32), jnp.arange(n - 1, -1, -1)
    )
    p = pT.T[:, ::-1]                                     # [BN, n]

    gamma = s + p - a
    k = jnp.argmin(jnp.abs(gamma), axis=1)                # [BN]

    ratio_f = -b / guard(s[:, :-1])      # v_i   = ratio_f[i]·v_{i+1}
    ratio_b = -b / guard(p[:, 1:])       # v_{i+1} = ratio_b[i]·v_i

    # downward chain (i < k), seeded 1 at i = k
    def down(u_next, i):
        rf = jnp.where(i < n - 1,
                       jnp.take(ratio_f, jnp.minimum(i, n - 2),
                                axis=1), 0.0)
        u = jnp.where(i == k, 1.0,
                      jnp.where(i < k, rf * u_next, 0.0))
        return u, u

    _, uT = lax.scan(
        down, jnp.zeros((BN,), f32), jnp.arange(n - 1, -1, -1)
    )
    u = uT.T[:, ::-1]

    # upward chain (i > k), seeded 1 at i = k
    def upc(l_prev, i):
        rb = jnp.where(i > 0,
                       jnp.take(ratio_b, jnp.maximum(i - 1, 0),
                                axis=1), 0.0)
        l = jnp.where(i == k, 1.0,
                      jnp.where(i > k, rb * l_prev, 0.0))
        return l, l

    _, lT = lax.scan(upc, jnp.zeros((BN,), f32), jnp.arange(n))
    l = lT.T

    onehot = (jnp.arange(n)[None, :] == k[:, None]).astype(f32)
    v = u + l - onehot
    nrm = jnp.sqrt(jnp.sum(v * v, axis=1))
    v = v / jnp.maximum(nrm, 1e-30)[:, None]
    finite = jnp.isfinite(v).all(axis=1)
    v = jnp.where(finite[:, None], v, onehot)

    V = v.reshape(B, n, n).transpose(0, 2, 1)             # columns
    # true residual T v − w v through the tridiagonal matvec
    Vd = V * d[:, :, None]
    up = jnp.concatenate(
        [V[:, 1:, :] * e[:, :, None], jnp.zeros((B, 1, n), f32)],
        axis=1,
    )
    lo = jnp.concatenate(
        [jnp.zeros((B, 1, n), f32), V[:, :-1, :] * e[:, :, None]],
        axis=1,
    )
    r = Vd + up + lo - V * w[:, None, :]
    resid = jnp.sqrt(jnp.sum(r * r, axis=1)) / jnp.maximum(
        tnorm, 1e-30
    )[:, None]
    ok = finite.reshape(B, n) & (resid <= 100 * n * eps)
    return TridiagEigVecResult(V, resid, ok)
