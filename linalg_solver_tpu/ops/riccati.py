"""Batched continuous algebraic Riccati equations (CARE) by the
matrix-sign method.

``AᵀX + XA − X B R⁻¹ Bᵀ X + Q = 0`` — the LQR/Kalman kernel.  Roberts'
method: the stabilizing solution spans the stable invariant subspace of
the Hamiltonian

    H = [[A, −G], [−Q, −Aᵀ]],   G = B R⁻¹ Bᵀ,

and with ``S = sign(H)`` (``ops.sign`` — scaled Newton, all batched
inverses/GEMMs) the subspace condition ``(I − S)/2 · [I; X] = [I; X]``
becomes one overdetermined linear system

    [[S₁₂], [S₂₂ + I]] · X = −[[S₁₁ + I], [S₂₁]],

solved least-squares (CholeskyQR2, ``ops.lstsq``).  Everything is MXU
work; no Schur reordering needed (the classical alternative).  The
returned ``resid`` is the true relative CARE residual and gates ``ok``
— a Hamiltonian with eigenvalues on the imaginary axis (no stabilizing
solution) breaks the sign iteration and is flagged, not mangled.

No counterpart in the reference; completes the matrix-equation family
(Sylvester/Lyapunov/Stein → Riccati).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


class CAREResult(NamedTuple):
    X: jax.Array      # [B, n, n] symmetric stabilizing solution
    resid: jax.Array  # [B] relative CARE residual
    ok: jax.Array     # [B]


def _mm(x, y):
    return jnp.einsum("bij,bjk->bik", x, y, precision=_HIGH)


@functools.partial(jax.jit, static_argnames=("rtol",))
@f32_matmuls
def care_batched(
    a: jax.Array,
    b: jax.Array,
    q: jax.Array,
    r: jax.Array,
    rtol: float = 1e-3,
) -> CAREResult:
    """Solve batched CAREs (``a [B,n,n]``, ``b [B,n,m]``, symmetric
    ``q [B,n,n]``, SPD ``r [B,m,m]``)."""
    from .lstsq import lstsq_batched
    from .sign import sign_batched
    from .spd import cholesky_solve_batched

    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    b = b.astype(f32)
    q = 0.5 * (q + jnp.swapaxes(q, 1, 2)).astype(f32)
    r = r.astype(f32)
    B, n, _ = a.shape

    rinv_bt, ok_r = cholesky_solve_batched(
        r, jnp.swapaxes(b, 1, 2)
    )                                           # R⁻¹Bᵀ [B, m, n]
    G = _mm(b, rinv_bt)                         # B R⁻¹ Bᵀ
    G = 0.5 * (G + jnp.swapaxes(G, 1, 2))

    H = jnp.concatenate(
        [
            jnp.concatenate([a, -G], axis=2),
            jnp.concatenate([-q, -jnp.swapaxes(a, 1, 2)], axis=2),
        ],
        axis=1,
    )
    sg = sign_batched(H)
    S11 = sg.S[:, :n, :n]
    S12 = sg.S[:, :n, n:]
    S21 = sg.S[:, n:, :n]
    S22 = sg.S[:, n:, n:]
    eye = jnp.eye(n, dtype=f32)
    lhs = jnp.concatenate([S12, S22 + eye], axis=1)     # [B, 2n, n]
    rhs = -jnp.concatenate([S11 + eye, S21], axis=1)    # [B, 2n, n]
    ls = lstsq_batched(lhs, rhs)
    X = 0.5 * (ls.x + jnp.swapaxes(ls.x, 1, 2))

    # True CARE residual, relative to the equation's term scale.
    at_x = _mm(jnp.swapaxes(a, 1, 2), X)
    xgx = _mm(X, _mm(G, X))
    R = at_x + jnp.swapaxes(at_x, 1, 2) - xgx + q

    def nrm(x):
        return jnp.max(jnp.abs(x), axis=(1, 2))

    scale = jnp.maximum(
        nrm(at_x) + nrm(xgx) + nrm(q), 1e-30
    )
    resid = nrm(R) / scale
    ok = ok_r & sg.converged & ls.ok & (resid < rtol)
    return CAREResult(X, resid, ok)


class DAREResult(NamedTuple):
    X: jax.Array      # [B, n, n] symmetric stabilizing solution
    resid: jax.Array  # [B] relative DARE residual
    ok: jax.Array     # [B]
    iters: jax.Array  # [] i32


@functools.partial(jax.jit, static_argnames=("rtol", "max_iters"))
@f32_matmuls
def dare_batched(
    a: jax.Array,
    b: jax.Array,
    q: jax.Array,
    r: jax.Array,
    rtol: float = 1e-3,
    max_iters: int = 30,
) -> DAREResult:
    """Discrete algebraic Riccati equation
    ``AᵀXA − X − AᵀXB(R + BᵀXB)⁻¹BᵀXA + Q = 0`` by the
    structure-preserving DOUBLING algorithm (SDA):

        E ← E(I + GH)⁻¹E,  G ← G + E(I + GH)⁻¹G Eᵀ,
        H ← H + Eᵀ H(I + GH)⁻¹ E,

    from ``E₀ = A, G₀ = BR⁻¹Bᵀ, H₀ = Q``; ``H`` converges
    quadratically to the stabilizing X (each sweep is batched
    GEMMs + one batched solve).  The true DARE residual gates ``ok``.
    """
    from .spd import cholesky_solve_batched

    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    b = b.astype(f32)
    q = 0.5 * (q + jnp.swapaxes(q, 1, 2)).astype(f32)
    r = r.astype(f32)
    B, n, _ = a.shape
    eye = jnp.eye(n, dtype=f32)

    rinv_bt, ok_r = cholesky_solve_batched(r, jnp.swapaxes(b, 1, 2))
    G0 = _mm(b, rinv_bt)
    G0 = 0.5 * (G0 + jnp.swapaxes(G0, 1, 2))

    def nrm(x):
        return jnp.max(jnp.abs(x), axis=(1, 2))

    def cond(st):
        E, G, H, k, done = st
        return (k < max_iters) & ~jnp.all(done)

    def body(st):
        E, G, H, k, done = st
        W = eye + _mm(G, H)
        Winv_E = jnp.linalg.solve(W, E)
        Winv_G = jnp.linalg.solve(W, G)
        E_new = _mm(E, Winv_E)
        G_new = G + _mm(
            E, _mm(Winv_G, jnp.swapaxes(E, 1, 2))
        )
        H_new = H + _mm(
            jnp.swapaxes(E, 1, 2), _mm(H, Winv_E)
        )
        G_new = 0.5 * (G_new + jnp.swapaxes(G_new, 1, 2))
        H_new = 0.5 * (H_new + jnp.swapaxes(H_new, 1, 2))
        step = nrm(H_new - H) / jnp.maximum(nrm(H_new), 1e-30)
        done_new = done | (step < 4.0 * jnp.finfo(f32).eps) | ~jnp.all(
            jnp.isfinite(H_new), axis=(1, 2)
        )
        m = (~done)[:, None, None]
        return (
            jnp.where(m, E_new, E), jnp.where(m, G_new, G),
            jnp.where(m, H_new, H), k + 1, done_new,
        )

    E, G, X, iters, done = jax.lax.while_loop(
        cond, body,
        (a, G0, q, jnp.zeros((), jnp.int32),
         jnp.zeros((B,), bool)),
    )
    X = 0.5 * (X + jnp.swapaxes(X, 1, 2))

    # True DARE residual: AᵀXA − X − AᵀXB(R + BᵀXB)⁻¹BᵀXA + Q.
    xa = _mm(X, a)
    at_xa = _mm(jnp.swapaxes(a, 1, 2), xa)          # AᵀXA
    bt_xa = _mm(jnp.swapaxes(b, 1, 2), xa)          # BᵀXA [B, m, n]
    r_in = r + _mm(jnp.swapaxes(b, 1, 2), _mm(X, b))
    sol, ok_in = cholesky_solve_batched(r_in, bt_xa)
    corr = _mm(jnp.swapaxes(bt_xa, 1, 2), sol)
    R_ = at_xa - X - corr + q
    scale = jnp.maximum(nrm(at_xa) + nrm(X) + nrm(corr) + nrm(q),
                        1e-30)
    resid = nrm(R_) / scale
    ok = ok_r & ok_in & done & (resid < rtol) & jnp.all(
        jnp.isfinite(X), axis=(1, 2)
    )
    return DAREResult(X, resid, ok, iters)
