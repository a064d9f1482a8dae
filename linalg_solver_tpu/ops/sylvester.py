"""Batched Sylvester / Lyapunov equation solver.

Solves ``A X + X B = C`` for batches of dense real systems — the
control-theory / model-reduction workhorse built entirely from this
framework's eigensolver stack:

1. ``A = M T M⁻¹`` — real Schur form with accumulated vectors
   (``ops.schur.real_schur_vectors``; M = diag(scale)⁻¹·Q — the
   balance similarity is ``A_b = D A D⁻¹``).
2. ``B = W Λ W⁻¹`` — complex eigendecomposition of B
   (``ops.schur.eig_batched``).
3. In the transformed bases the columns DECOUPLE:
   ``(T + λⱼI) zⱼ = (M⁻¹ C W)ⱼ`` — n independent shifted
   quasi-triangular solves, all columns at once through the dhsein
   back-substitution kernel (``_shifted_backsolve``) in re/im
   arithmetic; then ``X = M Z W⁻¹``.

This is the eigendecomposition variant of Bartels–Stewart: B must be
diagonalizable with a reasonably conditioned eigenbasis (κ(W) enters
the error; defective B needs the fully quasi-triangular substitution —
not implemented).  Solvability requires spec(A) ∩ spec(−B) = ∅; near
violations are safeguarded by the kernel's pivot floor and surface as
large residuals.  ``ok`` flags lanes whose eigensolves converged
cleanly and produced a full valid eigenbasis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls
from .schur import _shifted_backsolve, eig_batched, real_schur_vectors

_HIGH = jax.lax.Precision.HIGHEST


class SylvesterResult(NamedTuple):
    X: jax.Array         # [B, n, m] real solution
    ok: jax.Array        # [B] both eigensolves clean + basis valid
    imag_defect: jax.Array  # [B] max |Im X| / max |Re X| — should be
    #                         at roundoff for real data; large values
    #                         indicate an ill-posed/defective lane


@functools.partial(jax.jit, static_argnames=())
@f32_matmuls
def _assemble(scale, Q, T, c, eg_re, eg_im, W_re, W_im):
    # A = M T M⁻¹ with M = D⁻¹Q, D = diag(scale) (the balance
    # similarity is A_b = D A D⁻¹ — same convention eig_batched
    # applies when it divides eigenvectors by ``scale``).
    # F = M⁻¹ C W = Qᵀ (D C) W, split into re/im parts.
    C_s = c * scale[:, :, None]
    F0 = jnp.einsum("bji,bjk->bik", Q, C_s, precision=_HIGH)
    F_re = jnp.einsum("bik,bkm->bim", F0, W_re, precision=_HIGH)
    F_im = jnp.einsum("bik,bkm->bim", F0, W_im, precision=_HIGH)
    # (T + λⱼ I) zⱼ = Fⱼ  ⇔  (T − (−λⱼ) I) zⱼ = Fⱼ.
    Z_re, Z_im = _shifted_backsolve(T, -eg_re, -eg_im, F_re, F_im)
    # X = M Z W⁻¹; apply W⁻¹ in complex64 (XW = Z ⇒ Wᵀ X̃ᵀ = Zᵀ).
    W = W_re.astype(jnp.complex64) + 1j * W_im.astype(jnp.complex64)
    Z = Z_re.astype(jnp.complex64) + 1j * Z_im.astype(jnp.complex64)
    Xt = jnp.linalg.solve(
        jnp.swapaxes(W, 1, 2), jnp.swapaxes(Z, 1, 2)
    )
    Xc = jnp.swapaxes(Xt, 1, 2)
    Xc = jnp.einsum(
        "bij,bjk->bik", Q.astype(Xc.dtype), Xc, precision=_HIGH
    ) / scale[:, :, None]
    re_max = jnp.max(jnp.abs(jnp.real(Xc)), axis=(1, 2))
    im_max = jnp.max(jnp.abs(jnp.imag(Xc)), axis=(1, 2))
    defect = im_max / jnp.maximum(re_max, 1e-30)
    return jnp.real(Xc), defect


def sylvester_batched(
    a: jax.Array, b: jax.Array, c: jax.Array,
) -> SylvesterResult:
    """Solve ``a @ X + X @ b = c`` per lane (``a [B,n,n]``,
    ``b [B,m,m]``, ``c [B,n,m]``)."""
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    b = b.astype(f32)
    c = c.astype(f32)
    sv = real_schur_vectors(a)
    eg = eig_batched(b)
    X, defect = _assemble(
        sv.scale, sv.Q, sv.T, c, eg.real, eg.imag,
        eg.vectors_real, eg.vectors_imag,
    )
    ok = (
        sv.converged
        & eg.converged
        & jnp.all(eg.valid, axis=1)
        & jnp.all(jnp.isfinite(X), axis=(1, 2))
    )
    return SylvesterResult(X, ok, defect)


def lyapunov_batched(a: jax.Array, q: jax.Array) -> SylvesterResult:
    """Solve the continuous Lyapunov equation ``a X + X aᵀ = q``."""
    return sylvester_batched(a, jnp.swapaxes(a, 1, 2), q)


class SteinResult(NamedTuple):
    """``X`` solves ``A X Aᵀ − X + Q = 0`` where ``ok``; lanes whose
    spectral radius is not < 1 (the solvability condition) diverge the
    doubling iteration and report ``ok=False``."""

    X: jax.Array        # [B, n, n]
    ok: jax.Array       # [B]
    iters: jax.Array    # [] i32


@functools.partial(jax.jit, static_argnames=("max_iters",))
@f32_matmuls
def stein_batched(
    a: jax.Array, q: jax.Array, max_iters: int = 30
) -> SteinResult:
    """Discrete Lyapunov (Stein) equation ``A X Aᵀ − X + Q = 0`` by
    the Smith DOUBLING iteration: with ``ρ(A) < 1``,
    ``X = Σ_k Aᵏ Q (Aᵀ)ᵏ`` and the partial sums double per step
    (``X ← X + P X Pᵀ; P ← P²``) — log₂ convergence, every step two
    batched GEMM pairs.  Divergence (ρ ≥ 1) is detected per lane from
    the growth of ‖P‖ and flagged."""
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    q = q.astype(f32)
    B = a.shape[0]

    def nrm(x):
        return jnp.max(jnp.abs(x), axis=(1, 2))

    p_scale0 = jnp.maximum(nrm(a), 1e-30)

    def cond(st):
        X, P, k, done, ok = st
        return (k < max_iters) & ~jnp.all(done | ~ok)

    def body(st):
        X, P, k, done, ok = st
        PX = jnp.einsum("bij,bjk->bik", P, X, precision=_HIGH)
        upd = jnp.einsum(
            "bij,bkj->bik", PX, P, precision=_HIGH
        )
        X_new = X + upd
        P_new = jnp.einsum("bij,bjk->bik", P, P, precision=_HIGH)
        step = nrm(upd) / jnp.maximum(nrm(X_new), 1e-30)
        done_new = step < 4.0 * jnp.finfo(f32).eps
        # ρ(A) ≥ 1 ⇒ ‖P‖ = ‖A^{2^k}‖ blows past any poly factor.
        ok_new = ok & (nrm(P_new) < 1e6 * p_scale0) & jnp.all(
            jnp.isfinite(X_new), axis=(1, 2)
        )
        upd_mask = (~done & ok)[:, None, None]
        return (
            jnp.where(upd_mask, X_new, X),
            jnp.where(upd_mask, P_new, P),
            k + 1,
            done | done_new,
            ok_new,
        )

    X, P, iters, done, ok = jax.lax.while_loop(
        cond, body,
        (q, a, jnp.zeros((), jnp.int32), jnp.zeros((B,), bool),
         jnp.ones((B,), bool)),
    )
    X = 0.5 * (X + jnp.swapaxes(X, 1, 2))
    return SteinResult(X, ok & done, iters)
