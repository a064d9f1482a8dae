"""Batched matrix sign function and spectral counting.

``sign(A)`` (Roberts): the matrix function that maps every eigenvalue
to ±1 by the sign of its real part while preserving invariant
subspaces.  It is the classic building block of spectral divide and
conquer — from it come eigenvalue counts in half-planes and spectral
projectors, with only inverses and GEMMs (no QR iteration), which is
why it scales: every step of the scaled Newton iteration

    X ← (μX + (μX)⁻¹) / 2,   μ = |det X|^{-1/n}   (determinantal
                                                    scaling)

is one batched inverse + elementwise work, quadratically convergent.
Requires no eigenvalues on the imaginary axis (the function is not
defined there); lanes that fail to converge are flagged.

``eig_count_left_batched`` counts eigenvalues with Re λ < σ via
``(n − tr sign(A − σI))/2`` — an O(n³·iters) spectrum bisection tool
that never computes the eigenvalues themselves.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


class SignResult(NamedTuple):
    S: jax.Array          # [B, n, n] with S² ≈ I
    converged: jax.Array  # [B] ‖S² − I‖ below tolerance
    iters: jax.Array      # [] i32 — Newton steps executed


@functools.partial(jax.jit, static_argnames=("max_iters",))
@f32_matmuls
def sign_batched(a: jax.Array, max_iters: int = 40) -> SignResult:
    """Matrix sign of a batched real matrix with no eigenvalues on the
    imaginary axis."""
    B, n, _ = a.shape
    f32 = jnp.result_type(a.dtype, jnp.float32)
    X0 = a.astype(f32)
    eye = jnp.eye(n, dtype=f32)
    eps = float(jnp.finfo(f32).eps)

    def err(X):
        R = jnp.einsum("bij,bjk->bik", X, X, precision=_HIGH) - eye
        return jnp.max(jnp.abs(R), axis=(1, 2))

    def cond(st):
        X, k, done = st
        return (k < max_iters) & ~jnp.all(done)

    def body(st):
        X, k, done = st
        # determinantal scaling accelerates the pre-asymptotic phase
        sgn, logabs = jnp.linalg.slogdet(X)
        mu = jnp.exp(-logabs / n)
        mu = jnp.where(jnp.isfinite(mu) & (mu > 0), mu, 1.0)
        Xs = mu[:, None, None] * X
        Xinv = jnp.linalg.inv(Xs)
        X_new = 0.5 * (Xs + Xinv)
        # freeze converged lanes (further steps only stir roundoff)
        X_next = jnp.where(done[:, None, None], X, X_new)
        done = err(X_next) <= 64.0 * n * eps
        return X_next, k + 1, done

    done0 = err(X0) <= 64.0 * n * eps
    X, k, done = jax.lax.while_loop(
        cond, body, (X0, jnp.zeros((), jnp.int32), done0)
    )
    return SignResult(X, done, k)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def eig_count_left_batched(
    a: jax.Array, sigma: float = 0.0, max_iters: int = 40
):
    """[B] number of eigenvalues with ``Re λ < sigma`` per lane (and
    the converged mask) — spectrum bisection without eigensolving."""
    n = a.shape[-1]
    f32 = jnp.result_type(a.dtype, jnp.float32)
    shifted = a.astype(f32) - sigma * jnp.eye(n, dtype=f32)
    res = sign_batched(shifted, max_iters=max_iters)
    tr = jnp.trace(res.S, axis1=1, axis2=2)
    count = jnp.round((n - tr) / 2.0).astype(jnp.int32)
    return count, res.converged


@functools.partial(jax.jit, static_argnames=("max_iters",))
@f32_matmuls
def spectral_projector_batched(
    a: jax.Array, sigma: float = 0.0, max_iters: int = 40
):
    """Spectral projector ``P = (I − sign(A − σI))/2`` onto the
    invariant subspace of eigenvalues with ``Re λ < σ`` (P² = P,
    PA = AP; its rank is the eigenvalue count).  Returns ``(P,
    converged)``."""
    n = a.shape[-1]
    f32 = jnp.result_type(a.dtype, jnp.float32)
    eye = jnp.eye(n, dtype=f32)
    res = sign_batched(
        a.astype(f32) - sigma * eye, max_iters=max_iters
    )
    return 0.5 * (eye[None] - res.S), res.converged
