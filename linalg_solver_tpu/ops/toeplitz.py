"""Batched Toeplitz operators: FFT matvec + circulant-preconditioned
Krylov solves.

A Toeplitz matrix is defined by its first column ``c [B, n]`` and first
row ``r [B, n]`` (``r[:, 0]`` must equal ``c[:, 0]``).  Storage is
O(n); the matvec runs in O(n log n) through the standard 2n circulant
embedding (one FFT of the embedding column, reused across matvecs).
Solves compose the matvec with the matrix-free Krylov cores
(``ops.krylov``) under Strang's circulant preconditioner — the
asymptotically optimal circulant approximation, applied in O(n log n)
as one FFT division — which clusters the preconditioned spectrum
around 1 for well-conditioned Toeplitz families and keeps iteration
counts O(1) in n.

All FFT work is complex64 from f32 inputs (XLA lowers batched FFTs
natively on TPU); results return as f32.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls
from .krylov import KrylovResult, cg_matvec, gmres_matvec


def _embed_col(c: jax.Array, r: jax.Array) -> jax.Array:
    """First column of the 2n circulant embedding:
    ``[c_0 … c_{n−1}, 0, r_{n−1} … r_1]``."""
    B, n = c.shape
    return jnp.concatenate(
        [c, jnp.zeros((B, 1), c.dtype), r[:, :0:-1]], axis=1
    )


def toeplitz_matvec_batched(
    c: jax.Array, r: jax.Array, v: jax.Array
) -> jax.Array:
    """``T(c, r) @ v`` in O(n log n) per lane via the circulant
    embedding."""
    n = c.shape[1]
    f_emb = jnp.fft.fft(_embed_col(c, r))
    f_v = jnp.fft.fft(v, n=2 * n, axis=1)
    out = jnp.fft.ifft(f_emb * f_v, axis=1)[:, :n]
    return jnp.real(out).astype(v.dtype)


def make_toeplitz_matvec(c: jax.Array, r: jax.Array):
    """Closure form with the embedding FFT precomputed — feed to the
    ``ops.krylov`` matrix-free solvers."""
    n = c.shape[1]
    f_emb = jnp.fft.fft(_embed_col(c, r))

    def matvec(v):
        f_v = jnp.fft.fft(v, n=2 * n, axis=1)
        return jnp.real(
            jnp.fft.ifft(f_emb * f_v, axis=1)[:, :n]
        ).astype(v.dtype)

    return matvec


def strang_precond(c: jax.Array, r: jax.Array):
    """Strang's circulant preconditioner: copy the central diagonals
    (``|k| ≤ n/2``) into a circulant and invert it in Fourier space.
    Near-zero Fourier symbols are clamped to 1 (those modes pass
    through unpreconditioned rather than exploding)."""
    B, n = c.shape
    k = jnp.arange(n)
    # circulant first column s: s_k = t_{-k} for k ≤ n/2 (i.e. c_k),
    # else t_{n−k} (i.e. r_{n−k}) — the wrapped central band.
    r_wrap = jnp.take(
        r, jnp.where(k == 0, 0, n - k), axis=1
    )
    s = jnp.where((k <= n // 2)[None, :], c, r_wrap)
    f_s = jnp.fft.fft(s)
    mag = jnp.abs(f_s)
    floor = 1e-6 * jnp.max(mag, axis=1, keepdims=True)
    f_s = jnp.where(mag <= floor, 1.0, f_s)

    def precond(v):
        f_v = jnp.fft.fft(v, axis=1)
        return jnp.real(jnp.fft.ifft(f_v / f_s, axis=1)).astype(
            v.dtype
        )

    return precond


def toeplitz_dense_batched(c: jax.Array, r: jax.Array) -> jax.Array:
    """Materialize [B, n, n] (tests / small fallback)."""
    n = c.shape[1]
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    d = i - j
    from_c = jnp.take(c, jnp.clip(d, 0, n - 1), axis=1)
    from_r = jnp.take(r, jnp.clip(-d, 0, n - 1), axis=1)
    return jnp.where((d >= 0)[None], from_c, from_r)


@functools.partial(
    jax.jit,
    static_argnames=("spd", "tol", "restart", "max_restarts", "precond"),
)
@f32_matmuls
def toeplitz_solve_batched(
    c: jax.Array,
    r: jax.Array,
    b: jax.Array,
    spd: bool = False,
    tol: Optional[float] = None,
    restart: int = 32,
    max_restarts: int = 16,
    precond: bool = True,
) -> KrylovResult:
    """Solve batched Toeplitz systems ``T(c, r) x = b`` in
    O(n log n · iters): Strang-preconditioned GMRES (or CG with
    ``spd=True`` for symmetric positive definite T, where ``r = c``).
    Same honesty contract as ``ops.krylov`` (per-lane ``converged`` +
    true relative residuals)."""
    dtype = jnp.result_type(c.dtype, jnp.float32)
    c = c.astype(dtype)
    r = r.astype(dtype)
    matvec = make_toeplitz_matvec(c, r)
    M = strang_precond(c, r) if precond else None
    if spd:
        return cg_matvec(matvec, b, tol=tol, precond=M)
    return gmres_matvec(
        matvec, b, tol=tol, restart=restart,
        max_restarts=max_restarts, precond=M,
    )
