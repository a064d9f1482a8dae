"""Batched structured dense families: circulant, Hankel, Vandermonde.

Extends the structured-operator surface (``ops.toeplitz``,
``ops.banded``) with three classical families whose structure admits
asymptotically faster-than-LU algorithms:

- **Circulant** ``C(c)[i, j] = c[(i - j) mod n]``: diagonalized by the
  DFT, so matvec AND exact solve are O(n log n) — one FFT division, no
  iteration (this is the exact counterpart of the Strang preconditioner
  in ``ops.toeplitz``, which *approximates* a Toeplitz matrix by a
  circulant).
- **Hankel** ``H[i, j] = h[i + j]``: anti-diagonal constant.  ``H = T·J``
  for the reversal ``J`` and a Toeplitz ``T``, so both matvec and solve
  reduce to the Toeplitz machinery via one argument/result flip.
- **Vandermonde** ``V(x)[i, j] = x_i**j``: solved in O(n²) — not
  O(n³) — by the Björck–Pereyra recurrences (Newton divided differences
  + synthetic division for ``V a = f``; the transposed elementary steps
  in reverse order for ``Vᵀ w = b``).  For mildly ill-conditioned nodes
  BP is famously *more* accurate than generic LU because every
  intermediate is a difference quotient of the data.  The MONOMIAL
  target basis is exponentially ill-conditioned, though: past n ≈ 16
  the coefficients of a random-data interpolant exceed f32's useful
  range (measured: |a|max ~ 1e7 and O(1) interpolation residuals at
  n = 24, identical on CPU and TPU — conditioning, not a backend
  artifact), and past n ≈ 30 the intermediates overflow outright
  (flagged).  Large-n polynomial work belongs in a Chebyshev /
  barycentric basis, not a Vandermonde solve.

The reference has no structured families at all (its scaling axis is
sparsity, SURVEY.md §5); these are TPU-native additions in the same
spirit as its `to_block_matrix` blocking (`reference
linalg_solver/linalg.py:347-407`): exploit structure for asymptotic
wins.  All entry points are batched ``[B, ...]``, jitted, and carry
per-lane honesty flags (``ok``) where the algorithm can fail
(near-singular circulant symbol, coincident Vandermonde nodes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls
from .toeplitz import toeplitz_matvec_batched, toeplitz_solve_batched


# ---------------------------------------------------------------------------
# Circulant
# ---------------------------------------------------------------------------


class CirculantSolve(NamedTuple):
    """``x`` solves ``C(c) x = b`` where ``ok``; lanes with a
    near-singular symbol (some ``|fft(c)_k|`` at roundoff relative to
    the largest) report ``ok=False`` and a mode-clamped pseudo-solve."""

    x: jax.Array  # [B, n]
    ok: jax.Array  # [B] bool


def circulant_dense_batched(c: jax.Array) -> jax.Array:
    """Materialize ``[B, n, n]`` with ``C[i, j] = c[(i - j) mod n]``
    (tests / small fallback)."""
    n = c.shape[-1]
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    return jnp.take(c, (i - j) % n, axis=-1)


@jax.jit
def circulant_matvec_batched(c: jax.Array, v: jax.Array) -> jax.Array:
    """``C(c) @ v`` in O(n log n): circular convolution by FFT."""
    out = jnp.fft.ifft(jnp.fft.fft(c) * jnp.fft.fft(v), axis=-1)
    return jnp.real(out).astype(v.dtype)


@functools.partial(jax.jit, static_argnames=("rtol",))
def circulant_solve_batched(
    c: jax.Array, b: jax.Array, rtol: float = 1e-6
) -> CirculantSolve:
    """Exact circulant solve ``x = ifft(fft(b) / fft(c))``.

    Eigenvalues of ``C(c)`` ARE the DFT of ``c``; a lane is flagged
    ``ok=False`` when its smallest symbol magnitude falls below
    ``rtol`` times its largest (numerically singular).  Flagged lanes
    still return a usable regularized solve: near-zero modes are
    clamped (matching ``ops.toeplitz.strang_precond``'s convention)
    rather than amplified to Inf/NaN.
    """
    f_c = jnp.fft.fft(c)
    f_b = jnp.fft.fft(b)
    mag = jnp.abs(f_c)
    big = jnp.max(mag, axis=-1, keepdims=True)
    ok = jnp.min(mag, axis=-1) > rtol * big[..., 0]
    f_c_safe = jnp.where(mag <= rtol * big, 1.0, f_c)
    x = jnp.real(jnp.fft.ifft(f_b / f_c_safe, axis=-1)).astype(b.dtype)
    return CirculantSolve(x=x, ok=ok)


# ---------------------------------------------------------------------------
# Hankel
# ---------------------------------------------------------------------------


def _hankel_toeplitz_args(c: jax.Array, r: jax.Array):
    """The Toeplitz ``T`` with ``H(c, r) = T · J`` (``J`` = reversal):
    ``T[i, k] = h[n-1 + i - k]`` ⇒ first column = last Hankel row
    ``r``, first row = reversed first Hankel column."""
    return r, c[:, ::-1]


def hankel_dense_batched(c: jax.Array, r: jax.Array) -> jax.Array:
    """Materialize ``[B, n, n]`` with ``H[i, j] = h[i + j]`` from the
    first column ``c = h[0:n]`` and last row ``r = h[n-1:2n-1]``
    (``r[:, 0]`` must equal ``c[:, -1]``) — scipy.linalg.hankel's
    convention, batched."""
    n = c.shape[-1]
    h = jnp.concatenate([c, r[:, 1:]], axis=-1)  # [B, 2n-1]
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    return jnp.take(h, i + j, axis=-1)


@jax.jit
def hankel_matvec_batched(
    c: jax.Array, r: jax.Array, v: jax.Array
) -> jax.Array:
    """``H(c, r) @ v`` in O(n log n) via the Toeplitz embedding:
    ``H v = T (J v)``."""
    tc, tr = _hankel_toeplitz_args(c, r)
    return toeplitz_matvec_batched(tc, tr, v[:, ::-1])


@functools.partial(
    jax.jit,
    static_argnames=("tol", "restart", "max_restarts", "precond"),
)
def hankel_solve_batched(
    c: jax.Array,
    r: jax.Array,
    b: jax.Array,
    tol=None,
    restart: int = 32,
    max_restarts: int = 16,
    precond: bool = True,
):
    """Solve batched Hankel systems ``H(c, r) x = b`` in
    O(n log n · iters): since ``H = T J``, solve ``T y = b`` with the
    Strang-preconditioned GMRES of ``ops.toeplitz`` and reverse the
    result.  Returns a ``KrylovResult`` (same honesty contract)."""
    tc, tr = _hankel_toeplitz_args(c, r)
    res = toeplitz_solve_batched(
        tc, tr, b, tol=tol, restart=restart,
        max_restarts=max_restarts, precond=precond,
    )
    return res._replace(x=res.x[:, ::-1])


# ---------------------------------------------------------------------------
# Vandermonde (Björck–Pereyra)
# ---------------------------------------------------------------------------


class VandermondeSolve(NamedTuple):
    """``x`` solves the Vandermonde system where ``ok``; ``ok=False``
    marks lanes whose nodes are numerically coincident (some divided-
    difference denominator below ``rtol`` × the node spread)."""

    x: jax.Array  # [B, n]
    ok: jax.Array  # [B] bool


def vandermonde_dense_batched(x: jax.Array) -> jax.Array:
    """Materialize ``[B, n, n]`` with ``V[i, j] = x_i**j``."""
    n = x.shape[-1]
    return x[..., :, None] ** jnp.arange(n)[None, None, :]


def _bp_denominator(x: jax.Array, k: jax.Array, mask: jax.Array):
    """``x_i − x_{i−k}`` on masked rows, safe (=1) elsewhere; also the
    masked minimum |den| for the coincident-node flag."""
    den = x - jnp.roll(x, k, axis=-1)
    den_safe = jnp.where(mask, den, 1.0)
    min_abs = jnp.min(
        jnp.where(mask, jnp.abs(den), jnp.inf), axis=-1
    )
    return den_safe, min_abs


@functools.partial(jax.jit, static_argnames=("rtol",))
@f32_matmuls
def vandermonde_solve_batched(
    x: jax.Array, f: jax.Array, rtol: float = 1e-6
) -> VandermondeSolve:
    """Björck–Pereyra primal solve ``V(x) a = f`` in O(n²).

    This IS polynomial interpolation: ``a`` are the monomial
    coefficients of the degree-(n−1) polynomial through
    ``(x_i, f_i)``.  Phase 1 computes Newton divided differences
    (lower-bidiagonal elementary steps ``A_k``); phase 2 converts
    Newton → monomial by synthetic division (upper-bidiagonal steps
    ``B_k``).  Every step is a masked whole-vector update, so the jit
    trace is n static-shape VPU ops per phase.
    """
    dtype = jnp.result_type(x.dtype, jnp.float32)
    x = x.astype(dtype)
    c = f.astype(dtype)
    B, n = x.shape
    idx = jnp.arange(n)

    # Phase 1 — divided differences: for k = 1..n−1,
    #   c[i] ← (c[i] − c[i−1]) / (x[i] − x[i−k])   for i ≥ k.
    def dd_step(k, carry):
        c, min_den = carry
        mask = (idx >= k)[None, :]
        den, step_min = _bp_denominator(x, k, mask)
        upd = (c - jnp.roll(c, 1, axis=-1)) / den
        return jnp.where(mask, upd, c), jnp.minimum(min_den, step_min)

    c, min_den = jax.lax.fori_loop(
        1, n, dd_step, (c, jnp.full((B,), jnp.inf, dtype))
    )

    # Phase 2 — Newton → monomial: for k = n−2..0,
    #   c[j] ← c[j] − x_k · c[j+1]   for k ≤ j ≤ n−2.
    def horner_step(t, c):
        k = n - 2 - t
        xk = jax.lax.dynamic_index_in_dim(x, k, axis=-1)
        mask = ((idx >= k) & (idx <= n - 2))[None, :]
        return jnp.where(mask, c - xk * jnp.roll(c, -1, axis=-1), c)

    c = jax.lax.fori_loop(0, n - 1, horner_step, c)

    spread = jnp.max(x, axis=-1) - jnp.min(x, axis=-1)
    # Coincident nodes OR f32 overflow (BP intermediates grow like the
    # Vandermonde condition number, exponential in n — large-n solves
    # overflow honestly instead of silently returning garbage).
    ok = (min_den > rtol * jnp.maximum(spread, 1e-30)) & jnp.all(
        jnp.isfinite(c), axis=-1
    )
    return VandermondeSolve(x=c.astype(f.dtype), ok=ok)


@functools.partial(jax.jit, static_argnames=("rtol",))
@f32_matmuls
def vandermonde_solve_t_batched(
    x: jax.Array, b: jax.Array, rtol: float = 1e-6
) -> VandermondeSolve:
    """Björck–Pereyra dual solve ``V(x)ᵀ w = b`` in O(n²) (the moment
    problem ``Σ_i w_i x_i**j = b_j``).

    Derivation: the primal factors ``V⁻¹ = B_0…B_{n−2} · A_{n−1}…A_1``
    into elementary bidiagonal steps, so
    ``V⁻ᵀ = A_1ᵀ…A_{n−1}ᵀ · B_{n−2}ᵀ…B_0ᵀ`` — the same two phases with
    each step transposed and the composition order reversed.
    """
    dtype = jnp.result_type(x.dtype, jnp.float32)
    x = x.astype(dtype)
    w = b.astype(dtype)
    B, n = x.shape
    idx = jnp.arange(n)

    # Phase 1 — Bᵀ steps, ascending k = 0..n−2:
    #   w[i] ← w[i] − x_k · w[i−1]   for i ≥ k+1.
    def horner_t_step(k, w):
        xk = jax.lax.dynamic_index_in_dim(x, k, axis=-1)
        mask = (idx >= k + 1)[None, :]
        return jnp.where(mask, w - xk * jnp.roll(w, 1, axis=-1), w)

    w = jax.lax.fori_loop(0, n - 1, horner_t_step, w)

    # Phase 2 — Aᵀ steps, descending k = n−1..1:
    #   u[i] = w[i] / (x_i − x_{i−k})          for i ≥ k
    #   w[i] = u[i] − u[i+1]                   for i ≥ k−1  (u[n] = 0)
    def dd_t_step(t, carry):
        w, min_den = carry
        k = n - 1 - t
        mask_div = (idx >= k)[None, :]
        den, step_min = _bp_denominator(x, k, mask_div)
        u = jnp.where(mask_div, w / den, w)
        up1 = jnp.where(
            (idx <= n - 2)[None, :], jnp.roll(u, -1, axis=-1), 0.0
        )
        mask_sub = (idx >= k - 1)[None, :]
        return (
            jnp.where(mask_sub, u - up1, u),
            jnp.minimum(min_den, step_min),
        )

    w, min_den = jax.lax.fori_loop(
        0, n - 1, dd_t_step, (w, jnp.full((B,), jnp.inf, dtype))
    )

    spread = jnp.max(x, axis=-1) - jnp.min(x, axis=-1)
    ok = (min_den > rtol * jnp.maximum(spread, 1e-30)) & jnp.all(
        jnp.isfinite(w), axis=-1
    )
    return VandermondeSolve(x=w.astype(b.dtype), ok=ok)
