"""Batched fitting/regression utilities over the tuned kernel stack.

Thin, numerically careful compositions — each one is a standard
workhorse that users of a linear-algebra framework expect to find
ready-made rather than re-derive:

- ``ridge_batched`` — Tikhonov-regularized least squares through the
  SPD normal equations ``(AᵀA + λI) x = Aᵀb`` (Cholesky; the λ shift
  bounds κ so the squared conditioning of the normal equations is
  exactly what the regularization already accepts).
- ``tls_batched`` — total least squares (errors-in-variables): the
  right singular vector of ``[A | b]`` for the smallest singular
  value, through ``ops.svd`` (QDWH + eigh).  Per-lane ``ok`` guards
  the classical solvability condition σ_min([A|b]) < σ_min(A).
- ``procrustes_batched`` — orthogonal Procrustes ``min ‖QA − B‖_F``
  over orthogonal Q via the polar factor of ``BAᵀ`` (one QDWH run —
  no SVD needed), with the optimal scalar in ``with_scale`` mode.
- ``subspace_angles_batched`` — principal angles between column
  spaces by the SVD of ``Q₁ᵀQ₂`` with the sin-theta refinement for
  small angles (Knyazev–Argentati), bases from shifted CholeskyQR.

No counterpart in the reference (SURVEY.md §2 — exact solvers only).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


class RidgeResult(NamedTuple):
    x: jax.Array   # [B, n] or [B, n, k]
    ok: jax.Array  # [B]


@jax.jit
@f32_matmuls
def ridge_batched(
    a: jax.Array, b: jax.Array, lam: jax.Array | float
) -> RidgeResult:
    """Tikhonov solve ``argmin ‖Ax − b‖² + λ‖x‖²`` (``λ`` scalar or
    per-lane ``[B]``; b ``[B, m]`` or ``[B, m, k]``)."""
    from .spd import cholesky_solve_batched

    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    B, m, n = a.shape
    lam = jnp.broadcast_to(jnp.asarray(lam, f32), (B,))
    vector_input = b.ndim == 2
    b3 = (b[:, :, None] if vector_input else b).astype(f32)
    gram = jnp.einsum("bmi,bmj->bij", a, a, precision=_HIGH)
    gram = gram + lam[:, None, None] * jnp.eye(n, dtype=f32)
    atb = jnp.einsum("bmi,bmk->bik", a, b3, precision=_HIGH)
    x, ok = cholesky_solve_batched(gram, atb)
    return RidgeResult(x[:, :, 0] if vector_input else x, ok)


class TLSResult(NamedTuple):
    x: jax.Array      # [B, n]
    ok: jax.Array     # [B] TLS solvability (genuine σ-gap + finite x)
    sigma: jax.Array  # [B] smallest singular value of [A | b]


@jax.jit
@f32_matmuls
def tls_batched(a: jax.Array, b: jax.Array) -> TLSResult:
    """Total least squares: perturb BOTH A and b minimally so that
    ``(A + ΔA) x = b + Δb`` is consistent.  Classical SVD solution:
    with ``v`` the right singular vector of ``C = [A | b]`` for
    σ_min, ``x = −v[:n] / v[n]``."""
    from .svd import svd_batched

    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    B, m, n = a.shape
    c = jnp.concatenate([a, b[:, :, None].astype(f32)], axis=2)
    svd = svd_batched(c)
    v = svd.V[:, :, n]               # right vector for σ_min (desc.)
    sig = svd.s[:, n]
    denom = v[:, n]
    ok = (jnp.abs(denom)
          > jnp.finfo(f32).eps * 100.0) & svd.ok
    x = -v[:, :n] / jnp.where(ok, denom, 1.0)[:, None]
    # Solvability: σ_min([A|b]) strictly below σ_min(A) — equal
    # values mean the TLS problem is degenerate.
    svd_a = svd_batched(a)
    ok = ok & (sig < svd_a.s[:, n - 1] * (1.0 - 1e-5))
    return TLSResult(x, ok, sig)


class ProcrustesResult(NamedTuple):
    Q: jax.Array      # [B, n, n] orthogonal
    scale: jax.Array  # [B] optimal scale (1.0 unless with_scale)
    ok: jax.Array     # [B]


@functools.partial(jax.jit, static_argnames=("with_scale",))
@f32_matmuls
def procrustes_batched(
    a: jax.Array,
    b: jax.Array,
    with_scale: bool = False,
) -> ProcrustesResult:
    """Orthogonal Procrustes: the orthogonal ``Q`` minimizing
    ``‖Q A − B‖_F`` is the polar factor of ``B Aᵀ`` — one QDWH polar
    run, no SVD.  ``with_scale`` additionally returns the optimal
    scalar ``s`` for ``‖s·QA − B‖_F``."""
    from .svd import polar_batched

    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    b = b.astype(f32)
    m = jnp.einsum("bik,bjk->bij", b, a, precision=_HIGH)  # B Aᵀ
    pol = polar_batched(m)
    Q = pol.up
    if with_scale:
        # max_s min_Q ‖sQA − B‖: ⟨QA, B⟩ = tr(Qᵀ·BAᵀ) = tr(H).
        num = jnp.einsum("bii->b", pol.H)
        den = jnp.maximum(jnp.sum(a * a, axis=(1, 2)), 1e-30)
        scale = num / den
    else:
        scale = jnp.ones((a.shape[0],), f32)
    return ProcrustesResult(Q, scale, pol.ok)


class SubspaceAngles(NamedTuple):
    angles: jax.Array  # [B, k] radians, ascending
    ok: jax.Array      # [B]


@jax.jit
@f32_matmuls
def subspace_angles_batched(
    u: jax.Array, v: jax.Array
) -> SubspaceAngles:
    """Principal angles between span(u) and span(v)
    (``u [B, n, p]``, ``v [B, n, q]``, k = min(p, q)).  Cosines from
    the SVD of Q₁ᵀQ₂; angles below ~1e-4 are recomputed by the
    SIN-theta formulation (σ of (I − Q₁Q₁ᵀ)Q₂ — Knyazev–Argentati),
    which keeps small angles at full f32 resolution where the cosine
    path loses them to ``acos(1 − ε)`` cancellation."""
    from .orth import orthonormal_columns
    from .svd import svd_batched

    f32 = jnp.result_type(u.dtype, jnp.float32)
    B, n, p = u.shape
    q = v.shape[2]
    k = min(p, q)

    def orth(x):
        nc = x.shape[2]
        pad = jnp.zeros((B, n, n - nc), f32)
        X = jnp.concatenate([x.astype(f32), pad], axis=2)
        gmask = jnp.concatenate(
            [jnp.ones((B, nc), bool), jnp.zeros((B, n - nc), bool)],
            axis=1,
        )
        Q, _ = orthonormal_columns(X, gmask)
        return Q[:, :, :nc]

    Q1 = orth(u)
    Q2 = orth(v)
    m = jnp.einsum("bnp,bnq->bpq", Q1, Q2, precision=_HIGH)
    sv = svd_batched(m)
    cos = jnp.clip(sv.s[:, :k], 0.0, 1.0)
    # sin-theta for the small-angle tail
    proj = Q2 - jnp.einsum(
        "bnp,bpq->bnq", Q1, m, precision=_HIGH
    )
    sv_sin = svd_batched(proj)
    sin_all = sv_sin.s                      # descending, length q
    # match: cos descending ⇔ angle ascending ⇔ sin ascending — take
    # the q-k..end ascending tail of sin σ's reversed.
    sin = jnp.clip(sin_all[:, ::-1][:, :k], 0.0, 1.0)
    angles = jnp.where(
        cos > 0.99, jnp.arcsin(sin), jnp.arccos(cos)
    )
    return SubspaceAngles(angles, sv.ok & sv_sin.ok)
