"""Kronecker-structured linear algebra: ``A ⊗ B`` and ``A ⊕ B``
without ever materializing the big matrix.

The Kronecker identities (row-major ``vec``: ``x = ravel(X)``):

    (A ⊗ B) vec(X) = vec(A X Bᵀ)
    (A ⊗ B)⁻¹      = A⁻¹ ⊗ B⁻¹
    (A ⊗ B)⁺       = A⁺ ⊗ B⁺
    A ⊕ B = A ⊗ Iₙ + Iₘ ⊗ B,  (A ⊕ B) vec(X) = vec(A X + X Bᵀ)

turn O((mn)³) dense work on the mn×mn product operator into O(m³+n³)
work on the factors — the 2D separable-PDE shape class (a discrete
Laplacian on an m×n grid IS ``T_m ⊕ T_n``), covariance models
(``Σ_row ⊗ Σ_col``), and multilinear least squares.  Everything here
composes the framework's existing batched kernels (``dispatch.solve``
with its custom VJP, ``lstsq``, ``sylvester``), so the whole family is
differentiable and flag-honest for free.

No counterpart in the reference (dense-only); the device-side
generalization of its block-structure exploitation (reference
planner's Dulmage–Mendelsohn block decomposition — same idea, product
structure instead of sparsity structure).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import dispatch
from .lstsq import lstsq_batched
from .sylvester import sylvester_batched

_HIGH = jax.lax.Precision.HIGHEST


def kron_batched(a: jax.Array, b: jax.Array) -> jax.Array:
    """Materialized ``A ⊗ B`` ([B, m·n, p·q]) — for tests and small
    factors; the point of this module is to avoid calling this."""
    B, m, p = a.shape
    _, n, q = b.shape
    out = jnp.einsum("bij,bkl->bikjl", a, b)
    return out.reshape(B, m * n, p * q)


@jax.jit
def kron_matvec_batched(
    a: jax.Array, b: jax.Array, x: jax.Array
) -> jax.Array:
    """``(A ⊗ B) x`` for ``a [B,m,p]``, ``b [B,n,q]``, ``x [B, p·q]``
    (or ``[B, p·q, k]`` for multiple vectors) — two GEMMs."""
    B, m, p = a.shape
    _, n, q = b.shape
    vec = x.ndim == 2
    X = (x[..., None] if vec else x)
    k = X.shape[-1]
    X = X.reshape(B, p, q, k)
    Y = jnp.einsum("bij,bjqk->biqk", a, X, precision=_HIGH)
    Y = jnp.einsum("blq,biqk->bilk", b, Y, precision=_HIGH)
    out = Y.reshape(B, m * n, k)
    return out[..., 0] if vec else out


def kron_solve_batched(a: jax.Array, b: jax.Array, c: jax.Array):
    """Solve ``(A ⊗ B) x = c`` (``a [B,m,m]``, ``b [B,n,n]``,
    ``c [B, m·n]`` or ``[B, m·n, k]``) as ``X = A⁻¹ C̃ B⁻ᵀ`` — two
    m/n-sized solves instead of one (mn)³ solve.  Differentiable
    through the solve VJPs."""
    B, m, _ = a.shape
    _, n, _ = b.shape
    vec = c.ndim == 2
    C = (c[..., None] if vec else c)
    k = C.shape[-1]
    # [B, m, n, k] -> solve over the m axis with A, the n axis with B.
    C = C.reshape(B, m, n * k)
    Y = dispatch.solve_batched(a, C, backend="xla")       # A⁻¹ C̃
    Y = Y.reshape(B, m, n, k).transpose(0, 2, 1, 3).reshape(
        B, n, m * k
    )
    Z = dispatch.solve_batched(b, Y, backend="xla")       # B⁻¹ (·)ᵀ
    Z = Z.reshape(B, n, m, k).transpose(0, 2, 1, 3).reshape(
        B, m * n, k
    )
    return Z[..., 0] if vec else Z


def kron_lstsq_batched(a: jax.Array, b: jax.Array, c: jax.Array):
    """Least-squares / minimum-norm solve of ``(A ⊗ B) x ≈ c`` for
    full-rank rectangular factors (``a [B,ma,na]``, ``b [B,mb,nb]``,
    ``c [B, ma·mb]``): ``(A ⊗ B)⁺ = A⁺ ⊗ B⁺``, so two small lstsq
    passes replace the (ma·mb)×(na·nb) problem.  Returns ``(x, ok)``."""
    B, ma, na = a.shape
    _, mb, nb = b.shape
    vec = c.ndim == 2
    C = (c[..., None] if vec else c)
    k = C.shape[-1]
    C = C.reshape(B, ma, mb * k)
    r1 = lstsq_batched(a, C)
    Y = r1.x.reshape(B, na, mb, k).transpose(0, 2, 1, 3).reshape(
        B, mb, na * k
    )
    r2 = lstsq_batched(b, Y)
    Z = r2.x.reshape(B, nb, na, k).transpose(0, 2, 1, 3).reshape(
        B, na * nb, k
    )
    x = Z[..., 0] if vec else Z
    return x, r1.ok & r2.ok


class KronSumResult(NamedTuple):
    x: jax.Array   # [B, m·n] (or [B, m·n, k])
    ok: jax.Array  # [B] — the pencil was solvable (no λᵢ(A) + μⱼ(B)
    #                near zero; from the Sylvester defect flag)


def kronsum_solve_batched(
    a: jax.Array, b: jax.Array, c: jax.Array
) -> KronSumResult:
    """Solve ``(A ⊕ B) x = c`` — the Kronecker-SUM system
    ``(A ⊗ Iₙ + Iₘ ⊗ B) x = c`` that separable 2D operators produce —
    via the equivalent Sylvester equation ``A X + X Bᵀ = C``
    (O(m³ + n³) through one Schur pass per factor).  Solvable iff no
    eigenvalue sum ``λᵢ(A) + μⱼ(B)`` vanishes; flagged per lane."""
    B, m, _ = a.shape
    _, n, _ = b.shape
    vec = c.ndim == 2
    C = (c[..., None] if vec else c)
    k = C.shape[-1]
    if k != 1:
        raise ValueError(
            "kronsum_solve supports one right-hand side per lane "
            f"(got k={k}); fold extra RHS into the batch."
        )
    Cm = C.reshape(B, m, n)
    res = sylvester_batched(a, jnp.swapaxes(b, 1, 2), Cm)
    # The Sylvester ok flags eigensolve health, not pencil
    # singularity (a vanishing λᵢ(A) + μⱼ(B) just makes the shifted
    # solve blow up) — gate on the TRUE equation residual.
    r = (
        jnp.einsum("bij,bjk->bik", a, res.X, precision=_HIGH)
        + jnp.einsum("bik,bjk->bij", res.X, b, precision=_HIGH)
        - Cm
    )
    # Gate relative to ‖C‖, NOT ‖X‖: a (near-)singular pencil returns
    # a huge X whose giant A·X / X·Bᵀ terms cancel — the residual looks
    # tiny against ‖X‖ while the equation is not actually satisfied.
    # ok therefore means "the returned x reproduces c to 1e-3"; lanes
    # whose f32 cancellation error exceeds that (sep(A, −B) ≲ 1e3·eps)
    # are honestly flagged even when mathematically solvable.
    cnorm = jnp.maximum(jnp.max(jnp.abs(Cm), axis=(1, 2)), 1e-30)
    resid_ok = jnp.max(jnp.abs(r), axis=(1, 2)) <= 1e-3 * cnorm
    x = res.X.reshape(B, m * n, 1)
    return KronSumResult(x[..., 0] if vec else x, res.ok & resid_ok)
