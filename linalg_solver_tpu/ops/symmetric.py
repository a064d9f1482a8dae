"""Symmetric/Hermitian eigensolver path.

The reference computes eigenvalues through the characteristic
polynomial regardless of structure (reference linalg.py:424-480); a
production device framework must special-case symmetric input — the
spectral theorem gives orthogonal eigenvectors (P⁻¹ = Pᵀ exactly, no
inverse solve), every matrix is diagonalizable, and the dedicated
solver is both faster and more accurate than general Francis QR.

``eigh_batched`` wraps XLA's batched symmetric eigensolver under the
framework's f32 matmul-precision contract.  ``is_symmetric_batched``
is the cheap structure probe ``spectral_pipeline(method="auto")`` uses
to route.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls


class EighResult(NamedTuple):
    """Ascending eigenvalues and orthonormal eigenvectors:
    ``a = V @ diag(w) @ Vᵀ``, column i of V pairs with w[:, i]."""

    w: jax.Array          # [B, n]
    V: jax.Array          # [B, n, n] orthogonal
    converged: jax.Array  # [B] (always True — direct solver)


@jax.jit
@f32_matmuls
def eigh_batched(a: jax.Array) -> EighResult:
    """Eigendecomposition of a batched SYMMETRIC real matrix.

    Input is symmetrized as ``(a + aᵀ)/2`` first (cheap, and makes the
    routine well-defined on numerically-almost-symmetric input the
    ``auto`` router admits).  Cost is one XLA `eigh` per lane — on TPU
    a QDWH/Jacobi-style direct solver that is far cheaper than the
    general real-Schur iteration and returns exactly orthogonal
    eigenvectors.
    """
    B = a.shape[0]
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    sym = (a + jnp.swapaxes(a, 1, 2)) * 0.5
    w, V = jnp.linalg.eigh(sym)
    return EighResult(w, V, jnp.ones((B,), bool))


@jax.jit
def symmetry_defect_batched(a: jax.Array) -> jax.Array:
    """``max|a - aᵀ| / max|a|`` per lane — 0 for exactly symmetric."""
    skew = jnp.max(jnp.abs(a - jnp.swapaxes(a, 1, 2)), axis=(1, 2))
    scale = jnp.maximum(jnp.max(jnp.abs(a), axis=(1, 2)), 1e-30)
    return skew / scale


def is_symmetric_batched(a: jax.Array, tol: float = 1e-6) -> jax.Array:
    """[B] bool: relative symmetry defect ≤ tol."""
    return symmetry_defect_batched(a) <= tol
