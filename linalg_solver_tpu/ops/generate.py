"""Structured random matrix batches, generated entirely on device.

Device counterpart of the exact path's ``RandomMatrixBuilder``
(reference random_matrix.py:7-267), batched and ``jax.random``-keyed:

- unconstrained integer-valued batches,
- full-rank by masked rejection (vectorized retries, no host loop),
- prescribed rank r via full-rank ``A[m×r] @ B[r×n]`` products,
- diagonalizable with prescribed eigenvalues via ``P⁻¹ D P``,
- prescribed Jordan structure via ``P⁻¹ J P``,

with unimodular similarity transforms ``P = L·U`` (±1 diagonals) so that
``P⁻¹`` is exactly integer-valued and conditioning stays tame.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

from .lu import det_lu_batched
from .solve import inverse_batched, rank_batched

Array = jax.Array


def _randint(key, shape, lo, hi, dtype):
    return jax.random.randint(key, shape, lo, hi + 1).astype(dtype)


@functools.partial(jax.jit, static_argnames=("b", "m", "n", "lo", "hi", "dtype"))
def random_batch(
    key: Array, b: int, m: int, n: int,
    lo: int = -5, hi: int = 5, dtype=jnp.float32,
) -> Array:
    """iid integer entries in [lo, hi], shape ``[b, m, n]``."""
    return _randint(key, (b, m, n), lo, hi, dtype)


@functools.partial(jax.jit, static_argnames=("b", "n", "dtype", "spread"))
@f32_matmuls
def unimodular_batch(
    key: Array, b: int, n: int, dtype=jnp.float32, spread: int = 1
) -> Array:
    """``L @ U`` with ±1 diagonals: det = ±1, integer inverse."""
    k_ld, k_ud, k_l, k_u = jax.random.split(key, 4)
    sign_l = jax.random.rademacher(k_ld, (b, n)).astype(dtype)
    sign_u = jax.random.rademacher(k_ud, (b, n)).astype(dtype)
    tril = jnp.tril(_randint(k_l, (b, n, n), -spread, spread, dtype), -1)
    triu = jnp.triu(_randint(k_u, (b, n, n), -spread, spread, dtype), 1)
    eye = jnp.eye(n, dtype=dtype)
    L = tril + sign_l[:, :, None] * eye
    U = triu + sign_u[:, :, None] * eye
    return L @ U


@functools.partial(
    jax.jit, static_argnames=("b", "n", "lo", "hi", "dtype", "max_tries")
)
def full_rank_batch(
    key: Array, b: int, n: int,
    lo: int = -5, hi: int = 5, dtype=jnp.float32, max_tries: int = 8,
) -> Array:
    """Regular n×n batch by masked rejection: resample only the batch
    elements whose determinant vanishes (vectorized, no host loop)."""
    def body(i, carry):
        out, ok, key = carry
        key, sub = jax.random.split(key)
        candidate = _randint(sub, (b, n, n), lo, hi, dtype)
        det = det_lu_batched(candidate)
        good = jnp.abs(det) > 0.5  # integer dets: nonzero means >= 1
        take = ~ok & good
        out = jnp.where(take[:, None, None], candidate, out)
        return out, ok | good, key

    init = (jnp.zeros((b, n, n), dtype), jnp.zeros((b,), bool), key)
    out, ok, _ = jax.lax.fori_loop(0, max_tries, body, init)
    # Fallback for (astronomically unlikely) never-successful elements.
    return jnp.where(ok[:, None, None], out, jnp.eye(n, dtype=dtype))


@functools.partial(
    jax.jit,
    static_argnames=("b", "m", "n", "r", "lo", "hi", "dtype", "max_tries"),
)
@f32_matmuls
def rank_batch(
    key: Array, b: int, m: int, n: int, r: int,
    lo: int = -5, hi: int = 5, dtype=jnp.float32, max_tries: int = 8,
) -> Array:
    """Batch of m×n matrices of rank exactly r: products of full-column-rank
    ``[m, r]`` and full-row-rank ``[r, n]`` factors (masked rejection)."""
    def gen_factor(key, rows, cols):
        def body(i, carry):
            out, ok, key = carry
            key, sub = jax.random.split(key)
            cand = _randint(sub, (b, rows, cols), lo, hi, dtype)
            good = rank_batched(cand) == min(rows, cols)
            take = ~ok & good
            out = jnp.where(take[:, None, None], cand, out)
            return out, ok | good, key

        init = (jnp.zeros((b, rows, cols), dtype), jnp.zeros((b,), bool), key)
        out, ok, _ = jax.lax.fori_loop(0, max_tries, body, init)
        return out, ok

    k1, k2 = jax.random.split(key)
    A, _ = gen_factor(k1, m, r)
    B, _ = gen_factor(k2, r, n)
    return A @ B


@functools.partial(jax.jit, static_argnames=("b", "n", "dtype"))
@f32_matmuls
def orthogonal_batch(key: Array, b: int, n: int, dtype=jnp.float32) -> Array:
    """Batch of Haar-ish random orthogonal matrices (QR of a Gaussian).
    Perfectly conditioned similarity transforms — the right choice for
    large-N structured generation where unimodular inverses blow up."""
    g = jax.random.normal(key, (b, n, n), dtype)
    q, r = jnp.linalg.qr(g)
    # Fix the sign convention so Q is unique given G.
    sign = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    return q * sign[:, None, :]


def _similarity_pair(key, b, n, transform, dtype):
    """(P_inv, P) for the requested transform family."""
    if transform == "orthogonal":
        P = orthogonal_batch(key, b, n, dtype=dtype)
        return jnp.swapaxes(P, -1, -2), P
    P = unimodular_batch(key, b, n, dtype=dtype)
    return inverse_batched(P, tol=1e-30).inverse, P


@functools.partial(jax.jit, static_argnames=("b", "dtype", "transform"))
@f32_matmuls
def diagonalizable_batch(
    key: Array, b: int, eigenvalues: Sequence[float], dtype=jnp.float32,
    transform: str = "unimodular",
) -> Array:
    """Diagonalizable batch with the prescribed (shared) eigenvalue list:
    ``P⁻¹ · diag(eigs) · P``.  ``transform="unimodular"`` (integer-exact,
    small N) or ``"orthogonal"`` (condition-preserving, any N)."""
    eigs = jnp.asarray(eigenvalues, dtype)
    n = eigs.shape[0]
    P_inv, P = _similarity_pair(key, b, n, transform, dtype)
    D = jnp.diag(eigs)
    return P_inv @ D[None, :, :] @ P


def jordan_form_matrix(
    blocks: List[Tuple[float, int]], dtype=jnp.float32
) -> Array:
    """The (single) Jordan-form matrix for ``[(eigenvalue, size), ...]``."""
    import numpy as np

    n = sum(size for _, size in blocks)
    J = np.zeros((n, n), dtype=jnp.dtype(dtype))
    pos = 0
    for eig, size in blocks:
        for i in range(size):
            J[pos + i, pos + i] = eig
            if i < size - 1:
                J[pos + i, pos + i + 1] = 1.0
        pos += size
    return jnp.asarray(J)


@functools.partial(
    jax.jit, static_argnames=("b", "blocks", "dtype", "transform")
)
@f32_matmuls
def jordan_batch(
    key: Array, b: int, blocks: Tuple[Tuple[float, int], ...],
    dtype=jnp.float32, transform: str = "unimodular",
) -> Array:
    """Batch of matrices similar to the prescribed Jordan form:
    ``P⁻¹ J P``.  Use ``transform="orthogonal"`` at large N (a unimodular
    P⁻¹ has exponentially large entries and destroys conditioning)."""
    J = jordan_form_matrix(list(blocks), dtype)
    n = J.shape[0]
    P_inv, P = _similarity_pair(key, b, n, transform, dtype)
    return P_inv @ J[None, :, :] @ P
