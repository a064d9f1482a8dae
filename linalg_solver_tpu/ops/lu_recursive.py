"""Log-depth GEMM recursion for pivot-free inversion/factorization.

The no-pivot Pallas panel kernel removed the pivot *search* but kept
the sequential column walk: N in-kernel steps whose per-step Mosaic
machinery floors the factor time (STATUS ceiling model).  This module
removes the walk itself.  With pivoting gone (the caller guarantees
stability via random butterfly preconditioning, ``ops.rbt``), the
inverse of a dense matrix factors as a RECURSION OF BATCHED GEMMs:

    A = [[A11, A12],          inv(A) = [[iA11 + P iS Q, -P iS],
         [A21, A22]]                    [-iS Q,          iS   ]]

with ``P = iA11 A12``, ``Q = A21 iA11``, ``S = A22 - A21 P`` (the
Schur complement) and ``iS = inv(S)`` — five GEMMs per node, two
recursive calls.  Sequential scalar work survives only at the
``leaf``-sized base case, a fully-unrolled Gauss-Jordan whose steps
are fused elementwise XLA ops; everything else is MXU work at the
caller's matmul precision.  Total work ~``10/3 n³`` multiply-adds vs
no-pivot LU's ``n³/3`` — a 10x arithmetic premium traded for the MXU's
~2-order throughput advantage over the VPU column walk, and paid at
``bfloat16`` when the caller (``ops.rbt``) refines against the
original system anyway.

Depth of the dependency chain: ``n/leaf`` leaf eliminations of
``leaf`` unrolled steps each, interleaved with ``log2(n/leaf)`` GEMM
levels — vs the kernel's ``n`` full-machinery column steps.

No counterpart in the reference (exact rational arithmetic needs no
pivoting and no conditioning); this is the TPU-native shape of
"restructure the dependency chain into dense matmuls".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _leaf_inverse(a: jax.Array):
    """Unrolled no-pivot Gauss-Jordan inverse of ``[B, k, k]`` (small
    static ``k``).  Returns ``(inv, ok)``; ``ok [B]`` is False where a
    diagonal pivot was exactly zero (the caller's residual gate catches
    near-zero growth).  Every step is a fused elementwise pass over the
    ``[B, k, 2k]`` work array — no dynamic slicing, no kernel."""
    B, k, _ = a.shape
    dtype = a.dtype
    eye = jnp.broadcast_to(jnp.eye(k, dtype=dtype), (B, k, k))
    w = jnp.concatenate([a, eye], axis=-1)            # [B, k, 2k]
    rows = jnp.arange(k)[None, :, None]               # [1, k, 1]
    ok = jnp.ones((B,), bool)
    for c in range(k):
        pv = w[:, c, c]                               # [B]
        has = jnp.abs(pv) > 0.0
        ok = ok & has
        inv = 1.0 / jnp.where(has, pv, 1.0)
        prow = w[:, c, :] * inv[:, None]              # [B, 2k]
        f = jnp.where(rows[:, :, 0] == c, 0.0, w[:, :, c])
        w = w - f[:, :, None] * prow[:, None, :]
        w = jnp.where(rows == c, prow[:, None, :], w)
    return w[:, :, k:], ok


def _inv_rec(a: jax.Array, leaf: int):
    n = a.shape[-1]
    if n <= leaf:
        return _leaf_inverse(a)
    h = n // 2
    a11, a12 = a[:, :h, :h], a[:, :h, h:]
    a21, a22 = a[:, h:, :h], a[:, h:, h:]
    ia11, ok1 = _inv_rec(a11, leaf)
    p = ia11 @ a12                                    # iA11 A12
    q = a21 @ ia11                                    # A21 iA11
    s = a22 - a21 @ p                                 # Schur complement
    is_, ok2 = _inv_rec(s, leaf)
    bl = -(is_ @ q)
    tr = -(p @ is_)
    tl = ia11 - p @ bl                                # iA11 + P iS Q
    top = jnp.concatenate([tl, tr], axis=-1)
    bot = jnp.concatenate([bl, is_], axis=-1)
    return jnp.concatenate([top, bot], axis=-2), ok1 & ok2


@functools.partial(jax.jit, static_argnames=("leaf",))
def inverse_nopivot_recursive(a: jax.Array, leaf: int = 16):
    """Batched dense inverse WITHOUT pivoting by log-depth Schur
    recursion — all batched GEMMs above the ``leaf``-sized unrolled
    Gauss-Jordan base case.

    Only stable when every leading principal minor is well-conditioned;
    callers make that true with random butterfly preconditioning
    (``ops.rbt``) and gate per-lane on a residual.  Returns
    ``(inv, ok)`` with ``ok [B]`` False where any leaf pivot was
    exactly zero.  GEMMs run at the ambient
    ``jax.default_matmul_precision``."""
    assert a.ndim == 3 and a.shape[-1] == a.shape[-2]
    assert leaf >= 1
    return _inv_rec(a, leaf)
