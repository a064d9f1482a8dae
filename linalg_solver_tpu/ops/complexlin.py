"""Batched COMPLEX dense linear algebra on the real kernels.

TPUs have no complex MXU datatype; XLA lowers complex ops to real
pairs op-by-op, which bypasses this framework's tuned solvers.
Instead these wrappers embed ``M = X + iY`` as the real ``2n × 2n``
matrix ``[[X, −Y], [Y, X]]`` (an algebra isomorphism: products, sums,
inverses and solves commute with the embedding) and run the
framework's REAL batched paths — the blocked/Pallas LU solve, the
Gauss–Jordan inverse, the LU determinant — at 4× the real flops (the
embedding's cost; XLA's own complex lowering pays the same 4
real GEMMs).

Input/output convention: complex data as (re, im) array pairs — the
same re/im-arithmetic convention as the eigensolver's strevc kernel
(``ops.schur``), avoiding complex64 layouts on the device entirely.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _embed(re: jax.Array, im: jax.Array) -> jax.Array:
    """[B, n, n] pair → [B, 2n, 2n] real embedding [[X, −Y], [Y, X]]."""
    top = jnp.concatenate([re, -im], axis=2)
    bot = jnp.concatenate([im, re], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def solve_complex_batched(
    a_re: jax.Array, a_im: jax.Array,
    b_re: jax.Array, b_im: jax.Array,
    backend: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Solve complex square systems ``(A_re + i·A_im) x = b_re + i·b_im``
    (``b`` vectors ``[B, n]``); returns ``(x_re, x_im)``."""
    from . import dispatch

    n = a_re.shape[-1]
    M = _embed(a_re, a_im)
    rhs = jnp.concatenate([b_re, b_im], axis=1)
    x = dispatch.solve_batched(M, rhs, backend=backend)
    return x[:, :n], x[:, n:]


def inverse_complex_batched(
    a_re: jax.Array, a_im: jax.Array, backend: str = "auto"
) -> Tuple[jax.Array, jax.Array]:
    """Inverse of complex batches; returns ``(inv_re, inv_im)``."""
    from . import dispatch

    n = a_re.shape[-1]
    inv = dispatch.inverse_batched(_embed(a_re, a_im), backend=backend)
    # inv is the embedding of A⁻¹: read off its blocks.
    return inv[:, :n, :n], inv[:, n:, :n]


def det_complex_batched(
    a_re: jax.Array, a_im: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Complex determinant; returns ``(det_re, det_im)``.

    ``det(embed(M)) = |det(M)|²`` loses the phase, so the determinant
    cannot reuse the real embedding; it is computed directly by one
    pivoted complex Gauss elimination in re/im arithmetic — an O(n³)
    loop kept simple because complex determinants are a cold path."""
    B, n, _ = a_re.shape
    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    re = a_re.astype(f32)
    im = a_im.astype(f32)
    rows = jnp.arange(n)

    def body(k, st):
        re, im, dre, dim_, ok = st
        # partial pivot by |entry|² in column k, rows ≥ k
        mag = re[:, :, k] ** 2 + im[:, :, k] ** 2
        masked = jnp.where(rows[None, :] >= k, mag, -1.0)
        p = jnp.argmax(masked, axis=1)
        has = jnp.take_along_axis(masked, p[:, None], 1)[:, 0] > 0
        ok = ok & has
        do_swap = has & (p != k)
        oh_k = (rows[None, :] == k).astype(f32)
        oh_p = (rows[None, :] == p[:, None]).astype(f32)

        def swap(M):
            row_k = jnp.einsum("bn,bnk->bk", oh_k, M)
            row_p = jnp.einsum("bn,bnk->bk", oh_p, M)
            delta = (row_k - row_p) * do_swap[:, None].astype(f32)
            return (
                M
                - oh_k[:, :, None] * delta[:, None, :]
                + oh_p[:, :, None] * delta[:, None, :]
            )

        re, im = swap(re), swap(im)
        sgn = jnp.where(do_swap, -1.0, 1.0)
        pre = re[:, k, k]
        pim = im[:, k, k]
        # det *= sign · pivot (complex multiply)
        dre, dim_ = (
            sgn * (dre * pre - dim_ * pim),
            sgn * (dre * pim + dim_ * pre),
        )
        den = jnp.where(has, pre * pre + pim * pim, 1.0)[:, None]
        below = (rows[None, :] > k) & has[:, None]
        # factor = a[i,k] / pivot (complex divide)
        fre = (
            re[:, :, k] * pre[:, None] + im[:, :, k] * pim[:, None]
        ) / den
        fim = (
            im[:, :, k] * pre[:, None] - re[:, :, k] * pim[:, None]
        ) / den
        fre = jnp.where(below, fre, 0.0)
        fim = jnp.where(below, fim, 0.0)
        prow_re = re[:, k, :]
        prow_im = im[:, k, :]
        re = re - (
            fre[:, :, None] * prow_re[:, None, :]
            - fim[:, :, None] * prow_im[:, None, :]
        )
        im = im - (
            fre[:, :, None] * prow_im[:, None, :]
            + fim[:, :, None] * prow_re[:, None, :]
        )
        return re, im, dre, dim_, ok

    init = (
        re, im,
        jnp.ones((B,), f32), jnp.zeros((B,), f32),
        jnp.ones((B,), bool),
    )
    re, im, dre, dim_, ok = jax.lax.fori_loop(0, n, body, init)
    return jnp.where(ok, dre, 0.0), jnp.where(ok, dim_, 0.0)
