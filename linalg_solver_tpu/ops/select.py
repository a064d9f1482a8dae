"""Row selection as MXU one-hot matmuls.

XLA lowers ``jnp.take_along_axis`` on TPU to a scalar gather that runs
~14× below the equivalent one-hot matmul (measured on v5e: 0.68 ms for a
[256,256,256] f32 row gather, 0.65 ms even for a [256,256,1] RHS, vs
~0.05 ms as a one-hot GEMM).  Every hot-path value gather in the
framework goes through here instead.

Precision: one-hot selection must be EXACT, and the cheapest exact form
is a MIXED-precision dot — the one-hot operand cast to bf16 (0/1 is
exactly representable) against f32 values at ``HIGHEST`` precision.  XLA
then decomposes only the f32 side into its bf16x3 split, giving
``oh·(B1+B2+B3)`` — the full 24 mantissa bits — in 3 MXU passes.
Measured on v5e ([256,256,256]·[256,256,192]): 0.022 ms, bit-exact,
vs 0.158 ms for the same dot with an f32 one-hot under ambient 6-pass
``float32`` precision (which burns 3 extra passes on the one-hot's zero
bf16 residuals).

Two formulations that do NOT work: 3-pass ``HIGH`` on f32×f32 keeps only
``A1B1+A1B2+A2B1`` — a one-hot left operand picks up just 16 of the 24
mantissa bits (measured: LU solve residual 2.6e-7 → 5.5e-6); and an
explicit ``Σ dot(oh, bf16ᵢ(x))`` split — XLA's simplifier folds it back
into ``dot(oh, Σbf16ᵢ(x))`` with a bf16 add (single-pass accuracy), and
the materialized split operands add HBM traffic even behind an
optimization barrier.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def onehot_rows(rows: jax.Array, n: int, dtype=jnp.bfloat16) -> jax.Array:
    """``[B, m, n]`` one-hot row-selection operator for ``rows [B, m]``."""
    return (
        rows[:, :, None]
        == jnp.arange(n, dtype=rows.dtype)[None, None, :]
    ).astype(dtype)


def onehot_matmul(oh: jax.Array, src: jax.Array) -> jax.Array:
    """Exact batched ``oh @ src`` for a 0/1 ``oh [B, m, n]`` (bf16) and
    ``src [B, n, k]``: mixed-precision HIGHEST dot (3 MXU passes)."""
    if src.dtype != jnp.float32:
        return oh.astype(src.dtype) @ src
    return lax.dot_general(
        oh, src,
        (((2,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def take_rows_mxu(src: jax.Array, rows: jax.Array) -> jax.Array:
    """Batched row gather ``src[b, rows[b], :]`` for ``src [B, n, k]``,
    ``rows [B, m]`` → ``[B, m, k]``, as one exact one-hot GEMM."""
    return onehot_matmul(onehot_rows(rows, src.shape[1]), src)


def take_cols_mxu(src: jax.Array, cols: jax.Array) -> jax.Array:
    """Batched column gather ``src[b, :, cols[b]]`` for ``src [B, k, n]``,
    ``cols [B, m]`` → ``[B, k, m]`` — the transposed-storage counterpart
    of ``take_rows_mxu`` (same exact mixed-precision trick, one-hot on
    the right)."""
    oh = onehot_rows(cols, src.shape[2])
    if src.dtype != jnp.float32:
        return src @ oh.astype(src.dtype).swapaxes(1, 2)
    return lax.dot_general(
        src, oh,
        (((2,), (2,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
