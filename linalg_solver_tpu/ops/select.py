"""Row selection as MXU one-hot matmuls.

XLA lowers ``jnp.take_along_axis`` on TPU to a scalar gather that runs
~14× below the equivalent one-hot matmul (measured on v5e: 0.68 ms for a
[256,256,256] f32 row gather, 0.65 ms even for a [256,256,1] RHS, vs
~0.05 ms as a one-hot GEMM).  Every hot-path value gather in the
framework goes through here instead.

Precision requirement: the enclosing jit must trace under float32 matmul
precision (``utils.precision.f32_matmuls``) — the 6-pass algorithm makes
one-hot selection exact (its cross-terms include ``oh·(B1+B2+B3)``, the
full bf16x3 split of the values).  3-pass HIGH is NOT enough: it keeps
only ``A1B1+A1B2+A2B1``, so a one-hot left operand picks up just 16 of
the 24 mantissa bits (measured: LU solve residual degrades 2.6e-7 →
5.5e-6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_rows_mxu(src: jax.Array, rows: jax.Array) -> jax.Array:
    """Batched row gather ``src[b, rows[b], :]`` for ``src [B, n, k]``,
    ``rows [B, m]`` → ``[B, m, k]``, as a one-hot GEMM."""
    n = src.shape[1]
    oh = (
        rows[:, :, None]
        == jnp.arange(n, dtype=rows.dtype)[None, None, :]
    ).astype(src.dtype)
    return oh @ src
