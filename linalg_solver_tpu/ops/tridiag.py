"""Batched tridiagonal solver: parallel cyclic reduction (PCR).

The Thomas algorithm is a length-n sequential recurrence — the worst
possible shape for a vector machine.  PCR instead eliminates the sub-
and super-diagonals in ⌈log₂ n⌉ data-parallel steps: at stride s every
row absorbs its ±s neighbors, doubling the stride, until the system is
diagonal.  Each step is a handful of elementwise VPU ops over the
whole ``[B, n]`` batch — O(n log n) work but log-depth, the standard
GPU/TPU formulation.

No pivoting (like every cyclic-reduction solver): intended for the
diagonally-dominant / SPD tridiagonals of splines, ADI sweeps and
discretized 1-D operators.  A zero pivot emerging mid-reduction
produces inf/nan in that lane — surfaced as ``ok=False``, never a
silently wrong answer.  General (indefinite) tridiagonals should go
through the dense solvers.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls


class TridiagResult(NamedTuple):
    x: jax.Array   # [B, n] or [B, n, k]
    ok: jax.Array  # [B] reduction stayed finite


def _shift_down(v, s, fill=0.0):
    """v[i-s] with out-of-range entries = fill (along axis 1)."""
    rolled = jnp.roll(v, s, axis=1)
    mask = jnp.arange(v.shape[1]) >= s
    mask = mask.reshape((1, -1) + (1,) * (v.ndim - 2))
    return jnp.where(mask, rolled, fill)


def _shift_up(v, s, fill=0.0):
    """v[i+s] with out-of-range entries = fill (along axis 1)."""
    rolled = jnp.roll(v, -s, axis=1)
    mask = jnp.arange(v.shape[1]) < v.shape[1] - s
    mask = mask.reshape((1, -1) + (1,) * (v.ndim - 2))
    return jnp.where(mask, rolled, fill)


@jax.jit
@f32_matmuls
def tridiag_solve_batched(
    dl: jax.Array, d: jax.Array, du: jax.Array, b: jax.Array
) -> TridiagResult:
    """Solve batched tridiagonal systems.

    ``dl/d/du [B, n]`` — sub-, main-, super-diagonal (``dl[:, 0]`` and
    ``du[:, -1]`` are ignored); ``b [B, n]`` or ``[B, n, k]``.
    """
    B, n = d.shape
    dtype = jnp.result_type(d.dtype, jnp.float32)
    vector_input = b.ndim == 2
    b3 = (b[:, :, None] if vector_input else b).astype(dtype)
    idx = jnp.arange(n)
    dl = jnp.where(idx[None, :] == 0, 0.0, dl.astype(dtype))
    du = jnp.where(idx[None, :] == n - 1, 0.0, du.astype(dtype))
    d = d.astype(dtype)

    steps = max(math.ceil(math.log2(max(n, 2))), 1)
    s = 1
    for _ in range(steps):
        d_prev = _shift_down(d, s, fill=1.0)
        d_next = _shift_up(d, s, fill=1.0)
        alpha = -dl / d_prev
        beta = -du / d_next
        d = (
            d
            + alpha * _shift_down(du, s)
            + beta * _shift_up(dl, s)
        )
        b3 = (
            b3
            + alpha[:, :, None] * _shift_down(b3, s)
            + beta[:, :, None] * _shift_up(b3, s)
        )
        dl = alpha * _shift_down(dl, s)
        du = beta * _shift_up(du, s)
        s *= 2

    x = b3 / d[:, :, None]
    ok = jnp.all(jnp.isfinite(x), axis=(1, 2))
    return TridiagResult(x[:, :, 0] if vector_input else x, ok)
