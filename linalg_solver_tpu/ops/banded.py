"""Batched block-tridiagonal and banded solvers (block PCR).

Generalizes ``ops.tridiag`` from scalar diagonals to [nb, nb] blocks:
parallel cyclic reduction in ⌈log₂ K⌉ data-parallel steps where every
elementwise multiply becomes a batched [nb, nb] GEMM and every divide a
batched block solve — MXU work end to end, log-depth like the scalar
PCR.  A banded system with bandwidth kb (sub = super = kb) is exactly
block-tridiagonal with nb = kb blocks, which gives the general banded
entry point ``banded_solve_batched`` (scipy ``solve_banded`` storage).

No pivoting across blocks (like every cyclic-reduction solver):
intended for the diagonally-dominant / SPD bands of splines, ADI
sweeps and discretized operators.  Each block solve inside a step IS
pivoted (LU), so only cross-block indefiniteness is restricted.  A
singular reduced block produces inf/nan in that lane — surfaced as
``ok=False``, never a silently wrong answer.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


class BlockTridiagResult(NamedTuple):
    x: jax.Array   # [B, K, nb] (or [B, K, nb, k])
    ok: jax.Array  # [B] reduction stayed finite


def _bshift_down(v, s, fill):
    rolled = jnp.roll(v, s, axis=1)
    mask = jnp.arange(v.shape[1]) >= s
    mask = mask.reshape((1, -1) + (1,) * (v.ndim - 2))
    return jnp.where(mask, rolled, fill)


def _bshift_up(v, s, fill):
    rolled = jnp.roll(v, -s, axis=1)
    mask = jnp.arange(v.shape[1]) < v.shape[1] - s
    mask = mask.reshape((1, -1) + (1,) * (v.ndim - 2))
    return jnp.where(mask, rolled, fill)


def _bmm(x, y):
    return jnp.einsum("bkij,bkjl->bkil", x, y, precision=_HIGH)


@jax.jit
@f32_matmuls
def block_tridiag_solve_batched(
    dl: jax.Array, d: jax.Array, du: jax.Array, b: jax.Array
) -> BlockTridiagResult:
    """Solve batched block-tridiagonal systems.

    ``dl/d/du [B, K, nb, nb]`` — sub-, main-, super-diagonal blocks
    (``dl[:, 0]`` and ``du[:, -1]`` are ignored); ``b [B, K, nb]`` or
    ``[B, K, nb, k]``.
    """
    B, K, nb, _ = d.shape
    dtype = jnp.result_type(d.dtype, jnp.float32)
    vector_input = b.ndim == 3
    b4 = (b[..., None] if vector_input else b).astype(dtype)
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=dtype), d.shape)
    kidx = jnp.arange(K).reshape(1, -1, 1, 1)
    zero_first = kidx != 0
    zero_last = kidx != K - 1
    dl = jnp.where(zero_first, dl.astype(dtype), 0.0)
    du = jnp.where(zero_last, du.astype(dtype), 0.0)
    d = d.astype(dtype)

    steps = max(math.ceil(math.log2(max(K, 2))), 1)
    s = 1
    for _ in range(steps):
        d_prev = _bshift_down(d, s, fill=eye)
        d_next = _bshift_up(d, s, fill=eye)
        # alpha = −dl · d_prev⁻¹ (solve from the right via transposes)
        alpha = -jnp.swapaxes(
            jnp.linalg.solve(
                jnp.swapaxes(d_prev, -1, -2), jnp.swapaxes(dl, -1, -2)
            ),
            -1, -2,
        )
        beta = -jnp.swapaxes(
            jnp.linalg.solve(
                jnp.swapaxes(d_next, -1, -2), jnp.swapaxes(du, -1, -2)
            ),
            -1, -2,
        )
        d = (
            d
            + _bmm(alpha, _bshift_down(du, s, 0.0))
            + _bmm(beta, _bshift_up(dl, s, 0.0))
        )
        b4 = (
            b4
            + _bmm(alpha, _bshift_down(b4, s, 0.0))
            + _bmm(beta, _bshift_up(b4, s, 0.0))
        )
        dl = _bmm(alpha, _bshift_down(dl, s, 0.0))
        du = _bmm(beta, _bshift_up(du, s, 0.0))
        s *= 2

    x = jnp.linalg.solve(d, b4)
    ok = jnp.all(jnp.isfinite(x), axis=(1, 2, 3))
    return BlockTridiagResult(x[..., 0] if vector_input else x, ok)


def _band_to_blocks(ab: jax.Array, kb: int, K: int, nb: int):
    """scipy ``solve_banded`` storage ``ab [B, 2kb+1, N]`` with
    ``ab[:, kb + i − j, j] = A[i, j]`` → block-tridiagonal diagonals
    ``(dl, d, du) [B, K, nb, nb]``.  Static index grids — one gather."""
    B = ab.shape[0]
    N = K * nb
    # pad columns so out-of-range gathers read zeros
    abp = jnp.pad(ab, ((0, 0), (0, 1), (0, nb)))
    r = jnp.arange(nb)

    def block(block_row_offset):
        # entry (r, c) of block (k, k + block_row_offset·(−1)) …
        # global row i = k·nb + r, col j = (k + off)·nb + c
        off = block_row_offset
        k = jnp.arange(K)
        i = k[:, None, None] * nb + r[None, :, None]
        j = (k[:, None, None] + off) * nb + r[None, None, :]
        band_row = kb + i - j
        valid = (
            (band_row >= 0) & (band_row <= 2 * kb)
            & (j >= 0) & (j < N)
        )
        band_row = jnp.where(valid, band_row, 2 * kb + 1)
        jcl = jnp.where(valid, j, N)
        return abp[:, band_row, jcl]

    return block(-1), block(0), block(1)


@functools.partial(jax.jit, static_argnames=("kb", "nb"))
@f32_matmuls
def banded_solve_batched(
    ab: jax.Array,
    b: jax.Array,
    kb: int | None = None,
    nb: int | None = None,
) -> BlockTridiagResult:
    """Solve batched BANDED systems ``A x = b`` with equal lower/upper
    bandwidth ``kb`` in scipy ``solve_banded`` storage:
    ``ab [B, 2·kb+1, N]`` with ``ab[:, kb + i − j, j] = A[i, j]``.

    Packs the band into nb-sized block-tridiagonal form (ANY ``nb ≥
    kb`` is valid — every nonzero with |i − j| ≤ kb lands inside the
    tridiagonal blocks; N is padded up to a multiple of nb with
    identity rows) and runs the block PCR — log-depth, all
    GEMM/block-solve work.  ``nb`` defaults to ``max(kb, 32)``: tiny
    blocks starve the MXU (measured on-chip at B=64 N=2048 kb=8:
    nb=8 took 626 ms/call; fatter blocks trade O(K·nb³) FLOPs for far
    better unit economics).  Same no-cross-block-pivoting caveat as
    :func:`block_tridiag_solve_batched`.
    """
    B, rows, N = ab.shape
    if kb is None:
        kb = (rows - 1) // 2
    if rows != 2 * kb + 1:
        raise ValueError(
            f"ab must have 2·kb+1 = {2 * kb + 1} rows, got {rows}"
        )
    if kb < 1:
        raise ValueError("use a diagonal scale for kb = 0")
    if nb is None:
        nb = max(kb, min(32, N))
    if nb < kb:
        raise ValueError(f"nb ({nb}) must be >= kb ({kb})")
    K = -(-N // nb)
    Np = K * nb
    if Np != N:
        # pad with identity rows: A ⊕ I, b ⊕ 0
        pad_ab = jnp.zeros((B, 2 * kb + 1, Np - N), ab.dtype)
        pad_ab = pad_ab.at[:, kb, :].set(1.0)
        ab = jnp.concatenate([ab, pad_ab], axis=2)
        b = jnp.concatenate(
            [b, jnp.zeros(b.shape[:1] + (Np - N,) + b.shape[2:], b.dtype)],
            axis=1,
        )
    dl, d, du = _band_to_blocks(ab, kb, K, nb)
    vector_input = b.ndim == 2
    bb = b.reshape(B, K, nb) if vector_input else b.reshape(
        B, K, nb, b.shape[-1]
    )
    res = block_tridiag_solve_batched(dl, d, du, bb)
    x = res.x.reshape(
        (B, Np) if vector_input else (B, Np, b.shape[-1])
    )[:, :N]
    return BlockTridiagResult(x, res.ok)
