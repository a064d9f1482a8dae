"""Large-N batched solve: XLA-native panels + single-pass bf16 trailing
updates + f32 iterative refinement.

The batch-in-lanes Pallas pipeline (``lu_blocked``) owns the
many-matrices regime (B ≥ 64, N ≤ 512) but starves below ~64 lanes and
its full-width panel no longer fits VMEM at N = 1024 — there XLA's own
``jnp.linalg.solve`` was 3.4× faster (693 vs 202 GFLOP/s at B=16,
N=1024).  This module attacks that regime on XLA's own terms: the
O(N²·nb) panel factorizations go to ``lax.linalg.lu`` (XLA's tuned
getrf), while the O(N³) trailing GEMMs — where jnp.linalg.solve spends
its time in SIX bf16 passes per f32 contraction — run in ONE bf16 pass,
and a final f32-residual refinement step restores full f32 accuracy
(the dsgesv/HPL-AI recipe, same as ``lu_blocked``'s mixed path).

Row pivoting is applied to the trailing block by a real gather
(``take_along_axis``): unlike the value-select hot spots in the lanes
kernel (STATUS.md), the gathered bytes here are O(N³/nb) against
O(N³) GEMM FLOPs — bandwidth-trivial at nb ≥ 128.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
import jax.scipy.linalg as jsl

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


def _bf16_mm(x, y):
    """One-pass MXU contraction: bf16 inputs, f32 accumulation."""
    return jnp.einsum(
        "bij,bjk->bik",
        x.astype(jnp.bfloat16),
        y.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


class LargeLU(NamedTuple):
    """Per-phase factors of the mixed blocked LU (tuples of length
    ``N/nb``; phase k's arrays cover the trailing ``M_k = N − k·nb``
    rows)."""

    lu11: tuple        # [B, nb, nb] packed L11\\U11
    l21: tuple         # [B, M−nb, nb]
    u12: tuple         # [B, nb, M−nb]
    perm: tuple        # [B, M] i32 row permutation of the trailing block


def _split_tri(lu11):
    nb = lu11.shape[-1]
    eye = jnp.eye(nb, dtype=lu11.dtype)
    L = jnp.tril(lu11, -1) + eye
    U = jnp.triu(lu11)
    return L, U


def large_lu_factor(a: jax.Array, nb: int = 128) -> LargeLU:
    B, N, _ = a.shape
    assert N % nb == 0, (N, nb)
    phases = N // nb
    A = a
    lu11s, l21s, u12s, perms = [], [], [], []
    for k in range(phases):
        M = N - k * nb
        lu, _, perm = lax.linalg.lu(A[:, :, :nb])
        lu11s.append(lu[:, :nb])
        l21s.append(lu[:, nb:])
        perms.append(perm.astype(jnp.int32))
        if M > nb:
            rest = jnp.take_along_axis(
                A[:, :, nb:], perm[:, :, None], axis=1
            )
            L11, _ = _split_tri(lu[:, :nb])
            U12 = jsl.solve_triangular(
                L11, rest[:, :nb], lower=True, unit_diagonal=True
            )
            u12s.append(U12)
            A = rest[:, nb:] - _bf16_mm(lu[:, nb:], U12)
        else:
            u12s.append(jnp.zeros((B, nb, 0), a.dtype))
    return LargeLU(tuple(lu11s), tuple(l21s), tuple(u12s), tuple(perms))


def large_lu_solve(fac: LargeLU, b: jax.Array) -> jax.Array:
    """Solve through the phase factors: b [B, N] → x [B, N]."""
    phases = len(fac.lu11)
    nb = fac.lu11[0].shape[-1]
    # forward: per phase, permute the trailing rhs, solve the unit-lower
    # block, eliminate from the rest (O(M·nb) GEMV work — f32).
    rhs = b
    ys = []
    for k in range(phases):
        rhs = jnp.take_along_axis(rhs, fac.perm[k], axis=1)
        L11, _ = _split_tri(fac.lu11[k])
        y = jsl.solve_triangular(
            L11, rhs[:, :nb, None], lower=True, unit_diagonal=True
        )[..., 0]
        ys.append(y)
        rest = rhs[:, nb:]
        if rest.shape[1]:
            rest = rest - jnp.einsum(
                "bij,bj->bi", fac.l21[k], y, precision=_HIGH
            )
        rhs = rest
    # backward: x_k = U11⁻¹ (y_k − U12 x_rest)
    x = jnp.zeros((b.shape[0], 0), b.dtype)
    for k in reversed(range(phases)):
        _, U11 = _split_tri(fac.lu11[k])
        rhs_k = ys[k]
        if x.shape[1]:
            rhs_k = rhs_k - jnp.einsum(
                "bij,bj->bi", fac.u12[k], x, precision=_HIGH
            )
        xk = jsl.solve_triangular(
            U11, rhs_k[:, :, None], lower=False
        )[..., 0]
        x = jnp.concatenate([xk, x], axis=1)
    return x


@functools.partial(jax.jit, static_argnames=("nb", "ir_steps"))
@f32_matmuls
def large_solve_mixed(
    a: jax.Array, b: jax.Array, nb: int = 128, ir_steps: int = 1
) -> jax.Array:
    """Factor + solve ``a @ x = b`` for [B, N, N] × [B, N] in the
    large-N regime: bf16 trailing updates, f32 panels/solves, and
    ``ir_steps`` rounds of f32-residual refinement."""
    fac = large_lu_factor(a, nb=nb)
    x = large_lu_solve(fac, b)
    for _ in range(ir_steps):
        r = b - jnp.einsum("bij,bj->bi", a, x, precision=_HIGH)
        x = x + large_lu_solve(fac, r)
    return x
