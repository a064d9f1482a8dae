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


# ---------------------------------------------------------------------
# RBT large-N solve: no pivoting, no gathers, no getrf column loops.
#
# Round-4 micro-profile of large_solve_mixed at B=8, N=2048
# (examples/bench_r4_large_micro.py): 28.3 ms e2e of which the 16
# lax.linalg.lu panel calls cost 16.8 ms (sequential column loops —
# op-overhead, not FLOPs) and the trailing-row pivot gathers 5.6 ms,
# while ALL the trailing GEMMs cost 0.48 ms at the chip's measured
# 177 TF/s bf16 roofline.  This path removes both non-GEMM costs the
# RBT way: two-sided random-butterfly preconditioning makes block
# elimination without pivoting stable for generic input, the nb×nb
# diagonal blocks are inverted directly (XLA's pivoted inverse — see
# the note in _rbt_block_factor for why the Pallas inverse kernel is
# NOT used here), and everything else is batched MXU GEMM work.  A
# per-lane gate + lax.cond fallback to the pivoted
# ``large_solve_mixed`` keeps the safety contract of ``ops.rbt``.
# ---------------------------------------------------------------------


class LargeRBT(NamedTuple):
    """Block-elimination artifacts (tuples of length ``N/nb``):
    ``A = L·U`` with unit-block-lower ``L`` (``l21h`` below the
    diagonal) and block-upper ``U`` (diagonal blocks ``D_k`` held as
    their INVERSES, off-diagonal blocks ``a12`` raw)."""

    dinv: tuple        # [B, nb, nb]  D_k^{-1}
    l21h: tuple        # [B, M-nb, nb]  A21 @ D_k^{-1}
    a12: tuple         # [B, nb, M-nb]
    ok: jax.Array      # [B] all diagonal-block inverses finite


def _rbt_block_factor(
    a_p: jax.Array, nb: int, diag_engine: str = "recursive"
) -> LargeRBT:
    B, N, _ = a_p.shape
    phases = N // nb
    A = a_p
    dinvs, l21hs, a12s = [], [], []
    ok = jnp.ones((B,), bool)
    for k in range(phases):
        D = A[:, :nb, :nb]
        # Diagonal-block inverses.  After RBT preconditioning every
        # leading principal minor of A' is nonsingular w.p. 1 — and that
        # covers the Schur-complement diagonal blocks D_k (each is a
        # trailing Schur complement of a leading minor), so they can be
        # inverted UNPIVOTED.  ``diag_engine="recursive"`` (default,
        # round 5) uses the log-depth GEMM Schur recursion
        # (``ops.lu_recursive``): pure MXU work, no getrf column loops,
        # no pivot gathers — the round-4 micro-profile showed the
        # pivoted ``jnp.linalg.inv`` blocks cost 9.6 of 15.3 ms at B=8
        # N=2048.  ``"pivoted"`` keeps XLA's getrf inverse (the old
        # path, still the RESCUE via large_solve_mixed).  The fused
        # Pallas inverse kernel is NOT used here: interleaving a
        # pallas_call into this big XLA program costs ~5 ms/call of
        # materialization (85 vs 9.6 ms for the whole factor) — the
        # custom-call boundary breaks fusion around the [B, M, M]
        # trailing dataflow.  A singular/zero-pivot block flags the
        # lane for the e2e gate.
        if diag_engine == "recursive":
            from .lu_recursive import inverse_nopivot_recursive

            Dinv, dok = inverse_nopivot_recursive(D, leaf=16)
            ok = ok & dok
        else:
            Dinv = jnp.linalg.inv(D)
        ok = ok & jnp.all(jnp.isfinite(Dinv), axis=(1, 2))
        dinvs.append(Dinv)
        if A.shape[1] > nb:
            A12 = A[:, :nb, nb:]
            L21h = _bf16_mm(A[:, nb:, :nb], Dinv)
            a12s.append(A12)
            l21hs.append(L21h)
            A = A[:, nb:, nb:] - _bf16_mm(L21h, A12)
        else:
            a12s.append(jnp.zeros((B, nb, 0), a_p.dtype))
            l21hs.append(jnp.zeros((B, 0, nb), a_p.dtype))
    return LargeRBT(tuple(dinvs), tuple(l21hs), tuple(a12s), ok)


def _rbt_block_solve(fac: LargeRBT, b: jax.Array, nb: int) -> jax.Array:
    phases = len(fac.dinv)
    rhs = b
    ys = []
    for k in range(phases):
        y = rhs[:, :nb]
        ys.append(y)
        rest = rhs[:, nb:]
        if rest.shape[1]:
            rest = rest - jnp.einsum(
                "bij,bj->bi", fac.l21h[k], y, precision=_HIGH
            )
        rhs = rest
    x = jnp.zeros((b.shape[0], 0), b.dtype)
    for k in reversed(range(phases)):
        rhs_k = ys[k]
        if x.shape[1]:
            rhs_k = rhs_k - jnp.einsum(
                "bij,bj->bi", fac.a12[k], x, precision=_HIGH
            )
        xk = jnp.einsum(
            "bij,bj->bi", fac.dinv[k], rhs_k, precision=_HIGH
        )
        x = jnp.concatenate([xk, x], axis=1)
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "nb", "ir_steps", "depth", "fallback", "interpret", "diag_engine",
    ),
)
@f32_matmuls
def large_solve_rbt(
    a: jax.Array,
    b: jax.Array,
    nb: int = 128,
    ir_steps: int = 2,
    depth: int = 2,
    fallback: bool = True,
    interpret: bool = False,
    diag_engine: str = "recursive",
) -> jax.Array:
    """Large-N batched solve via RBT block elimination (see the module
    section comment).  Per-lane gated like ``ops.rbt``: refinement
    contraction + residual thresholds, with a ``lax.cond`` fallback to
    the pivoted ``large_solve_mixed`` for flagged lanes (full-batch —
    B is small in this regime by construction)."""
    from .rbt import _butterfly_two_sided_fast, butterfly_apply, rbt_diags

    B, N, _ = a.shape
    assert N % nb == 0, (N, nb)
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a32 = a.astype(f32)
    b32 = b.astype(f32)

    d = depth
    while d > 1 and (N >> (d - 1)) % 2:
        d -= 1
    diags_u = rbt_diags(jax.random.PRNGKey(17), N, d, f32)
    diags_v = rbt_diags(jax.random.PRNGKey(29), N, d, f32)

    a_p = _butterfly_two_sided_fast(
        a32, diags_u, diags_v, trans=True, interpret=interpret
    )
    b_p = butterfly_apply(b32[:, :, None], diags_u, trans=True)[..., 0]
    fac = _rbt_block_factor(a_p, nb, diag_engine=diag_engine)
    y = _rbt_block_solve(fac, b_p, nb)
    x = butterfly_apply(y[:, :, None], diags_v, trans=False)[..., 0]

    if fallback:
        amax = jnp.max(jnp.abs(a32), axis=(1, 2))
        bmax = jnp.max(jnp.abs(b32), axis=1)
    rmax = xmax = zcmax = None
    for step in range(ir_steps):
        r = b32 - jnp.einsum("bij,bj->bi", a32, x, precision=_HIGH)
        if fallback and step == ir_steps - 1:
            rmax = jnp.max(jnp.abs(r), axis=1)
            xmax = jnp.max(jnp.abs(x), axis=1)
        rp = butterfly_apply(r[:, :, None], diags_u, trans=True)[..., 0]
        z = _rbt_block_solve(fac, rp, nb)
        zc = butterfly_apply(z[:, :, None], diags_v, trans=False)[..., 0]
        if fallback and step == ir_steps - 1:
            zcmax = jnp.max(jnp.abs(zc), axis=1)
        x = x + zc

    if not fallback:
        return x

    eps = jnp.asarray(1e-30, f32)
    bad = ~fac.ok
    if ir_steps == 0:
        r = b32 - jnp.einsum("bij,bj->bi", a32, x, precision=_HIGH)
        rmax = jnp.max(jnp.abs(r), axis=1)
        scale = jnp.maximum(bmax, amax * jnp.max(jnp.abs(x), axis=1))
        bad |= ~(rmax <= 1e-2 * jnp.maximum(scale, eps))
    else:
        bad |= ~(zcmax <= 0.3 * jnp.maximum(xmax, eps))
        if ir_steps >= 2:
            scale = jnp.maximum(bmax, amax * xmax)
            bad |= ~(rmax <= 1e-4 * jnp.maximum(scale, eps))

    def _rescue(xx):
        yp = large_solve_mixed(a32, b32, nb=nb, ir_steps=2)
        return jnp.where(bad[:, None], yp, xx)

    return jax.lax.cond(jnp.any(bad), _rescue, lambda xx: xx, x)
