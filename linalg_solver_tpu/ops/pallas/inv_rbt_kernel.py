"""Pallas TPU kernel: fused RBT inverse for small N (batch in lanes).

The pivoted GJ kernel (gj_kernel.py) is VPU-bound at ``2n³`` work per
matrix: every one of the n steps updates the full ``[n, 2n]`` working
array ``[A | I]`` because in-place pivoting scatters the live identity
columns.  This kernel removes pivoting the RBT way — random butterfly
preconditioning applied IN KERNEL (VMEM-resident, ~4 elementwise
passes) — which buys three structural wins:

1. pivot(j) = row j, so the live columns at step j are EXACTLY the
   contiguous span ``[j, n+j]``: the update narrows to ``n+1`` columns
   — HALF the VPU work of the pivoted kernel's ``2n`` span;
2. no per-step argmax / pivoted-mask bookkeeping;
3. rows come out in natural order — no one-hot un-permutation GEMM on
   the way out (the pivoted path pays a ``take_rows_mxu``).

Safety mirrors ``ops.rbt``: per-lane zero-pivot flags in kernel plus a
residual gate outside; flagged lanes are rescued through the pivoted
GJ kernel under ``lax.cond``.

No reference counterpart (exact rational arithmetic needs no
conditioning); this is the BASELINE.md metric-2 hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_SQRT_HALF = 0.7071067811865476


def _bf_rows(work, diags, n: int, w: int, depth: int, trans: bool):
    """Apply the depth-``depth`` butterfly along the ROW axis of the
    ``[n, w, bt]`` VMEM ref's first ``w`` columns.  ``diags[lvl]`` is a
    ``[n, bt]`` ref (lane-broadcast level diagonal).  Static unroll:
    segment starts are compile-time constants."""
    levels = list(range(depth))
    if not trans:
        levels = levels[::-1]
    for lvl in levels:
        seg = n >> lvl
        h = seg // 2
        for g in range(0, n, seg):
            top = work[pl.ds(g, h), pl.ds(0, w), :]
            bot = work[pl.ds(g + h, h), pl.ds(0, w), :]
            r0 = diags[lvl][pl.ds(g, h), :][:, None, :]
            r1 = diags[lvl][pl.ds(g + h, h), :][:, None, :]
            if trans:
                new_top = r0 * (top + bot)
                new_bot = r1 * (top - bot)
            else:
                new_top = r0 * top + r1 * bot
                new_bot = r0 * top - r1 * bot
            work[pl.ds(g, h), pl.ds(0, w), :] = new_top * _SQRT_HALF
            work[pl.ds(g + h, h), pl.ds(0, w), :] = new_bot * _SQRT_HALF


def _bf_cols(work, diags, n: int, off: int, depth: int, trans: bool):
    """Same along the COLUMN axis, on columns ``[off, off+n)``."""
    levels = list(range(depth))
    if not trans:
        levels = levels[::-1]
    for lvl in levels:
        seg = n >> lvl
        h = seg // 2
        for g in range(0, n, seg):
            top = work[:, pl.ds(off + g, h), :]
            bot = work[:, pl.ds(off + g + h, h), :]
            # column index varies along axis 1: the [h, bt] diag slice
            # broadcasts as [1, h, bt] (lane-identical values)
            r0 = diags[lvl][pl.ds(g, h), :][None, :, :]
            r1 = diags[lvl][pl.ds(g + h, h), :][None, :, :]
            if trans:
                new_top = r0 * (top + bot)
                new_bot = r1 * (top - bot)
            else:
                new_top = r0 * top + r1 * bot
                new_bot = r0 * top - r1 * bot
            work[:, pl.ds(off + g, h), :] = new_top * _SQRT_HALF
            work[:, pl.ds(off + g + h, h), :] = new_bot * _SQRT_HALF


def _inv_rbt_kernel(a_hbm, du0, du1, dv0, dv1, out_hbm, ok_ref, work,
                    sems, *, n: int, bt: int, depth: int):
    """One batch tile: butterfly, no-pivot span-restricted GJ on
    ``[A' | I]``, un-butterfly the inverse, store the right half."""
    i = pl.program_id(0)
    dtype = work.dtype

    load = pltpu.make_async_copy(
        a_hbm.at[:, :, pl.ds(i * bt, bt)],
        work.at[:, pl.ds(0, n), :], sems.at[0]
    )
    load.start()
    load.wait()

    # A' = Uᵀ A V on the left half (I not yet written)
    _bf_rows(work, (du0, du1)[:depth], n, n, depth, trans=True)
    _bf_cols(work, (dv0, dv1)[:depth], n, 0, depth, trans=True)

    # right half := I
    rows2 = lax.broadcasted_iota(jnp.int32, (n, n, bt), 0)
    cols2 = lax.broadcasted_iota(jnp.int32, (n, n, bt), 1)
    work[:, pl.ds(n, n), :] = (rows2 == cols2).astype(dtype)

    rows = lax.broadcasted_iota(jnp.int32, (n, bt), 0)

    def step(j, ok):
        # live span: columns [j, n+j] (A-part cols < j are reduced to
        # e_j with a zeroed pivot row there; I-part cols > n+j still e)
        col = work[:, pl.ds(j, 1), :][:, 0, :]              # [n, bt]
        pv = work[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]     # [bt]
        has = (jnp.abs(pv) > 0.0).astype(dtype)
        inv_piv = 1.0 / (pv + (1.0 - has))
        oh_j = (rows == j).astype(dtype)                    # [n, bt]
        # coeff: eliminate col j from every other row, normalize row j
        coeff = jnp.where(
            oh_j > 0, 1.0 - inv_piv[None, :], col * inv_piv[None, :]
        )
        span = work[:, pl.ds(j, n + 1), :]                  # [n, n+1, bt]
        prow = work[pl.ds(j, 1), pl.ds(j, n + 1), :]        # [1, n+1, bt]
        work[:, pl.ds(j, n + 1), :] = (
            span - coeff[:, None, :] * prow
        )
        return ok * has

    ok = lax.fori_loop(0, n, step, jnp.ones((bt,), dtype))
    ok_ref[:] = (ok[None, :] > 0).astype(jnp.int32)

    # inverse of A' in the right half; A⁻¹ = V inv' Uᵀ
    _bf_rows_right(work, (dv0, dv1)[:depth], n, depth)
    _bf_cols(work, (du0, du1)[:depth], n, n, depth, trans=False)

    store = pltpu.make_async_copy(
        work.at[:, pl.ds(n, n), :],
        out_hbm.at[:, :, pl.ds(i * bt, bt)], sems.at[1]
    )
    store.start()
    store.wait()


def _bf_rows_right(work, diags, n: int, depth: int):
    """Row-side trans=False butterfly on the RIGHT half (cols n..2n)."""
    levels = list(range(depth))[::-1]
    for lvl in levels:
        seg = n >> lvl
        h = seg // 2
        for g in range(0, n, seg):
            top = work[pl.ds(g, h), pl.ds(n, n), :]
            bot = work[pl.ds(g + h, h), pl.ds(n, n), :]
            r0 = diags[lvl][pl.ds(g, h), :][:, None, :]
            r1 = diags[lvl][pl.ds(g + h, h), :][:, None, :]
            new_top = r0 * top + r1 * bot
            new_bot = r0 * top - r1 * bot
            work[pl.ds(g, h), pl.ds(n, n), :] = new_top * _SQRT_HALF
            work[pl.ds(g + h, h), pl.ds(n, n), :] = new_bot * _SQRT_HALF


def supported(n: int) -> bool:
    """One [n, 2n, 128] f32 tile within the VMEM budget, with even
    butterfly segments."""
    return (
        n >= 4 and n % 4 == 0
        and n * 2 * n * LANES * 4 <= 8 * 2**20
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "depth")
)
def _inv_rbt_call(a_t, du, dv, interpret: bool, depth: int):
    n, _, B = a_t.shape
    bt = LANES
    kernel = functools.partial(
        _inv_rbt_kernel, n=n, bt=bt, depth=depth
    )
    out, ok = pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec((n, bt), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n, B), a_t.dtype),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, 2 * n, bt), a_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(a_t, du[0], du[1], dv[0], dv[1])
    return out, ok


def _diags_lanes(key, n: int, depth: int, dtype):
    """Butterfly diagonals broadcast to the [n, LANES] kernel layout;
    always two refs (level 1 unused at depth 1)."""
    from ..rbt import rbt_diags

    ds = rbt_diags(key, n, depth, dtype)
    while len(ds) < 2:
        ds = ds + [jnp.ones((n,), dtype)]
    return tuple(
        jnp.broadcast_to(d[:, None], (n, LANES)).astype(dtype)
        for d in ds
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "ns_steps", "depth", "interpret", "fallback", "gate_mode",
    ),
)
def inverse_rbt_fused_batched(
    a: jax.Array,
    ns_steps: int = 0,
    depth: int = 2,
    interpret: bool = False,
    fallback: bool = True,
    gate_mode: str = "probe",
) -> jax.Array:
    """Batched small-N inverse via the fused RBT no-pivot GJ kernel.

    ``ns_steps`` optional Newton–Schulz polish rounds against the
    ORIGINAL matrix (2 GEMMs each); ``fallback`` gates each lane and
    rescues failures through the deterministic pivoted GJ kernel
    (``lax.cond``, free untaken).

    ``gate_mode`` picks the per-lane failure signal when ``ns_steps ==
    0`` (with polish rounds the full residual exists anyway and is
    reused):

    - ``"probe"`` (default): ``max|A(Xv) − v|`` for a fixed random
      probe ``v`` — two batched GEMVs (~5% of the full-residual GEMM's
      cost at the metric-2 shape: 1.65M → 2.3M matrices/s).  A one-
      dimensional sample of the operator error: divergence/NaN lanes
      are caught with certainty (non-finite propagates), merely-
      inaccurate lanes with probability ~1 for a random probe.
    - ``"full"``: the f32-HIGHEST residual ``max|I − AX|`` (the
      strictest gate; what the solve path's refinement uses)."""
    B, n, _ = a.shape
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a32 = a.astype(f32)

    d = depth
    while d > 1 and (n >> (d - 1)) % 2:
        d -= 1

    du = _diags_lanes(jax.random.PRNGKey(17), n, d, f32)
    dv = _diags_lanes(jax.random.PRNGKey(29), n, d, f32)

    pad = (-B) % LANES
    ap = a32
    if pad:
        filler = jnp.broadcast_to(jnp.eye(n, dtype=f32), (pad, n, n))
        ap = jnp.concatenate([a32, filler], axis=0)
    a_t = jnp.transpose(ap, (1, 2, 0))
    out, ok = _inv_rbt_call(a_t, du, dv, interpret, d)
    x = jnp.transpose(out, (2, 0, 1))[:B]
    okb = ok[0, :B].astype(bool)

    eye = jnp.eye(n, dtype=f32)
    hp = jax.lax.Precision.HIGHEST
    for _ in range(ns_steps):
        with jax.default_matmul_precision("float32"):
            r = eye - jnp.einsum("bij,bjk->bik", a32, x, precision=hp)
            x = x + jnp.einsum("bij,bjk->bik", x, r, precision=hp)

    if not fallback:
        return x.astype(a.dtype) if a.dtype != f32 else x

    if ns_steps == 0 and gate_mode == "probe":
        # Fixed random probe: rmax = max|A(Xv) - v| per lane.
        v = jax.random.normal(jax.random.PRNGKey(83), (n, 1), f32)
        with jax.default_matmul_precision("float32"):
            xv = jnp.einsum("bij,jk->bik", x, v, precision=hp)
            axv = jnp.einsum("bij,bjk->bik", a32, xv, precision=hp)
        # scale-aware: compare against tol * |v|_inf
        rmax = jnp.max(jnp.abs(axv - v[None]), axis=(1, 2))
        rtol = 1e-2 * jnp.max(jnp.abs(v))
    else:
        with jax.default_matmul_precision("float32"):
            r = eye - jnp.einsum("bij,bjk->bik", a32, x, precision=hp)
        rmax = jnp.max(jnp.abs(r), axis=(1, 2))
        rtol = jnp.asarray(1e-2, f32)
    # NaN-proof: `nan <= t` is False — flag non-small.
    bad = (~okb) | ~(rmax <= rtol)

    def _rescue(xx):
        from . import gj_kernel as _gjk

        yp = _gjk.inverse_batched(a32, interpret=interpret)
        return jnp.where(bad[:, None, None], yp, xx)

    x = jax.lax.cond(jnp.any(bad), _rescue, lambda xx: xx, x)
    return x.astype(a.dtype) if a.dtype != f32 else x
