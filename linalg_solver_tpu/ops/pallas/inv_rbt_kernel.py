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

Round-4 structure (VERDICT r3 item 3 + ADVICE r3 medium):

- The probe gate moved IN KERNEL with a RADEMACHER (±1) probe: a copy
  of the ORIGINAL A stays in VMEM and the epilogue computes
  ``r = A·(X v) − v`` + per-lane ``max|r|`` — every column of the
  error carries unit probe weight (the old fixed GAUSSIAN probe
  systematically under-checked columns j with small ``|v_j|``).
- The ENTIRE rescue ladder also moved IN KERNEL under ``pl.when``:
  level 2 re-runs the same elimination with independent butterflies,
  level 3 runs the deterministic pivoted GJ (argmax pivoting +
  one-hot un-permutation) — both skipped entirely when the tile is
  clean.  The previous ``lax.cond`` rescue stalled the execution
  stream on a device→scheduler predicate read: measured 2.28 vs 3.61
  M matrices/s ungated, i.e. the *untaken* host-side cond cost ~45%
  of the whole workload.  ``pl.when`` predication has no such sync.
- A rank-2 step variant (two pivots per span read+write) was measured
  SLOWER (1.85 M/s): correction machinery outweighs the halved span
  traffic.  256-lane tiles were REJECTED by Mosaic (dimension-1
  dynamic span starts must be provably 8-aligned at 2 lane-tiles).

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

#: batch-tile lanes.
BT = 128
_SQRT_HALF = 0.7071067811865476
_RTOL = 1e-2


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


def _inv_rbt_kernel(a_hbm, du0, du1, dv0, dv1, eu0, eu1, ev0, ev1, vr,
                    out_hbm, bad_ref, work, acopy, stash, sems, *,
                    n: int, bt: int, depth: int, rescue: bool):
    """One batch tile: butterfly, no-pivot span-restricted GJ on
    ``[A' | I]``, un-butterfly, Rademacher-probe vs the saved original
    A — then, under ``pl.when`` (no host sync, skipped when clean),
    the in-kernel rescue ladder: independent-redraw pass for flagged
    lanes, pivoted GJ for lanes that fail twice."""
    i = pl.program_id(0)
    dtype = work.dtype

    load = pltpu.make_async_copy(
        a_hbm.at[:, :, pl.ds(i * bt, bt)],
        work.at[:, pl.ds(0, n), :], sems.at[0]
    )
    load.start()
    load.wait()

    # Pristine copy: probe residuals + rescue rebuilds read from here.
    acopy[:, :, :] = work[:, pl.ds(0, n), :]

    rows = lax.broadcasted_iota(jnp.int32, (n, bt), 0)
    rows2 = lax.broadcasted_iota(jnp.int32, (n, n, bt), 0)
    cols2 = lax.broadcasted_iota(jnp.int32, (n, n, bt), 1)

    def nopivot_pass(d_u, d_v, first):
        """Rebuild [A'|I] from acopy with the given butterflies,
        eliminate without pivoting, un-butterfly the inverse into the
        right half, probe it.  Returns per-lane bad flags [bt] f32."""
        if not first:
            work[:, pl.ds(0, n), :] = acopy[:, :, :]
        _bf_rows(work, d_u, n, n, depth, trans=True)
        _bf_cols(work, d_v, n, 0, depth, trans=True)
        work[:, pl.ds(n, n), :] = (rows2 == cols2).astype(dtype)

        def step(j, ok):
            # live span: columns [j, n+j] (A-part cols < j are reduced
            # to e_j with a zeroed pivot row there; I-part cols > n+j
            # still e)
            col = work[:, pl.ds(j, 1), :][:, 0, :]          # [n, bt]
            pv = work[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
            has = (jnp.abs(pv) > 0.0).astype(dtype)
            inv_piv = 1.0 / (pv + (1.0 - has))
            oh_j = (rows == j).astype(dtype)
            coeff = jnp.where(
                oh_j > 0, 1.0 - inv_piv[None, :],
                col * inv_piv[None, :],
            )
            span = work[:, pl.ds(j, n + 1), :]              # [n, n+1, bt]
            prow = work[pl.ds(j, 1), pl.ds(j, n + 1), :]    # [1, n+1, bt]
            work[:, pl.ds(j, n + 1), :] = (
                span - coeff[:, None, :] * prow
            )
            return ok * has

        ok = lax.fori_loop(0, n, step, jnp.ones((bt,), dtype))

        # inverse of A' in the right half; A⁻¹ = V inv' Uᵀ
        _bf_rows_right(work, d_v, n, depth)
        _bf_cols(work, d_u, n, n, depth, trans=False)

        # Rademacher probe vs the ORIGINAL A: r = A (X v) − v.
        vrv = vr[:, :]                                       # [n, bt]
        xv = jnp.sum(
            work[:, pl.ds(n, n), :] * vrv[None, :, :], axis=1
        )
        resid = jnp.sum(
            acopy[:, :, :] * xv[None, :, :], axis=1
        ) - vrv
        rmax = jnp.max(jnp.abs(resid), axis=0)               # [bt]
        # NaN-proof: flag NON-(finite and small).
        good = (rmax <= _RTOL) & (ok > 0)
        return 1.0 - good.astype(dtype)

    bad1 = nopivot_pass((du0, du1)[:depth], (dv0, dv1)[:depth], True)
    bad_ref[:] = (bad1[None, :] > 0).astype(jnp.int32)

    if rescue:
        @pl.when(jnp.any(bad1 > 0))
        def _level2():
            stash[:, :, :] = work[:, pl.ds(n, n), :]
            bad2 = nopivot_pass(
                (eu0, eu1)[:depth], (ev0, ev1)[:depth], False
            )
            work[:, pl.ds(n, n), :] = jnp.where(
                bad1[None, None, :] > 0,
                work[:, pl.ds(n, n), :], stash[:, :, :],
            )
            bad_ref[:] = ((bad1 * bad2)[None, :] > 0).astype(jnp.int32)

        badf = bad_ref[0, :]

        @pl.when(jnp.any(badf > 0))
        def _level3():
            # Deterministic pivoted Gauss-Jordan (ports the gj_kernel
            # step: in-place argmax pivoting, tol=0) on [A | I] from
            # the pristine copy, then one-hot un-permutation.
            stash[:, :, :] = work[:, pl.ds(n, n), :]
            work[:, pl.ds(0, n), :] = acopy[:, :, :]
            work[:, pl.ds(n, n), :] = (rows2 == cols2).astype(dtype)

            def pstep(j, carry):
                pivoted, perm = carry
                col = work[:, pl.ds(j, 1), :][:, 0, :]      # [n, bt]
                masked = jnp.where(
                    pivoted > 0, -jnp.inf, jnp.abs(col)
                )
                p = jnp.argmax(masked, axis=0)               # [bt]
                oh_p = (rows == p[None, :]).astype(dtype)
                pivot_val = jnp.sum(col * oh_p, axis=0)
                has = jnp.abs(pivot_val) > 0.0
                inv_piv = 1.0 / jnp.where(has, pivot_val, 1.0)
                arr = work[:, :, :]
                pivot_row = jnp.sum(arr * oh_p[:, None, :], axis=0)
                act = has.astype(dtype)
                coeff = jnp.where(
                    oh_p > 0, 1.0 - inv_piv[None, :],
                    col * inv_piv[None, :],
                ) * act[None, :]
                work[:, :, :] = (
                    arr - coeff[:, None, :] * pivot_row[None, :, :]
                )
                newly = (
                    (rows == p[None, :]) & has[None, :]
                ).astype(dtype)
                pivoted = jnp.maximum(pivoted, newly)
                perm = jnp.where(
                    rows == j, p[None, :].astype(jnp.int32), perm
                )
                return pivoted, perm

            _, perm = lax.fori_loop(
                0, n, pstep,
                (jnp.zeros((n, bt), dtype),
                 jnp.zeros((n, bt), jnp.int32)),
            )

            # un-permute: logical row j of A⁻¹ is physical row perm[j];
            # accumulate into the (now dead) left half.
            work[:, pl.ds(0, n), :] = jnp.zeros((n, n, bt), dtype)

            def unperm(r, carry):
                ohr = (perm == r).astype(dtype)              # [n(j), bt]
                wrow = work[pl.ds(r, 1), pl.ds(n, n), :][0]  # [n(c), bt]
                work[:, pl.ds(0, n), :] = (
                    work[:, pl.ds(0, n), :]
                    + ohr[:, None, :] * wrow[None, :, :]
                )
                return carry

            lax.fori_loop(0, n, unperm, 0)
            work[:, pl.ds(n, n), :] = jnp.where(
                badf[None, None, :] > 0,
                work[:, pl.ds(0, n), :], stash[:, :, :],
            )

    store = pltpu.make_async_copy(
        work.at[:, pl.ds(n, n), :],
        out_hbm.at[:, :, pl.ds(i * bt, bt)], sems.at[1]
    )
    store.start()
    store.wait()


def supported(n: int) -> bool:
    """work [n,2n,BT] + acopy/stash [n,n,BT] f32 within the VMEM
    budget (~34 MB at n=128 against the measured ~120 MB ceiling),
    with even butterfly segments.  Capped at the MEASURED reach
    n=180 (round-4 chip probe) — the raw VMEM budget would admit up
    to n=200, but those sizes are unverified and ops.rbt's phase path
    wins at every measured size above 180 (ADVICE r4)."""
    return (
        n >= 4 and n % 4 == 0 and n <= 180
        and 4 * n * n * BT * 4 <= 80 * 2**20
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "depth", "rescue")
)
def _inv_rbt_call(a_t, du, dv, eu, ev, vr, interpret: bool,
                  depth: int, rescue: bool):
    n, _, B = a_t.shape
    bt = BT
    kernel = functools.partial(
        _inv_rbt_kernel, n=n, bt=bt, depth=depth, rescue=rescue
    )
    out, bad = pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec((n, bt), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 9,
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
            pltpu.VMEM((n, 2 * n, bt), a_t.dtype),   # work [A'|X]
            pltpu.VMEM((n, n, bt), a_t.dtype),       # pristine A
            pltpu.VMEM((n, n, bt), a_t.dtype),       # rescue stash
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(a_t, du[0], du[1], dv[0], dv[1], eu[0], eu[1], ev[0], ev[1], vr)
    return out, bad


def _diags_lanes(key, n: int, depth: int, dtype):
    from ..rbt import diags_lanes

    return diags_lanes(key, n, depth, dtype, BT)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ns_steps", "depth", "interpret", "fallback", "gate_mode",
        "return_flags",
    ),
)
def inverse_rbt_fused_batched(
    a: jax.Array,
    ns_steps: int = 0,
    depth: int = 2,
    interpret: bool = False,
    fallback: bool = True,
    gate_mode: str = "probe",
    return_flags: bool = False,
) -> jax.Array:
    """Batched small-N inverse via the fused RBT no-pivot GJ kernel.

    The DEFAULT configuration (``ns_steps=0, fallback=True,
    gate_mode="probe"``) runs gate AND rescue entirely inside the
    kernel: the in-kernel Rademacher probe flags bad lanes, a second
    independent butterfly draw rescues them, and the deterministic
    pivoted GJ handles lanes that fail twice — all under ``pl.when``
    (zero cost for clean tiles, no host-sync ``lax.cond``).  The
    wrapper is then just pad + transpose.

    ``ns_steps`` optional Newton–Schulz polish rounds against the
    ORIGINAL matrix (2 GEMMs each) — gated OUTSIDE on the full f32
    residual; ``gate_mode="full"`` likewise gates on ``max|I − AX|``
    (strictest) with an outside pivoted rescue under ``lax.cond``.

    ``return_flags=True`` also returns the FINAL per-lane ``bad [B]``
    bool flags: lanes that failed every rescue level (truly singular
    input) come back as finite garbage values, and these flags are the
    only signal — the kernel materializes them either way (ADVICE
    r4)."""
    B, n, _ = a.shape
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a32 = a.astype(f32)

    d = depth
    while d > 1 and (n >> (d - 1)) % 2:
        d -= 1

    du = _diags_lanes(jax.random.PRNGKey(17), n, d, f32)
    dv = _diags_lanes(jax.random.PRNGKey(29), n, d, f32)
    eu = _diags_lanes(jax.random.PRNGKey(101), n, d, f32)
    ev = _diags_lanes(jax.random.PRNGKey(103), n, d, f32)
    vr1 = jax.random.rademacher(
        jax.random.PRNGKey(83), (n,), jnp.int8
    ).astype(f32)
    vr = jnp.broadcast_to(vr1[:, None], (n, BT))

    pad = (-B) % BT
    ap = a32
    if pad:
        filler = jnp.broadcast_to(jnp.eye(n, dtype=f32), (pad, n, n))
        ap = jnp.concatenate([a32, filler], axis=0)
    a_t = jnp.transpose(ap, (1, 2, 0))

    hot = fallback and ns_steps == 0 and gate_mode == "probe"
    out, bad_k = _inv_rbt_call(
        a_t, du, dv, eu, ev, vr, interpret, d, rescue=hot
    )
    x = jnp.transpose(out, (2, 0, 1))[:B]
    if hot:
        x = x.astype(a.dtype) if a.dtype != f32 else x
        if return_flags:
            return x, bad_k[0, :B].astype(bool)
        return x

    bad = bad_k[0, :B].astype(bool)
    eye = jnp.eye(n, dtype=f32)
    hp = jax.lax.Precision.HIGHEST
    for _ in range(ns_steps):
        with jax.default_matmul_precision("float32"):
            r = eye - jnp.einsum("bij,bjk->bik", a32, x, precision=hp)
            x = x + jnp.einsum("bij,bjk->bik", x, r, precision=hp)

    if not fallback:
        x = x.astype(a.dtype) if a.dtype != f32 else x
        return (x, bad) if return_flags else x

    # Polish rounds / gate_mode="full": gate on the f32-HIGHEST full
    # residual (strictest; the kernel's zero-pivot/probe flags OR in).
    with jax.default_matmul_precision("float32"):
        r = eye - jnp.einsum("bij,bjk->bik", a32, x, precision=hp)
    rmax = jnp.max(jnp.abs(r), axis=(1, 2))
    bad = bad | ~(rmax <= jnp.asarray(_RTOL, f32))

    def _rescue_x(xx):
        from . import gj_kernel as _gjk

        yp = _gjk.inverse_batched(a32, interpret=interpret)
        return jnp.where(bad[:, None, None], yp, xx)

    x = jax.lax.cond(jnp.any(bad), _rescue_x, lambda xx: xx, x)
    x = x.astype(a.dtype) if a.dtype != f32 else x
    return (x, bad) if return_flags else x
