"""Pallas TPU kernel: the ENTIRE RBT solve in one kernel launch.

Round-3 floor analysis (examples/bench_r3_floor.py; VERDICT r3 item 1):
the phase-structured solve spent ~0.81 ms in compute kernels and
~2.4 ms in inter-phase XLA glue — trail corners round-tripping HBM
between every panel kernel / GEMM dispatch, plus per-phase transposes,
triangular inverses and refinement GEMVs, ~430 MB of trail traffic at
the bench shape.  This kernel removes the glue BY CONSTRUCTION: the
v5e's large VMEM (measured ~120 MB usable — examples/probe_vmem.py)
holds BOTH the working factorization ``[N, N, 128]`` AND a pristine
copy of ``A`` (32 MB each at N=256 f32), so butterfly preconditioning,
the pivot-free factorization, forward/backward substitution, and every
iterative-refinement round run back-to-back on VMEM-resident data.
HBM traffic collapses to the information floor: one read of ``A`` and
``b``, one write of ``x`` (+ per-lane flags) — ~64 MB total at the
bench shape versus ~430 MB of inter-phase trail traffic before.

Layout: ``[N (columns), N (rows), 128 (batch lanes)]`` — each axis-0
plane is one matrix column as a ``[rows, lanes]`` VPU tile, so a
rank-1 elimination step is ONE fused multiply-subtract over the
``[W, m, 128]`` trailing block (no one-hot extraction: the column loop
is statically unrolled, so every pivot row/column is a static slice).
Trailing updates run on the VPU — batch-in-lanes makes the MXU
inapplicable — which costs N³/3 FMA per matrix; at B=256, N=256 that
is ~0.8 ms of pure compute replacing ~2.4 ms of glue.  All arithmetic
is f32 (the VPU has no bf16 discount), so the factor is *more*
accurate than the old bf16-GEMM phase path.

Safety mirrors ``ops/rbt.py`` exactly: pivot(c) = row c after Parker
random-butterfly preconditioning, per-lane zero-pivot + refinement
contraction/residual gates computed IN KERNEL, rescue decided outside
(see ``ops.rbt.pallas_solve_rbt_batched``'s lane-compacted rescue).
The reference needs none of this (exact rational arithmetic —
reference linalg_solver/elimination.py row_reduce semantics live in
``exact/``); this is the TPU-native hot path for BASELINE metric 1.
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

#: max matrix-RHS columns the fused kernel stacks as vector slabs
MAX_K_RHS = 8

#: VMEM budget for work + orig (bytes); headroom below the measured
#: ~120 MB ceiling for vectors/diags/DMA buffers.
_VMEM_BUDGET = 110 * 2**20


#: column-chunk height for the streamed-residual variant's HBM reads
_STREAM_CK = 32

#: VMEM budget for the streamed variant (trail + one chunk buffer).
#: N=448 FAILS compile even with the chunk shrunk to CK=16 (round-5
#: reproducer `examples/bench_r5_stream448.py`): the 98.0 MB work
#: scratch itself fits, but Mosaic adds 50.85 MB of REGISTER-
#: ALLOCATOR SPILL SLOTS to the same scoped-vmem budget -> 153.7 MB
#: of 128 MB.  The spill slots, not DMA/bookkeeping overhead, are
#: the "accounting" gap; they scale with program size, which is why
#: shrinking the chunk buffer cannot close a 26 MB overrun.  100 MB
#: admits up to N=384 (80 MB trail + spills fit).
_VMEM_BUDGET_STREAM = 100 * 2**20


def supported(n: int, nb: int = 32, k_rhs: int = 1) -> bool:
    """work + pristine-copy f32 tiles (+ 4 [k·n, 128] vector scratches
    for matrix RHS) fit VMEM; phases and butterfly segments line up
    (depth-2 needs n % 4 == 0; handled by depth shrink for
    n % 4 == 2).  ``k_rhs`` ≤ ``MAX_K_RHS`` RHS columns share one
    factorization (VERDICT r4 item 5a)."""
    vec_bytes = 6 * k_rhs * n * LANES * 4   # yv/rv/xv/bo + b in + x out
    return (
        1 <= k_rhs <= MAX_K_RHS
        and n >= 2 * nb
        and n % nb == 0
        and n % 2 == 0
        and 2 * n * n * LANES * 4 + vec_bytes <= _VMEM_BUDGET
    )


def supported_streamed(n: int, nb: int = 32) -> bool:
    """The STREAMED-RESIDUAL variant holds only the trail in VMEM and
    re-reads A from HBM in column chunks for each refinement residual
    — reaches N=384/448 where the two-copy variant tops out at 320."""
    need = (n * n + _STREAM_CK * n) * LANES * 4
    return (
        n >= 2 * nb
        and n % nb == 0
        and n % _STREAM_CK == 0
        and need <= _VMEM_BUDGET_STREAM
    )


# ---------------------------------------------------------------------
# In-kernel butterfly application (static unroll; diags are [n, bt]
# lane-broadcast refs).  Semantics match ops.rbt.butterfly_apply /
# _butterfly_two_sided_fast bit-for-bit at f32 (differential-tested).
# ---------------------------------------------------------------------

def _bf_mat_rows(ref, diags, n, depth, trans):
    """Mix matrix ROWS (axis 1 of [cols, rows, lanes])."""
    levels = list(range(depth))
    if not trans:
        levels = levels[::-1]
    for lvl in levels:
        seg = n >> lvl
        h = seg // 2
        for g in range(0, n, seg):
            top = ref[:, g:g + h, :]
            bot = ref[:, g + h:g + seg, :]
            r0 = diags[lvl][g:g + h, :][None, :, :]
            r1 = diags[lvl][g + h:g + seg, :][None, :, :]
            if trans:
                nt = r0 * (top + bot)
                nb_ = r1 * (top - bot)
            else:
                nt = r0 * top + r1 * bot
                nb_ = r0 * top - r1 * bot
            ref[:, g:g + h, :] = nt * _SQRT_HALF
            ref[:, g + h:g + seg, :] = nb_ * _SQRT_HALF


def _bf_mat_cols(ref, diags, n, depth, trans):
    """Mix matrix COLUMNS (axis 0 of [cols, rows, lanes])."""
    levels = list(range(depth))
    if not trans:
        levels = levels[::-1]
    for lvl in levels:
        seg = n >> lvl
        h = seg // 2
        for g in range(0, n, seg):
            top = ref[g:g + h, :, :]
            bot = ref[g + h:g + seg, :, :]
            r0 = diags[lvl][g:g + h, :][:, None, :]
            r1 = diags[lvl][g + h:g + seg, :][:, None, :]
            if trans:
                nt = r0 * (top + bot)
                nb_ = r1 * (top - bot)
            else:
                nt = r0 * top + r1 * bot
                nb_ = r0 * top - r1 * bot
            ref[g:g + h, :, :] = nt * _SQRT_HALF
            ref[g + h:g + seg, :, :] = nb_ * _SQRT_HALF


def _bf_vec(ref, diags, n, depth, trans, off: int = 0):
    """Mix a [n, lanes] vector along axis 0 — the slab starting at
    static row ``off`` of ``ref`` (matrix-RHS kernels stack k RHS
    columns as k row slabs of one [k·n, lanes] scratch)."""
    levels = list(range(depth))
    if not trans:
        levels = levels[::-1]
    for lvl in levels:
        seg = n >> lvl
        h = seg // 2
        for g in range(0, n, seg):
            top = ref[off + g:off + g + h, :]
            bot = ref[off + g + h:off + g + seg, :]
            r0 = diags[lvl][g:g + h, :]
            r1 = diags[lvl][g + h:g + seg, :]
            if trans:
                nt = r0 * (top + bot)
                nb_ = r1 * (top - bot)
            else:
                nt = r0 * top + r1 * bot
                nb_ = r0 * top - r1 * bot
            ref[off + g:off + g + h, :] = nt * _SQRT_HALF
            ref[off + g + h:off + g + seg, :] = nb_ * _SQRT_HALF


def _fused_kernel(a_hbm, b_ref, du0, du1, dv0, dv1, x_ref, bad_ref,
                  work, aux, yv, rv, xv, bo, ipiv, sems, *,
                  n: int, bt: int, nb: int, depth: int, ir_steps: int,
                  hold_orig: bool = True, unroll: int = 1,
                  k_rhs: int = 1):
    """``aux`` is the pristine copy of A when ``hold_orig`` (two-copy
    variant, N ≤ 320) or a ``[_STREAM_CK, n, bt]`` chunk buffer when
    not (streamed-residual variant, N ≤ 448: refinement residuals
    re-read A from HBM in column chunks).  ``k_rhs`` RHS columns are
    stacked as k row slabs of the [k·n, bt] vector scratches — the
    factorization is shared, substitution/refinement loop the slabs
    (VERDICT r4 item 5a; k=1 lowers to the identical round-4
    program)."""
    i = pl.program_id(0)
    dtype = work.dtype
    du = (du0, du1)[:depth]
    dv = (dv0, dv1)[:depth]
    offs = tuple(kk * n for kk in range(k_rhs))

    load = pltpu.make_async_copy(
        a_hbm.at[:, :, pl.ds(i * bt, bt)], work, sems.at[0]
    )
    load.start()
    load.wait()

    amax = jnp.max(jnp.abs(work[:, :, :]), axis=(0, 1))      # [bt]
    if hold_orig:
        # Pristine copy for the f32 refinement residuals.
        aux[:, :, :] = work[:, :, :]
    bo[:, :] = b_ref[:, :]
    bmax = jnp.max(jnp.abs(bo[:, :]), axis=0)                # [bt]

    # A' = Uᵀ A V ; b' = Uᵀ b
    _bf_mat_rows(work, du, n, depth, trans=True)
    _bf_mat_cols(work, dv, n, depth, trans=True)
    yv[:, :] = bo[:, :]
    for off in offs:
        _bf_vec(yv, du, n, depth, trans=True, off=off)

    # ------------------------------------------------------------------
    # Pivot-free LU as rank-1 right-looking sweeps.  The phase loop is
    # static (shrinks the live row/column ranges; rows < k0 are
    # finalized U rows); the column loop WITHIN a phase is a fori_loop
    # whose trailing update is the per-phase-constant block
    # ``work[k0+1:, k0:, :]`` with a column mask ``col > c`` folded
    # into the pivot row — constant extents keep the Mosaic program
    # small (a fully static 2·N-step unroll at N=256 blew past 15 min
    # of remote compile) at the cost of ≤ nb/2 masked-out columns per
    # step (~10% extra VPU work at the bench shape).
    # ------------------------------------------------------------------
    ok = jnp.ones((bt,), dtype)
    for k0 in range(0, n, nb):
        m = n - k0
        W = n - k0 - 1
        riota = lax.broadcasted_iota(jnp.int32, (m, bt), 0)
        cio = lax.broadcasted_iota(jnp.int32, (W, 1, 1), 0) if W else None

        def phase_body(s, ok, k0=k0, riota=riota, cio=cio, W=W):
            # Rank-1 right-looking step.  A rank-2 variant (two pivots
            # per read+write of the block) was MEASURED SLOWER on chip
            # (1.88 vs 1.78 ms e2e at B=N=256): the extra per-step
            # machinery (pivot-2 correction reads/reductions) outweighs
            # the halved block traffic — VMEM bandwidth is not the
            # binding resource here.
            c = k0 + s
            pv = work[pl.ds(c, 1), pl.ds(c, 1), :][0, 0]     # [bt]
            has = (jnp.abs(pv) > 0.0).astype(dtype)
            inv = 1.0 / (pv + (1.0 - has))
            ok = ok * has
            ipiv[pl.ds(c, 1), :] = inv[None, :]
            colp = work[pl.ds(c, 1), k0:, :][0]              # [m, bt]
            below = (riota > s).astype(dtype)
            fm = colp * (inv[None, :] * below)               # multipliers
            work[pl.ds(c, 1), k0:, :] = jnp.where(
                below > 0, fm, colp
            )[None]
            if W > 0:
                pr = work[k0 + 1:, pl.ds(c, 1), :]           # [W, 1, bt]
                prm = pr * (cio >= s).astype(dtype)          # cols > c
                work[k0 + 1:, k0:, :] = (
                    work[k0 + 1:, k0:, :] - prm * fm[None, :, :]
                )
            return ok

        # ``unroll`` amortizes the per-step fori machinery (loop
        # control, dynamic-slice setup) across several rank-1 steps:
        # Mosaic's fori_loop supports only unroll=1 or full unroll, so
        # partial unroll is done manually — a group loop whose body
        # holds ``unroll`` static sub-steps (program grows ×unroll,
        # not ×steps).
        steps = min(nb, n - k0)
        if unroll > 1 and steps % unroll == 0:
            def group_body(g, ok, _u=unroll):
                for j in range(_u):
                    ok = phase_body(g * _u + j, ok)
                return ok

            ok = lax.fori_loop(0, steps // unroll, group_body, ok)
        else:
            ok = lax.fori_loop(0, steps, phase_body, ok)

    # ------------------------------------------------------------------
    # Substitution against the VMEM factors (L unit-lower multipliers
    # below the diagonal; U on/above; ipiv = 1/diag).
    # ------------------------------------------------------------------
    riota_n = lax.broadcasted_iota(jnp.int32, (n, bt), 0)

    def _grouped(body, count):
        """fori with manual partial unroll (see the phase loop note)."""
        if unroll > 1 and count % unroll == 0:
            def gbody(g, carry, _u=unroll):
                for j in range(_u):
                    carry = body(g * _u + j, carry)
                return carry

            lax.fori_loop(0, count // unroll, gbody, 0)
        else:
            lax.fori_loop(0, count, body, 0)

    def _forward(vec):
        def body(c, carry):
            lcol = work[pl.ds(c, 1), :, :][0]                 # [n, bt]
            mask = (riota_n > c).astype(dtype)
            mcol = mask * lcol
            for off in offs:
                yc = vec[pl.ds(off + c, 1), :]                # [1, bt]
                vec[off:off + n, :] = vec[off:off + n, :] - mcol * yc
            return carry

        _grouped(body, n)

    def _backward(vec):
        def body(t, carry):
            c = n - 1 - t
            piv = ipiv[pl.ds(c, 1), :]
            ucol = work[pl.ds(c, 1), :, :][0]
            mask = (riota_n < c).astype(dtype)
            mcol = mask * ucol
            for off in offs:
                xc = vec[pl.ds(off + c, 1), :] * piv          # [1, bt]
                vec[pl.ds(off + c, 1), :] = xc
                vec[off:off + n, :] = vec[off:off + n, :] - mcol * xc
            return carry

        _grouped(body, n)

    _forward(yv)
    _backward(yv)
    xv[:, :] = yv[:, :]
    for off in offs:
        _bf_vec(xv, dv, n, depth, trans=False, off=off)       # x = V y

    # ------------------------------------------------------------------
    # Iterative refinement vs the ORIGINAL system, f32 throughout
    # (gate statistics mirror ops.rbt._solve_core exactly).
    # ------------------------------------------------------------------
    def _residual():
        """rv := bo − A·xv against the ORIGINAL A — from the VMEM copy
        (hold_orig) or streamed from HBM in column chunks (each chunk
        is DMA'd ONCE and reused across the k RHS slabs)."""
        if hold_orig:
            for off in offs:
                rv[off:off + n, :] = bo[off:off + n, :] - jnp.sum(
                    aux[:, :, :]
                    * xv[off:off + n, :][:, None, :], axis=0
                )
        else:
            rv[:, :] = bo[:, :]
            for c0 in range(0, n, _STREAM_CK):
                dma = pltpu.make_async_copy(
                    a_hbm.at[
                        pl.ds(c0, _STREAM_CK), :, pl.ds(i * bt, bt)
                    ],
                    aux, sems.at[0],
                )
                dma.start()
                dma.wait()
                for off in offs:
                    rv[off:off + n, :] = rv[off:off + n, :] - jnp.sum(
                        aux[:, :, :]
                        * xv[off + c0:off + c0 + _STREAM_CK, :][:, None, :],
                        axis=0,
                    )

    rmax = zcmax = xmax = jnp.zeros((bt,), dtype)
    for step in range(ir_steps):
        _residual()
        if step == ir_steps - 1:
            rmax = jnp.max(jnp.abs(rv[:, :]), axis=0)
            xmax = jnp.max(jnp.abs(xv[:, :]), axis=0)
        for off in offs:
            _bf_vec(rv, du, n, depth, trans=True, off=off)
        _forward(rv)
        _backward(rv)
        for off in offs:
            _bf_vec(rv, dv, n, depth, trans=False, off=off)
        if step == ir_steps - 1:
            zcmax = jnp.max(jnp.abs(rv[:, :]), axis=0)
        xv[:, :] = xv[:, :] + rv[:, :]

    if ir_steps == 0:
        _residual()
        rmax = jnp.max(jnp.abs(rv[:, :]), axis=0)

    # NaN-proof per-lane failure flags (nan <= t is False — flag
    # non-small), same thresholds as ops.rbt._solve_core.
    eps = jnp.asarray(1e-30, dtype)
    bad = ok < 0.5
    if ir_steps == 0:
        scale = jnp.maximum(
            bmax, amax * jnp.max(jnp.abs(xv[:, :]), axis=0)
        )
        bad = bad | ~(rmax <= 1e-2 * jnp.maximum(scale, eps))
    else:
        bad = bad | ~(zcmax <= 0.3 * jnp.maximum(xmax, eps))
        if ir_steps >= 2:
            scale = jnp.maximum(bmax, amax * xmax)
            bad = bad | ~(rmax <= 1e-4 * jnp.maximum(scale, eps))

    x_ref[:, :] = xv[:, :]
    bad_ref[:, :] = bad[None, :].astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("nb", "ir_steps", "depth", "interpret",
                     "hold_orig", "unroll", "k_rhs"),
)
def _fused_call(a_t, b_t, du, dv, nb: int, ir_steps: int, depth: int,
                interpret: bool, hold_orig: bool = True,
                unroll: int = 1, k_rhs: int = 1):
    n, _, Bp = a_t.shape
    bt = LANES
    kn = k_rhs * n
    aux_shape = (n, n, bt) if hold_orig else (_STREAM_CK, n, bt)
    kernel = functools.partial(
        _fused_kernel, n=n, bt=bt, nb=nb, depth=depth,
        ir_steps=ir_steps, hold_orig=hold_orig, unroll=unroll,
        k_rhs=k_rhs,
    )
    x_t, bad = pl.pallas_call(
        kernel,
        grid=(Bp // bt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec((kn, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec((n, bt), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 4,
        out_specs=[
            pl.BlockSpec((kn, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kn, Bp), a_t.dtype),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, n, bt), a_t.dtype),   # work (factors)
            pltpu.VMEM(aux_shape, a_t.dtype),    # pristine A / chunk buf
            pltpu.VMEM((kn, bt), a_t.dtype),     # yv (k slabs)
            pltpu.VMEM((kn, bt), a_t.dtype),     # rv
            pltpu.VMEM((kn, bt), a_t.dtype),     # xv
            pltpu.VMEM((kn, bt), a_t.dtype),     # bo
            pltpu.VMEM((n, bt), a_t.dtype),      # ipiv
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(a_t, b_t, du[0], du[1], dv[0], dv[1])
    return x_t, bad


def _diags_lanes(key, n: int, depth: int, dtype):
    from ..rbt import diags_lanes

    return diags_lanes(key, n, depth, dtype, LANES)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nb", "ir_steps", "depth", "interpret", "force_stream",
        "unroll",
    ),
)
def solve_fused_rbt(
    a: jax.Array,
    b: jax.Array,
    keys=(17, 29),
    nb: int = 32,
    ir_steps: int = 2,
    depth: int = 2,
    interpret: bool = False,
    force_stream: bool = False,
    unroll: int = 1,
):
    """One-launch RBT solve of ``a @ x = b``.

    ``b`` may be a vector RHS ``[B, N]`` or a matrix RHS ``[B, N, k]``
    with ``k ≤ MAX_K_RHS`` — the k columns ride the SAME factorization
    as k row slabs of the kernel's vector scratches.  Returns
    ``(x, bad [B])`` with ``x`` shaped like ``b`` — per-lane failure
    flags with the same semantics as ``ops.rbt._solve_core(gate=True)``
    (for matrix RHS the gate statistics max over all columns); rescue
    policy is the caller's (``ops.rbt.pallas_solve_rbt_batched``).
    N ≤ 320 holds a pristine VMEM copy of A for the refinement
    residuals; N = 352..448 streams A back from HBM in column chunks
    instead (``supported_streamed``)."""
    B, N, _ = a.shape
    matrix_rhs = b.ndim == 3
    k = b.shape[-1] if matrix_rhs else 1
    hold = supported(N, nb, k) and not force_stream
    assert hold or (k == 1 and supported_streamed(N, nb)), (
        f"solve_fused_rbt: N={N} (nb={nb}, k={k}) exceeds the VMEM "
        f"variants"
    )
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a32 = a.astype(f32)
    b32 = (b if matrix_rhs else b[:, :, None]).astype(f32)

    d = depth
    while d > 1 and (N >> (d - 1)) % 2:
        d -= 1
    du = _diags_lanes(jax.random.PRNGKey(keys[0]), N, d, f32)
    dv = _diags_lanes(jax.random.PRNGKey(keys[1]), N, d, f32)

    pad = (-B) % LANES
    if pad:
        filler = jnp.broadcast_to(jnp.eye(N, dtype=f32), (pad, N, N))
        a32 = jnp.concatenate([a32, filler], axis=0)
        b32 = jnp.concatenate(
            [b32, jnp.ones((pad, N, k), f32)], axis=0
        )
    a_t = jnp.transpose(a32, (2, 1, 0))    # [col j, row i, batch]
    # [k·n, batch]: RHS column kk = row slab kk*n .. (kk+1)*n
    b_t = jnp.transpose(b32, (2, 1, 0)).reshape(k * N, B + pad)
    x_t, bad = _fused_call(
        a_t, b_t, du, dv, nb, ir_steps, d, interpret, hold_orig=hold,
        unroll=unroll, k_rhs=k,
    )
    x = jnp.transpose(x_t.reshape(k, N, B + pad), (2, 1, 0))[:B]
    if not matrix_rhs:
        x = x[:, :, 0]
    return x, bad[0, :B].astype(bool)
