"""Random-butterfly-preconditioned pivot-free LU solve.

The pivoted Pallas solve's binding constraint is the pivot dependency
chain: N sequential in-kernel steps each paying a pivot search
(STATUS ceiling model — two-level panels that shrink the arithmetic
are measured NEUTRAL).  This module removes the chain: precondition
``A' = Uᵀ A V`` with depth-2 RANDOM BUTTERFLY transforms (Parker's
construction; O(N²·B) elementwise work, no GEMMs), after which LU
WITHOUT PIVOTING is stable for generic input with probability ~1,
then factor with the search-free kernel
(``ops.pallas.lu_nopivot_kernel`` — pivot(c) = row c, both dimensions
of the trailing block shrink every phase).  Iterative refinement runs
against the ORIGINAL system, and a per-lane residual gate rescues any
lane the probabilistic argument fails (growth blowup, exactly-zero
pivot) through the pivoted path — the same safety structure as the
mixed-precision solve's bf16-divergence fallback.

No counterpart in the reference (exact rational arithmetic needs no
pivel conditioning); the TPU-native translation of "make the cheap
path safe, verify, escalate the rest".
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .lu_blocked import (
    _HIGH,
    blocked_solve_batched,
    invert_unit_lower,
    invert_upper,
)

_SQRT_HALF = 0.7071067811865476


def rbt_diags(key: jax.Array, n: int, depth: int, dtype) -> list:
    """Per-level butterfly diagonals: ``depth`` arrays of shape [n]
    with entries ``exp(r/10)``, r ~ U(−1, 1) (Parker's scaling keeps
    the transform's condition number ≤ e^{0.2·depth})."""
    keys = jax.random.split(key, depth)
    return [
        jnp.exp(
            jax.random.uniform(k, (n,), dtype, minval=-1.0, maxval=1.0)
            / 10.0
        )
        for k in keys
    ]


def diags_lanes(key: jax.Array, n: int, depth: int, dtype, lanes: int):
    """Butterfly diagonals broadcast to an ``[n, lanes]`` kernel
    layout; always two arrays (level 1 all-ones at depth 1) — shared
    by the fused solve/inverse Pallas kernels."""
    ds = rbt_diags(key, n, depth, dtype)
    while len(ds) < 2:
        ds = ds + [jnp.ones((n,), dtype)]
    return tuple(
        jnp.broadcast_to(d[:, None], (n, lanes)).astype(dtype)
        for d in ds
    )


def _bf_level(x: jax.Array, r: jax.Array, seg: int, trans: bool):
    """One butterfly level along axis 1 of ``x [B, N, K]``: block-diag
    of ``N/seg`` butterflies ``B = (1/√2)[[R0, R1], [R0, −R1]]`` with
    per-level diagonal ``r [N]`` (R0 = top half of each segment's
    entries, R1 = bottom half).  ``trans`` applies ``Bᵀ``."""
    B, n, K = x.shape
    h = seg // 2
    xs = x.reshape(B, n // seg, 2, h, K)
    rs = r.reshape(n // seg, 2, h)[None, :, :, :, None]
    top, bot = xs[:, :, 0], xs[:, :, 1]
    r0, r1 = rs[:, :, 0], rs[:, :, 1]
    if trans:
        # Bᵀ = (1/√2)[[R0, R0], [R1, −R1]]
        out_top = r0 * (top + bot)
        out_bot = r1 * (top - bot)
    else:
        out_top = r0 * top + r1 * bot
        out_bot = r0 * top - r1 * bot
    out = jnp.stack([out_top, out_bot], axis=2) * _SQRT_HALF
    return out.reshape(B, n, K)


def _butterfly_two_sided_fast(
    a: jax.Array, diags_rows, diags_cols, trans: bool,
    interpret: bool,
) -> jax.Array:
    """Two-sided butterfly on a ``[B, N, N]`` batch through the fused
    one-pass Pallas kernel when the shape supports it (~6x less HBM
    traffic than the per-level passes + transposes), else the XLA
    fallback.  ``trans=True``: rows by Bᵀ(diags_rows), cols by
    Bᵀ(diags_cols) — the preconditioning ``UᵀAV``.  ``trans=False``:
    rows by B(diags_rows), cols by B(diags_cols) — the reconstruction
    ``V X Uᵀ`` with ``diags_rows=diags_v, diags_cols=diags_u``."""
    from .pallas import butterfly_kernel as _bfk

    n = a.shape[-1]
    depth = len(diags_rows)
    # interpret=True (CPU tests) takes the XLA path: interpret-mode
    # Pallas is orders of magnitude slower and the kernel's math is
    # differentially tested on its own (TestButterflyKernel).
    if not interpret and depth in (1, 2) and _bfk.supported(n, depth):
        return _bfk.butterfly_two_sided(
            a, tuple(diags_rows), tuple(diags_cols), depth=depth,
            trans_rows=trans, trans_cols=trans, interpret=False,
        )
    x = butterfly_apply(a, diags_rows, trans=trans)
    return jnp.swapaxes(
        butterfly_apply(jnp.swapaxes(x, 1, 2), diags_cols, trans),
        1, 2,
    )


def butterfly_apply(
    x: jax.Array, diags: list, trans: bool = False
) -> jax.Array:
    """Apply the depth-d butterfly ``W = B_n ∘ diag(B_{n/2},…) ∘ …``
    (or ``Wᵀ``) along axis 1 of ``[B, N, K]``.  ``W`` is orthogonal up
    to the diagonal scalings, never materialized — each level is one
    elementwise pass."""
    n = x.shape[1]
    depth = len(diags)
    levels = list(range(depth))  # level ℓ: segment size n >> ℓ
    if not trans:
        levels = levels[::-1]    # innermost first, outer B_n last
    for lvl in levels:
        x = _bf_level(x, diags[lvl], n >> lvl, trans)
    return x


class _NoPivotPhases:
    __slots__ = ("panels", "u12s", "l11s_inv", "u11s_inv", "ok", "ys")

    def __init__(self, panels, u12s, l11s_inv, u11s_inv, ok, ys):
        self.panels = panels
        self.u12s = u12s
        self.l11s_inv = l11s_inv
        self.u11s_inv = u11s_inv
        self.ok = ok
        self.ys = ys


def _nopivot_lu_phases(
    a: jax.Array, nb: int, interpret: bool,
    rhs: Optional[jax.Array] = None, lookahead: int = 2,
) -> _NoPivotPhases:
    """Phase loop around the search-free kernel.  With the row order
    fixed, BOTH dimensions of the trailing block shrink every phase
    (the pivoted loop must keep all N rows alive)."""
    from .pallas.lu_nopivot_kernel import panel_factor_nopivot

    B, N, _ = a.shape
    trail = a
    dtype = trail.dtype
    eye_nb = jnp.eye(nb, dtype=dtype)
    ok = jnp.ones((B,), bool)
    panels, u12s, l11s_inv, l11u11s = [], [], [], []
    ys = [] if rhs is not None else None

    for k0 in range(0, N, nb):
        panel = trail[:, :, :nb]          # [B, M, nb]
        panel_u, pok = panel_factor_nopivot(
            panel, nb, interpret=interpret, lookahead=lookahead
        )
        ok = ok & pok
        panels.append(panel_u)
        L11U11 = panel_u[:, :nb, :]       # static slice — rows fixed
        L21 = panel_u[:, nb:, :]          # [B, M−nb, nb]
        l11i = invert_unit_lower(jnp.tril(L11U11, -1) + eye_nb)
        l11s_inv.append(l11i)
        l11u11s.append(L11U11)
        if ys is not None:
            y_i = l11i @ rhs[:, :nb, :]
            ys.append(y_i)
            rhs = rhs[:, nb:, :] - L21 @ y_i
        if trail.shape[2] > nb:
            # One-shot corner slices: the old two-step narrowing
            # (`trail[:, :, nb:]` then `trail[:, nb:, :]`) materialized
            # an extra [B, M, W] copy per phase (~48 MB at the bench
            # shape); slicing the corner once lets XLA fuse the read
            # into the trailing-update subtraction.
            U12 = l11i @ trail[:, :nb, nb:]
            u12s.append(U12)
            trail = trail[:, nb:, nb:] - L21 @ U12
        else:
            trail = trail[:, nb:, nb:]

    # Per-phase Neumann inverses: measured FASTER than one stacked
    # call (0.037 ms x m vs 0.29 ms stacked [1024,64,64] + concat,
    # examples/bench_r3_micro3.py) — batched-GEMM throughput at
    # [B, nb, nb] already saturates at B=256.
    u11s_inv = [invert_upper(jnp.triu(x)) for x in l11u11s]
    return _NoPivotPhases(panels, u12s, l11s_inv, u11s_inv, ok, ys)


def _nopivot_backward(ph: _NoPivotPhases, ys, m: int, nb: int):
    xs: List = [None] * m
    for i in reversed(range(m)):
        r = ys[i]
        for j in range(i + 1, m):
            w0 = (j - i - 1) * nb
            r = r - ph.u12s[i][:, :, w0:w0 + nb] @ xs[j]
        xs[i] = ph.u11s_inv[i] @ r
    return jnp.concatenate(xs, axis=1)


def _nopivot_solve(ph: _NoPivotPhases, b3, m: int, nb: int):
    """Forward + backward substitution for a fresh RHS against the
    shrinking-phase artifacts (refinement workhorse)."""
    rhs = b3
    ys = []
    for i in range(m):
        y_i = ph.l11s_inv[i] @ rhs[:, :nb, :]
        ys.append(y_i)
        rhs = rhs[:, nb:, :]
        if rhs.shape[1]:
            rhs = rhs - ph.panels[i][:, nb:, :] @ y_i
    return _nopivot_backward(ph, ys, m, nb)


def _explicit_inverse_from_phases(ph: _NoPivotPhases, N: int, nb: int):
    """Build the FULL preconditioned inverse ``inv_p = U⁻¹ L⁻¹`` from
    the phase artifacts by BLOCK SUBSTITUTION on matrix right-hand
    sides: block-rows of ``L⁻¹`` forward, then block-rows of
    ``U⁻¹ L⁻¹`` backward — ~``2m²`` batched ``[B, nb, N]``-wide GEMMs
    reusing the per-phase ``l11⁻¹``/``u11⁻¹`` the phases already
    computed.  No D&C concatenate tree, no extra triangular
    inversions."""
    m = N // nb

    # forward: Y_i = l11i_i (E_i - sum_{j<i} L_{i,j} Y_j), full width
    ys: List = []
    eye = jnp.eye(N, dtype=ph.panels[0].dtype)
    for i in range(m):
        acc = jnp.broadcast_to(
            eye[i * nb:(i + 1) * nb, :],
            (ph.panels[0].shape[0], nb, N),
        )
        for j in range(i):
            lij = ph.panels[j][:, (i - j) * nb:(i - j + 1) * nb, :]
            acc = acc - lij @ ys[j]
        ys.append(ph.l11s_inv[i] @ acc)

    # backward: X_i = u11i_i (Y_i - sum_{j>i} U12_{i,j-i-1} X_j)
    xs: List = [None] * m
    for i in reversed(range(m)):
        acc = ys[i]
        for j in range(i + 1, m):
            w0 = (j - i - 1) * nb
            acc = acc - ph.u12s[i][:, :, w0:w0 + nb] @ xs[j]
        xs[i] = ph.u11s_inv[i] @ acc
    return jnp.concatenate(xs, axis=1)


def _phases_full_inverse(
    a_p: jax.Array, nb: int, interpret: bool, lookahead: int
):
    """Factor with the no-pivot panel kernel, then build the FULL
    preconditioned inverse so the first solve and every refinement
    round is ONE batched GEMM against ``inv_p``.

    Round-3 ablation (examples/bench_r3_rbt_ablate.py +
    bench_r3_micro2.py): the phase kernels cost ~0.66 ms while the
    per-phase backward substitution stage cost ~2.27 ms at B=N=256 —
    the motivation for holding the explicit inverse.  A first attempt
    that assembled full L/U and ran the D&C/Neumann
    ``invert_unit_lower``/``invert_upper`` on ``[B, N, N]`` measured
    SLOWER than the walk it replaced (5.7 vs 4.3 ms e2e); this version
    block-substitutes directly from the phase artifacts instead."""
    N = a_p.shape[1]
    ph = _nopivot_lu_phases(a_p, nb, interpret, lookahead=lookahead)
    return _explicit_inverse_from_phases(ph, N, nb), ph.ok


def _inverse_core(
    a32: jax.Array,
    nb: int,
    ns_steps: int,
    factor_precision: str,
    d: int,
    keys: Tuple[int, int],
    interpret: bool,
    lookahead: int,
    gate: bool,
    engine: str = "kernel",
    leaf: int = 16,
):
    """One fallback-free RBT inverse pass: ``A⁻¹ = V (UᵀAV)⁻¹ Uᵀ``
    with ``ns_steps`` Newton–Schulz polish rounds against the ORIGINAL
    matrix.  With ``gate`` also returns per-lane failure flags.
    ``engine="recursive"`` replaces the no-pivot panel kernel with the
    log-depth GEMM Schur recursion (``ops.lu_recursive``)."""
    B, N, _ = a32.shape
    m = N // nb
    f32 = a32.dtype
    diags_u = rbt_diags(jax.random.PRNGKey(keys[0]), N, d, f32)
    diags_v = rbt_diags(jax.random.PRNGKey(keys[1]), N, d, f32)

    with jax.default_matmul_precision(factor_precision):
        a_p = _butterfly_two_sided_fast(
            a32, diags_u, diags_v, trans=True, interpret=interpret
        )
        if engine == "recursive":
            from .lu_recursive import inverse_nopivot_recursive

            inv_p, rec_ok = inverse_nopivot_recursive(a_p, leaf=leaf)
            ph = _NoPivotPhases(None, None, None, None, rec_ok, None)
        elif engine == "hybrid":
            inv_p, hy_ok = _phases_full_inverse(
                a_p, nb, interpret, lookahead
            )
            ph = _NoPivotPhases(None, None, None, None, hy_ok, None)
        elif m == 1:
            ph = _nopivot_lu_phases(
                a_p, nb, interpret, lookahead=lookahead
            )
            inv_p = ph.u11s_inv[0] @ ph.l11s_inv[0]
        else:
            eye = jnp.broadcast_to(jnp.eye(N, dtype=f32), (B, N, N))
            ph = _nopivot_lu_phases(
                a_p, nb, interpret, rhs=eye, lookahead=lookahead
            )
            inv_p = _nopivot_backward(ph, ph.ys, m, nb)
        # A⁻¹ = V inv_p Uᵀ: rows by V, columns by U.
        x = _butterfly_two_sided_fast(
            inv_p, diags_v, diags_u, trans=False, interpret=interpret
        )

    eye_n = jnp.eye(N, dtype=f32)
    rmax = None
    for _ in range(ns_steps):
        with jax.default_matmul_precision("float32"):
            r = eye_n - a32 @ x
        if gate:
            rmax = jnp.max(jnp.abs(r), axis=(1, 2))
        with jax.default_matmul_precision("float32"):
            x = x + x @ r

    if not gate:
        return x, None

    bad = ~ph.ok
    if rmax is None:  # ns_steps=0: pay one explicit residual
        with jax.default_matmul_precision("float32"):
            r = eye_n - a32 @ x
        rmax = jnp.max(jnp.abs(r), axis=(1, 2))
    # Pre-correction residual of the LAST Newton–Schulz round: a
    # convergent lane sits near the f32 floor; divergence or NaN
    # fails the comparison (NaN-proof: `nan <= t` = False).
    bad |= ~(rmax <= 1e-2)
    return x, bad


def _pivoted_inverse(a32: jax.Array, nb: int, interpret: bool):
    """The deterministic pivoted inverse (innermost rescue)."""
    from .pallas import gj_kernel as _gjk

    N = a32.shape[-1]
    if _gjk.supported(N, 2 * N):
        return _gjk.inverse_batched(a32, interpret=interpret)
    from .lu_blocked import blocked_inverse_batched

    return blocked_inverse_batched(a32, nb=nb)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nb", "ns_steps", "factor_precision", "depth", "interpret",
        "fallback", "lookahead", "engine", "leaf",
    ),
)
def pallas_inverse_rbt_batched(
    a: jax.Array,
    nb: int = 64,
    ns_steps: int = 1,
    factor_precision: str = "float32",
    depth: int = 2,
    interpret: bool = False,
    fallback: str | bool = "redraw",
    lookahead: int = 8,
    engine: str = "kernel",
    leaf: int = 16,
) -> jax.Array:
    """Batched inverse via RBT preconditioning + pivot-free LU.

    ``A⁻¹ = V (UᵀAV)⁻¹ Uᵀ``: the butterflies are four elementwise
    passes, the preconditioned inverse is the no-pivot panel kernel
    (≈ n³/3 VPU work) plus D&C triangular inverses and one GEMM — all
    MXU — versus the pivoted Gauss–Jordan kernel's 2n³ in-kernel VPU
    work on ``[A | I]``.  ``ns_steps`` Newton–Schulz rounds
    (``X += X(I − AX)``, two GEMMs each) polish the result against the
    ORIGINAL matrix, so butterfly conditioning and factor precision
    wash out.  ``fallback``: per-lane gate on the last Newton–Schulz
    residual; ``"redraw"`` (default) rescues failed lanes through an
    independent second draw with the deterministic pivoted
    Gauss–Jordan rescue NESTED inside (the cheap-branch structure of
    the solve — see ``pallas_solve_rbt_batched``); ``"pivoted"``
    rescues directly through the pivoted kernel."""
    B, N, _ = a.shape
    nb = min(nb, N)
    assert N % nb == 0, f"N={N} must be divisible by nb={nb}"
    if fallback is True:
        fallback = "redraw"
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a32 = a.astype(f32)

    d = depth
    while (N >> (d - 1)) % 2:
        d -= 1

    core = functools.partial(
        _inverse_core, a32, nb, ns_steps, factor_precision, d,
        interpret=interpret, lookahead=lookahead, engine=engine,
        leaf=leaf,
    )
    x, bad = core(keys=(17, 29), gate=bool(fallback))

    if fallback == "redraw":

        def _rescue(xx):
            y2, bad2 = core(keys=(101, 103), gate=True)

            def _rescue2(yy):
                yp = _pivoted_inverse(a32, nb, interpret)
                return jnp.where(bad2[:, None, None], yp, yy)

            y2 = jax.lax.cond(
                jnp.any(bad2), _rescue2, lambda yy: yy, y2
            )
            return jnp.where(bad[:, None, None], y2, xx)

        x = jax.lax.cond(jnp.any(bad), _rescue, lambda xx: xx, x)
    elif fallback == "pivoted":

        def _rescue_piv(xx):
            yp = _pivoted_inverse(a32, nb, interpret)
            return jnp.where(bad[:, None, None], yp, xx)

        x = jax.lax.cond(jnp.any(bad), _rescue_piv, lambda xx: xx, x)

    return x.astype(a.dtype) if a.dtype != f32 else x


def _solve_core(
    a32: jax.Array,
    b3: jax.Array,
    nb: int,
    ir_steps: int,
    factor_precision: str,
    d: int,
    keys: Tuple[int, int],
    interpret: bool,
    lookahead: int,
    gate: bool,
    engine: str = "kernel",
    leaf: int = 16,
):
    """One fallback-free RBT solve pass: butterfly, no-pivot factor,
    substitution, ``ir_steps`` refinement rounds against the ORIGINAL
    system.  With ``gate`` also returns the per-lane failure flags
    (zero pivot / non-contracting refinement), computed from values the
    refinement loop already produced — the gate itself adds no
    post-loop full-matrix passes.  ``engine="recursive"`` factors with
    the log-depth GEMM Schur recursion (``ops.lu_recursive``) instead
    of the no-pivot panel kernel: the preconditioned inverse is built
    once (all MXU work), then every solve is one GEMM."""
    B, N, _ = a32.shape
    m = N // nb
    f32 = a32.dtype
    diags_u = rbt_diags(jax.random.PRNGKey(keys[0]), N, d, f32)
    diags_v = rbt_diags(jax.random.PRNGKey(keys[1]), N, d, f32)

    if gate:
        amax = jnp.max(jnp.abs(a32), axis=(1, 2))
        bmax = jnp.max(jnp.abs(b3), axis=(1, 2))

    with jax.default_matmul_precision(factor_precision):
        # A' = Uᵀ A V  (fused one-pass kernel where supported)
        a_p = _butterfly_two_sided_fast(
            a32, diags_u, diags_v, trans=True, interpret=interpret
        )
        b_p = butterfly_apply(b3, diags_u, trans=True)
        if engine == "recursive":
            from .lu_recursive import inverse_nopivot_recursive

            inv_p, rec_ok = inverse_nopivot_recursive(a_p, leaf=leaf)
            ph = _NoPivotPhases(None, None, None, None, rec_ok, None)
            y = inv_p @ b_p
        elif engine == "hybrid":
            inv_p, hy_ok = _phases_full_inverse(
                a_p, nb, interpret, lookahead
            )
            ph = _NoPivotPhases(None, None, None, None, hy_ok, None)
            y = inv_p @ b_p
        else:
            ph = _nopivot_lu_phases(
                a_p, nb, interpret, rhs=b_p, lookahead=lookahead
            )
            y = _nopivot_backward(ph, ph.ys, m, nb)
        x = butterfly_apply(y, diags_v, trans=False)

    rmax = xmax = zcmax = None
    for step in range(ir_steps):
        with jax.default_matmul_precision("float32"):
            resid = b3 - a32 @ x
        if gate and step == ir_steps - 1:
            rmax = jnp.max(jnp.abs(resid), axis=(1, 2))
            xmax = jnp.max(jnp.abs(x), axis=(1, 2))
        with jax.default_matmul_precision(factor_precision):
            rp = butterfly_apply(resid, diags_u, trans=True)
            if engine in ("recursive", "hybrid"):
                z = inv_p @ rp
            else:
                z = _nopivot_solve(ph, rp, m, nb)
            zc = butterfly_apply(z, diags_v, trans=False)
            if gate and step == ir_steps - 1:
                zcmax = jnp.max(jnp.abs(zc), axis=(1, 2))
            x = x + zc

    if not gate:
        return x, None

    # NaN-proof flags: blowups produce inf/nan, and `nan <= t` is
    # False — flag NON-small.
    bad = ~ph.ok
    if ir_steps == 0:  # no refinement: pay one explicit residual
        with jax.default_matmul_precision("float32"):
            resid = b3 - a32 @ x
        rmax = jnp.max(jnp.abs(resid), axis=(1, 2))
        scale = jnp.maximum(
            bmax, amax * jnp.max(jnp.abs(x), axis=(1, 2))
        )
        # Raw no-pivot solve at factor_precision: loose gate.
        bad |= ~(rmax <= 1e-2 * jnp.maximum(scale, 1e-30))
    else:
        # Contraction: a convergent lane's final correction is a
        # small fraction of the iterate; divergence/NaN is not.
        bad |= ~(zcmax <= 0.3 * jnp.maximum(xmax, 1e-30))
        if ir_steps >= 2:
            # The gated residual has had >= 1 correction applied:
            # anything above 1e-4 relative means the refinement is
            # not converging at this precision.
            scale = jnp.maximum(bmax, amax * xmax)
            bad |= ~(rmax <= 1e-4 * jnp.maximum(scale, 1e-30))
    return x, bad


def _compacted_rescue(
    core2, pivoted, a32, b3, x, bad, K: int
):
    """Lane-compacted rescue (VERDICT r3 item 2): gather up to ``K``
    flagged lanes into a fixed sub-batch, re-run the redraw pipeline on
    THAT sub-batch only (one kernel tile instead of the whole batch),
    with the deterministic pivoted rescue nested inside for lanes that
    fail twice; scatter the rescued lanes back.  If more than ``K``
    lanes flag, fall back to the full-batch redraw (k=1 must be cheap;
    mass failure is allowed to cost a full pass).

    ``core2(a_sub, b_sub) -> (x2, bad2)`` re-runs the gated pipeline
    with independent keys; ``pivoted(a_sub, b_sub) -> x`` is the
    deterministic fallback."""
    B = a32.shape[0]
    f32 = a32.dtype

    def _full(xx):
        y2, bad2 = core2(a32, b3)

        def _resc2(yy):
            yp = pivoted(a32, b3)
            return jnp.where(bad2[:, None], yp, yy)

        y2 = jax.lax.cond(jnp.any(bad2), _resc2, lambda yy: yy, y2)
        return jnp.where(bad[:, None], y2, xx)

    if K >= B:
        return jax.lax.cond(jnp.any(bad), _full, lambda xx: xx, x)

    def _compact(xx):
        # flagged lanes first (top_k on 0/1 scores; ties keep index
        # order, so unflagged filler lanes are harmless re-solves)
        _, idx = jax.lax.top_k(bad.astype(jnp.int32), K)
        a_sub = jnp.take(a32, idx, axis=0)
        b_sub = jnp.take(b3, idx, axis=0)
        y2, bad2 = core2(a_sub, b_sub)

        def _resc2(yy):
            yp = pivoted(a_sub, b_sub)
            return jnp.where(bad2[:, None], yp, yy)

        y2 = jax.lax.cond(jnp.any(bad2), _resc2, lambda yy: yy, y2)
        # scatter: one-hot GEMM (TPU-friendly; ops/select.py pattern).
        # HIGHEST precision is mandatory: the default bf16 pass rounds
        # the rescued VALUES (measured: a rescued kappa~9e3 lane came
        # back with resid 0.65 instead of 8e-4).
        sel = jax.nn.one_hot(idx, B, dtype=f32)          # [K, B]
        upd = jnp.einsum(
            "kb,kn->bn", sel, y2,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.where(bad[:, None], upd, xx)

    def _dispatch(xx):
        return jax.lax.cond(
            jnp.sum(bad.astype(jnp.int32)) <= K, _compact, _full, xx
        )

    return jax.lax.cond(jnp.any(bad), _dispatch, lambda xx: xx, x)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nb", "ir_steps", "factor_precision", "depth", "interpret",
        "fallback", "lookahead", "engine", "leaf",
    ),
)
def pallas_solve_rbt_batched(
    a: jax.Array,
    b: jax.Array,
    nb: Optional[int] = None,
    ir_steps: int = 2,
    factor_precision: str = "bfloat16",
    depth: int = 2,
    interpret: bool = False,
    fallback: str | bool = "redraw",
    lookahead: int = 32,
    engine: str = "auto",
    leaf: int = 16,
) -> jax.Array:
    """Solve ``a @ x = b`` via RBT preconditioning + pivot-free LU +
    iterative refinement (+ per-lane rescue).

    The refinement residual is computed against the ORIGINAL system at
    full f32 precision, so the butterfly's conditioning and the
    factorization's ``factor_precision`` both wash out of the final
    accuracy exactly as in ``pallas_solve_mixed_batched``.  The
    butterfly diagonals use a fixed key — determinism across calls.

    ``fallback`` (rescue of lanes the per-lane gate flags — zero pivot,
    growth blowup, non-contracting refinement):

    - ``"redraw"`` (default): rerun the SAME pipeline with independent
      butterflies, with the deterministic pivoted rescue NESTED inside
      for lanes that fail twice.  Measured on chip: the outer branch
      costs ~0.3 ms untaken (it reuses the main path's kernels, so the
      ``lax.cond`` operands keep their layouts), while a directly
      captured pivoted branch forces ~64 MB of unconditional layout
      copies (~0.75 ms) — the conditional ITSELF is free
      (cond-with-trivial-branch == pure-where gate == 789 GFLOP/s vs
      809 no-fallback, examples/bench_r2_rbt4.py).
    - ``"pivoted"``: the direct pivoted-branch rescue (one cond, eats
      the layout copies; kept for measurement).
    - ``False``: no gate, no rescue (callers residual-check
      themselves)."""
    B, N, _ = a.shape
    if nb is None:
        # Measured optimum is size-dependent (chip sweep, round 3):
        # nb=32 at N=256 (855 vs 808 GF/s), nb=64 at N=512 (759 vs
        # 652) — panel VPU work scales with nb, glue op count with
        # N/nb, and the balance tips between.
        pref = (32, 64, 48, 16, 8) if N <= 384 else (64, 48, 32, 16, 8)
        nb = next((w for w in pref if N % w == 0), None)
        if nb is None:
            if N % 2 == 0:
                # No preferred panel width divides N (e.g. N=100):
                # single-panel fallback — one no-pivot kernel call over
                # the whole matrix.  Compiles fine at the small N where
                # such sizes occur; the tuned widths above exist only
                # because multi-phase shrinking wins when available.
                nb = N
            else:
                raise ValueError(
                    f"pallas_solve_rbt_batched needs even N (butterfly "
                    f"segments); got N={N} — pad the batch or use "
                    f"ops.dispatch with backend='auto'."
                )
    nb = min(nb, N)
    assert N % nb == 0, f"N={N} must be divisible by nb={nb}"
    if fallback is True:
        fallback = "redraw"
    vector_input = b.ndim == 2
    b3 = b[:, :, None] if vector_input else b
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a32 = a.astype(f32)
    b3 = b3.astype(f32)

    d = depth
    while (N >> (d - 1)) % 2:
        d -= 1  # shrink depth until segments stay even

    k_rhs = b3.shape[-1]
    if engine == "auto":
        from .pallas import solve_fused_kernel as _sfk

        # The one-launch fused kernel (butterfly + factor + substitution
        # + refinement, all VMEM-resident) where the shape fits —
        # measured 1.78 vs 3.29 ms for the phase path at B=N=256, and
        # it wins even at half-full lane tiles (785 vs 759 GF/s at
        # B=64 N=256).  The STREAMED-residual variant extends it to
        # N=384, where the N³ lane-padded VPU work only pays at high
        # lane utilization: 1858 vs 1162 GF/s at B=128 N=384, but 644
        # vs 867 at B=64 (half the lanes are filler) — so it routes
        # only when the padded tiles are ≥ 3/4 full.  MATRIX RHS with
        # k ≤ MAX_K_RHS columns rides the same factorization as k
        # vector slabs (round-5 chip A/B: k=8 N=256 B=256 2.26 ms
        # fused vs 3.9 ms phase engine).
        lanes_util_ok = (
            B % _sfk.LANES == 0 or B % _sfk.LANES >= 96
        )
        engine = (
            "fused"
            if (
                _sfk.supported(N, nb, k_rhs)
                or (
                    k_rhs == 1
                    and _sfk.supported_streamed(N, nb)
                    and lanes_util_ok
                )
            )
            else "kernel"
        )

    if engine == "fused":
        from .pallas import solve_fused_kernel as _sfk

        if b3.shape[-1] > _sfk.MAX_K_RHS:
            raise ValueError(
                f"engine='fused' handles at most {_sfk.MAX_K_RHS} RHS "
                f"columns; got {b3.shape[-1]} — use engine='kernel' "
                "(or the default engine='auto', which routes wide "
                "matrix RHS to the phase engine)."
            )
        # The fused kernel's phase width optimum differs from the
        # phase engine's: smaller phases shrink the constant masked
        # trailing block (chip sweep at B=N=256: nb=16 1.46-1.69 ms,
        # nb=32 1.76-1.80, nb=64 1.97-2.05; nb=8 ties 16).
        # unroll=2 amortizes the per-step fori machinery (round-5 chip
        # A/B, examples/bench_r5_unroll_ab.py: u=2 1.571 ms vs u=1
        # 1.671, u=4 1.70-1.76; u=8's Mosaic compile exceeded 18 min —
        # dead end, like round-4's full unroll).
        nbf = 16 if N % 16 == 0 else nb
        unr = 2 if min(nbf, N) % 2 == 0 else 1
        b2 = b3[:, :, 0] if k_rhs == 1 else b3
        x2, bad = _sfk.solve_fused_rbt(
            a32, b2, keys=(17, 29), nb=nbf, ir_steps=ir_steps,
            depth=d, interpret=interpret, unroll=unr,
        )

        def _flat(x):
            return x if k_rhs == 1 else x.reshape(B, N * k_rhs)

        if not fallback:
            if k_rhs == 1:  # kernel returned [B, N]
                return x2 if vector_input else x2[:, :, None]
            return x2

        def _core2(a_s, b_s):
            y, bd = _sfk.solve_fused_rbt(
                a_s, b_s, keys=(101, 103), nb=nbf, ir_steps=ir_steps,
                depth=d, interpret=interpret, unroll=unr,
            )
            return _flat(y), bd

        def _pivoted(a_s, b_s):
            yp = blocked_solve_batched(
                a_s, b_s[:, :, None] if k_rhs == 1 else b_s,
                nb=nb, ir_steps=2,
            )
            return yp[:, :, 0] if k_rhs == 1 else _flat(yp)

        if fallback == "pivoted":
            def _core2(a_s, b_s):  # noqa: F811 — direct pivoted rescue
                yp = _pivoted(a_s, b_s)
                return yp, jnp.zeros(yp.shape[:1], bool)

        from .pallas.solve_fused_kernel import LANES as _SFK_LANES

        x2 = _compacted_rescue(
            _core2, _pivoted, a32, b2, _flat(x2), bad, K=_SFK_LANES
        )
        if k_rhs == 1:
            return x2 if vector_input else x2[:, :, None]
        return x2.reshape(B, N, k_rhs)

    core = functools.partial(
        _solve_core, a32, b3, nb, ir_steps, factor_precision, d,
        interpret=interpret, lookahead=lookahead, engine=engine,
        leaf=leaf,
    )
    x, bad = core(keys=(17, 29), gate=bool(fallback))

    if fallback == "redraw":

        def _rescue(xx):
            y2, bad2 = core(keys=(101, 103), gate=True)

            def _rescue2(yy):
                yp = blocked_solve_batched(a32, b3, nb=nb, ir_steps=2)
                return jnp.where(bad2[:, None, None], yp, yy)

            y2 = jax.lax.cond(
                jnp.any(bad2), _rescue2, lambda yy: yy, y2
            )
            return jnp.where(bad[:, None, None], y2, xx)

        x = jax.lax.cond(jnp.any(bad), _rescue, lambda xx: xx, x)
    elif fallback == "pivoted":

        def _rescue_piv(xx):
            yp = blocked_solve_batched(a32, b3, nb=nb, ir_steps=2)
            return jnp.where(bad[:, None, None], yp, xx)

        x = jax.lax.cond(jnp.any(bad), _rescue_piv, lambda xx: xx, x)

    return x[:, :, 0] if vector_input else x
