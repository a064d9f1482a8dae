"""Extended ("double-double-class") precision on bf16/f32 TPU hardware.

The TPU has no native float64 (and this chip's EMULATED f64 lowering
miscompiles loop-carried linear algebra — see `ops/schur.py`'s guard),
yet f64-class *results* are reachable from pure f32/bf16 arithmetic:

- **Error-free slice GEMMs (Ozaki scheme).** Each f32 operand is
  row/column power-of-two normalized and split into ``t`` slices of
  8-bit signed integers.  Integers ≤ 255 are EXACT in bf16, every
  slice product is ≤ 2¹⁶, and the MXU's f32 accumulator holds sums of
  ≤ 2⁸ such products EXACTLY (2²⁴ integer headroom) — so each of the
  ``t(t+1)/2`` bf16 GEMMs is *error-free*, and bf16 GEMMs are the
  fastest thing this hardware does.  Contractions longer than 256 are
  chunked to stay inside the exact window.
- **Float-float accumulation.** The scaled slice products are summed
  into an unevaluated ``(hi, lo)`` f32 pair with TwoSum /
  FastTwoSum (exact in IEEE f32, elementwise VPU work), keeping
  ~2⁻⁴⁸ relative error — f64-class for normwise purposes.
- **Extended-precision iterative refinement.** ``solve_dd_batched``
  factors once in f32 (the tuned LU) and refines with dd residuals,
  carrying the solution as a dd pair: backward error drops from the
  f32 floor (~1e-7) to ~1e-13 for κ(A) ≲ 1e6.

No reference counterpart (the reference's float path is f64 CPU
arithmetic; this module is what replaces "just use f64" on TPU).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Exact float-float primitives (Knuth TwoSum / Dekker FastTwoSum)
# ---------------------------------------------------------------------------

def two_sum(a, b):
    """Exact sum: returns (s, e) with s = fl(a+b), s + e = a + b.

    The rounded sum is pinned behind an ``optimization_barrier``: in
    some fusion configurations XLA's algebraic simplifier rewrites
    ``(a+b) − a → b`` (numerically unsafe), which zeroes the error
    term — measured as a 4e-8 relative collapse of the dd quotient
    chain in ``_eig_dd_refine`` while the identical graph with
    distinct parameters stayed exact.  The barrier costs nothing
    arithmetic-wise; it only forbids that rewrite."""
    s = jax.lax.optimization_barrier(a + b)
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def fast_two_sum(a, b):
    """Exact sum assuming |a| >= |b| (or a = 0).  Barrier: see
    ``two_sum``."""
    s = jax.lax.optimization_barrier(a + b)
    e = b - (s - a)
    return s, e


def dd_add_f32(hi, lo, t):
    """Add a plain f32 array to a dd pair."""
    s, e = two_sum(hi, t)
    lo = lo + e
    return fast_two_sum(s, lo)


def dd_add_dd(hi, lo, hi2, lo2):
    s, e = two_sum(hi, hi2)
    e = e + (lo + lo2)
    return fast_two_sum(s, e)


def dd_neg(hi, lo):
    return -hi, -lo


# ---------------------------------------------------------------------------
# Ozaki slicing
# ---------------------------------------------------------------------------

_QBITS = 8
_QSCALE = float(2 ** _QBITS)
_KCHUNK = 256  # max contraction per exact-accumulation window


def _pow2_norm(x, axis):
    """Per-slice power-of-two scale 2^E with |x|/2^E < 1 (exact
    multiplications; zero rows get scale 1).

    The scale is built with ``ldexp`` on an INTEGER exponent —
    ``jnp.exp2`` of a large f32 argument is polynomial-evaluated and
    can miss the exact power of two by an ulp (measured: exp2(61) off
    by 6e-7 relative), which silently breaks every error-free-slicing
    guarantee downstream."""
    m = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    e = (jnp.floor(jnp.log2(jnp.maximum(m, 1e-38))) + 1.0).astype(
        jnp.int32
    )
    s = jnp.ldexp(jnp.ones_like(m), e)
    s = jnp.where(m > 0, s, 1.0)
    return x / s, s


def _slice_int8(v, t: int):
    """Split |v| < 1 into ``t`` signed-integer slices a_i ∈ (−256, 256)
    with ``v = Σ a_i·2^{−8(i+1)} + r·2^{−8t}``, |r| < 1.  Every step is
    exact in f32 (power-of-two scaling, trunc, and a subtraction whose
    result is representable)."""
    slices = []
    r = v
    for _ in range(t):
        r = r * _QSCALE
        a = jnp.trunc(r)
        r = r - a
        slices.append(a.astype(jnp.bfloat16))
    return slices


class DDMatmul(NamedTuple):
    hi: jax.Array
    lo: jax.Array


class SlicedMatrix(NamedTuple):
    """A matrix pre-split into Ozaki slices, reusable across many dd
    products (the slicing is elementwise-heavy; ``solve_dd_batched``
    slices A once and reuses it every refinement round)."""

    slices: tuple     # t × [B, m, nc, KCHUNK] bf16 (row-sliced)
    scale: jax.Array  # [B, m, 1]


def slice_rows(a: jax.Array, t: int) -> SlicedMatrix:
    """Slice ``[B, m, k]`` along rows (contraction on axis 2)."""
    va, sa = _pow2_norm(a, axis=2)
    sl = _slice_int8(va, t)
    B, m, k = a.shape
    nc = -(-k // _KCHUNK)
    pad = nc * _KCHUNK - k
    if pad:
        z = jnp.zeros((B, m, pad), jnp.bfloat16)
        sl = [jnp.concatenate([x, z], axis=2) for x in sl]
    sl = [x.reshape(B, m, nc, _KCHUNK) for x in sl]
    return SlicedMatrix(tuple(sl), sa)


def slice_cols(b: jax.Array, t: int) -> SlicedMatrix:
    """Slice ``[B, k, n]`` along columns (contraction on axis 1)."""
    vb, sb = _pow2_norm(b, axis=1)
    sl = _slice_int8(vb, t)
    B, k, n = b.shape
    nc = -(-k // _KCHUNK)
    pad = nc * _KCHUNK - k
    if pad:
        z = jnp.zeros((B, pad, n), jnp.bfloat16)
        sl = [jnp.concatenate([x, z], axis=1) for x in sl]
    sl = [x.reshape(B, nc, _KCHUNK, n) for x in sl]
    return SlicedMatrix(tuple(sl), sb)


# bands s = i+j below this index are accumulated term-exactly (their
# f32 pre-summation error 2^{-24-8s} would exceed the 2^-48 target);
# higher bands are pre-summed in plain f32 before ONE dd add each.
_EXACT_BANDS = 3


def matmul_sliced_dd(sa: SlicedMatrix, sb: SlicedMatrix) -> DDMatmul:
    """dd product of two pre-sliced operands (see
    ``matmul_dd_batched``)."""
    f32 = jnp.float32
    t = len(sa.slices)
    nc = sa.slices[0].shape[2]
    hi = lo = None
    for s in range(t):
        parts = []
        for i in range(s + 1):
            j = s - i
            g = jnp.einsum(
                "bmck,bckn->bcmn", sa.slices[i], sb.slices[j],
                preferred_element_type=f32,
            )                                # [B, nc, m, n] exact
            parts.extend(g[:, c] for c in range(nc))
        ps = 2.0 ** (-_QBITS * (s + 2))
        if hi is None:
            hi = parts[0] * ps
            lo = jnp.zeros_like(hi)
            parts = parts[1:]
        if s < _EXACT_BANDS:
            for p in parts:
                hi, lo = dd_add_f32(hi, lo, p * ps)
        elif parts:
            tot = parts[0]
            for p in parts[1:]:
                tot = tot + p
            hi, lo = dd_add_f32(hi, lo, tot * ps)
    # outer power-of-two scale applied ONCE at the end (exact, and
    # 2 elementwise passes instead of one per term)
    scale = sa.scale * sb.scale
    return DDMatmul(hi * scale, lo * scale)


@functools.partial(jax.jit, static_argnames=("t",))
def matmul_dd_batched(a: jax.Array, b: jax.Array, t: int = 6) -> DDMatmul:
    """``a @ b`` for f32 batches ``[B, m, k] × [B, k, n]`` with
    ~2⁻⁴⁸-relative (f64-class) accuracy, computed ENTIRELY in
    bf16 GEMMs + exact f32 elementwise arithmetic.

    ``t`` slices capture ``8t`` bits below each row/column maximum
    (t=6 → 48 bits ≈ double precision normwise; t=3 → f32-class at a
    third of the cost).  Slice pairs with ``i + j ≥ t`` fall below the
    truncation floor and are skipped: ``t(t+1)/2`` GEMMs total, each a
    native single-pass bf16 MXU op.  The dd-accumulation chains are
    HBM-bound, so bands past ``_EXACT_BANDS`` are pre-summed in plain
    f32 (their rounding sits below 2⁻⁴⁸) — measured 2.3× on chip."""
    f32 = jnp.float32
    return matmul_sliced_dd(
        slice_rows(a.astype(f32), t), slice_cols(b.astype(f32), t)
    )


class DDSolveResult(NamedTuple):
    """dd-refined solve: ``x ≈ x_hi + x_lo``.  ``resid_hi`` is the
    LAST dd residual's max-norm per lane (an f64-class a-posteriori
    bound); ``ok`` = factorization succeeded AND the residual shrank
    to ≤ 1e-10·scale (κ ≳ 1e7 lanes fail honestly)."""

    x_hi: jax.Array
    x_lo: jax.Array
    resid: jax.Array
    ok: jax.Array


def _dd_refine(a, b, x_hi, solve_fn, iters, t):
    """Shared dd refinement: slice A once, refine with error-free
    residuals through ``solve_fn`` until every lane's residual is at
    the dd floor (``lax.while_loop`` — well-conditioned batches exit
    after ~2 rounds, κ ~ 1e5 takes ~8; ``iters`` caps the loop)."""
    f32 = jnp.float32
    B = b.shape[0]
    x_lo = jnp.zeros_like(x_hi)
    a_sl = slice_rows(a, t)     # slice A ONCE, reuse every round
    amax = jnp.max(jnp.abs(a), axis=(1, 2))
    bmax = jnp.max(jnp.abs(b), axis=1)

    def one_round(x_hi, x_lo):
        # r = b − A·x_hi − A·x_lo  (dd; the x_lo product in plain
        # HIGHEST f32 — its own error is ~2⁻²⁴·|x_lo| ≈ 2⁻⁴⁸·|x|)
        p = matmul_sliced_dd(a_sl, slice_cols(x_hi[:, :, None], t))
        r_hi, r_lo = dd_add_f32(-p.hi[:, :, 0], -p.lo[:, :, 0], b)
        ax_lo = jnp.einsum(
            "bij,bj->bi", a, x_lo, precision=_HIGH
        )
        r_hi, r_lo = dd_add_f32(r_hi, r_lo, -ax_lo)
        r = r_hi + r_lo
        d = solve_fn(r)
        x_hi, x_lo = dd_add_f32(x_hi, x_lo, d)
        return x_hi, x_lo, jnp.max(jnp.abs(r), axis=1)

    def target(x_hi):
        return 1e-12 * jnp.maximum(
            jnp.maximum(amax * jnp.max(jnp.abs(x_hi), axis=1), bmax),
            1e-30,
        )

    def cond(c):
        k, x_hi, _, resid = c
        return (k < iters) & jnp.any(resid > target(x_hi))

    def body(c):
        k, x_hi, x_lo, _ = c
        x_hi, x_lo, resid = one_round(x_hi, x_lo)
        return k + 1, x_hi, x_lo, resid

    init = (0, x_hi, x_lo, jnp.full((B,), jnp.inf, f32))
    _, x_hi, x_lo, resid = jax.lax.while_loop(cond, body, init)
    return x_hi, x_lo, resid


def _dd_ok(a, b, x_hi, resid, fac_ok):
    scale = jnp.maximum(
        jnp.max(jnp.abs(a), axis=(1, 2))
        * jnp.max(jnp.abs(x_hi), axis=1),
        jnp.max(jnp.abs(b), axis=1),
    )
    return fac_ok & (resid <= 1e-10 * jnp.maximum(scale, 1e-30))


@functools.partial(
    jax.jit, static_argnames=("iters", "t", "nb", "interpret")
)
@f32_matmuls
def _solve_dd_phases(a, b, iters, t, nb, interpret):
    """Pallas-phase-factored dd solve (the fast path): ONE blocked
    factorization (`lu_blocked._pallas_lu_phases`), correction solves
    through the assembled-free block substitution — the same machinery
    as `pallas_solve_mixed_batched`, with dd residuals."""
    from .lu_blocked import (
        _pallas_lu_phases,
        _phases_backward,
        _phases_solve,
    )
    from .select import onehot_rows

    f32 = jnp.float32
    B, N = b.shape
    b3 = b[:, :, None]
    ph = _pallas_lu_phases(a, nb, interpret, rhs=b3)
    m = N // nb
    later_masks = []
    cum = jnp.zeros((B, N), f32)
    for i in range(m):
        cum = cum + jnp.sum(
            onehot_rows(ph.piv_rows[i], N, f32), axis=1
        )
        later_masks.append((1.0 - cum)[:, :, None])
    x_hi = _phases_backward(ph, ph.ys, m, nb)[:, :, 0]
    x_hi, x_lo, resid = _dd_refine(
        a, b, x_hi,
        lambda r: _phases_solve(
            ph, later_masks, r[:, :, None], m, nb
        )[:, :, 0],
        iters, t,
    )
    return DDSolveResult(
        x_hi, x_lo, resid, _dd_ok(a, b, x_hi, resid, ph.ok)
    )


@functools.partial(jax.jit, static_argnames=("iters", "t"))
@f32_matmuls
def _solve_dd_loop(a, b, iters, t):
    """Loop-LU dd solve (odd N the blocked panels can't tile)."""
    from .lu import lu_factor_batched, lu_solve_batched

    fac = lu_factor_batched(a)
    x_hi = lu_solve_batched(fac, b)
    x_hi, x_lo, resid = _dd_refine(
        a, b, x_hi, lambda r: lu_solve_batched(fac, r), iters, t
    )
    return DDSolveResult(
        x_hi, x_lo, resid, _dd_ok(a, b, x_hi, resid, fac.ok)
    )


def solve_dd_batched(
    a: jax.Array, b: jax.Array, iters: int = 10, t: int = 6,
    nb: int = None, interpret: bool = None,
) -> DDSolveResult:
    """Solve ``A x = b`` (``b`` vectors ``[B, n]``) to f64-CLASS
    backward error on f32 hardware: one blocked Pallas-panel f32 LU +
    ``iters`` rounds of iterative refinement with error-free-GEMM
    (Ozaki) dd residuals, solution carried as a dd pair.

    Convergence: each round multiplies the error by ~κ(A)·2⁻²⁴, so
    κ ≲ 1e6 reaches ~1e-13 relative residual in 2-3 rounds (the plain
    f32 path floors at ~1e-7; measured 3.4e-14 at κ=1e4 on chip).  The
    residual is COMPUTED, not assumed: ``resid`` is the final dd
    residual norm."""
    f32 = jnp.float32
    a = jnp.asarray(a).astype(f32)
    b = jnp.asarray(b).astype(f32)
    N = b.shape[1]
    if nb is None:
        nb = next(
            (w for w in (64, 48, 32, 16, 8) if N % w == 0), None
        )
    if interpret is None:
        from .pallas import is_supported

        interpret = not is_supported()
    if nb is None or N < 16:
        return _solve_dd_loop(a, b, iters, t)
    return _solve_dd_phases(a, b, iters, t, min(nb, N), interpret)


class DDEighResult(NamedTuple):
    """dd-refined symmetric eigenvalues.  ``w`` is the refined
    (hi+lo collapsed to f32 pair) Rayleigh-quotient eigenvalue per
    column; ``w_lo`` the trailing bits; ``resid`` = ‖A v − w v‖₂ per
    column computed in dd (an honest a-posteriori bound:
    |w − λ_true| ≤ resid for symmetric A, Kato–Temple gives resid²/gap
    when the gap is known)."""

    w: jax.Array       # [B, n]
    w_lo: jax.Array    # [B, n]
    V: jax.Array       # [B, n, n] f32 eigenvectors (unrefined)
    resid: jax.Array   # [B, n]
    converged: jax.Array


@functools.partial(jax.jit, static_argnames=("t",))
@f32_matmuls
def eigh_dd_batched(a: jax.Array, t: int = 6) -> DDEighResult:
    """Symmetric eigenvalues to (near-)f64 accuracy on f32 hardware.

    One f32 ``eigh`` gives eigenvectors with residual ~ε₃₂·‖A‖; the
    Rayleigh quotient ``vᵀAv / vᵀv`` evaluated in error-free slice
    GEMMs + float-float arithmetic then carries eigenvalue error
    O(resid²/gap) — for gaps ≳ 1e-3·‖A‖ that is ~1e-11·‖A‖, four
    orders below the f32 eigensolver's own floor, with NO f64
    hardware.  Clustered eigenvalues degrade gracefully toward the
    f32 floor and are visible through ``resid``.

    For symmetric matrices |w − λ| ≤ ‖Av − wv‖/‖v‖ ALWAYS (no gap
    assumption) — ``resid`` is that bound, dd-computed."""
    from .symmetric import eigh_batched

    r = eigh_batched(a)
    f32 = jnp.float32
    a = a.astype(f32)
    sym = (a + jnp.swapaxes(a, 1, 2)) * 0.5
    V = r.V
    # M = A·V in dd (one slice-GEMM product)
    av = matmul_dd_batched(sym, V, t=t)
    # num_i = v_iᵀ (A v_i) in dd: elementwise V*av summed over rows
    # with TwoSum (products V[k,i]*av[k,i] are NOT exact in f32 —
    # split them with TwoProd via fma-free Dekker: on TPU/XLA,
    # jnp.multiply is correctly rounded and fma is unavailable, so use
    # the two_prod split explicitly)
    num_hi, num_lo = _dot_columns_dd(V, av.hi, av.lo)
    den_hi, den_lo = _dot_columns_dd(V, V, jnp.zeros_like(V))
    # w = num / den (den ≈ 1; one Newton step on the dd reciprocal —
    # see _dd_recip for why the TwoProd there is load-bearing).
    inv_hi, inv_lo = _dd_recip(den_hi, den_lo)
    w_hi, w_lo = _dd_mul_dd(num_hi, num_lo, inv_hi, inv_lo)
    # residual ‖Av − w v‖ per column, dd-computed then collapsed
    rz_hi = av.hi - w_hi[:, None, :] * V
    rz_lo = av.lo - w_lo[:, None, :] * V
    resid = jnp.sqrt(jnp.sum((rz_hi + rz_lo) ** 2, axis=1))
    return DDEighResult(w_hi, w_lo, V, resid, r.converged)


def _two_prod(a, b):
    """Dekker exact product: (p, e) with p = fl(a·b), p + e = a·b.
    Split-based (no FMA dependency); exact in IEEE f32.

    The splitter products are pinned behind ``optimization_barrier``:
    in fused graphs XLA's algebraic simplifier can rewrite
    ``a·c − (a·c − a) → a``, collapsing the split (same unsafe-rewrite
    family as the ``two_sum`` barrier — measured as an f32-level
    collapse of the eig_dd quotient)."""
    p = a * b
    c = jnp.float32(4097.0)  # 2^12 + 1 splitter for f32
    a1 = jax.lax.optimization_barrier(a * c)
    ah = a1 - (a1 - a)
    al = a - ah
    b1 = jax.lax.optimization_barrier(b * c)
    bh = b1 - (b1 - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _dot_columns_dd(V, M_hi, M_lo):
    """Column dot products ``Σ_k V[b,k,i]·M[b,k,i]`` in dd (M itself a
    dd pair).  TwoProd for the hi products, plain multiply for the lo
    side (already ≤ 2⁻²⁴ relative)."""
    B, n, m = V.shape
    hi = jnp.zeros((B, m), V.dtype)
    lo = jnp.zeros((B, m), V.dtype)
    p, e = _two_prod(V, M_hi)
    pl = V * M_lo
    # accumulate rows with a scan to keep the TwoSum chains exact

    def body(carry, x):
        hi, lo = carry
        pr, er, plr = x
        hi, lo = dd_add_f32(hi, lo, pr)
        hi, lo = dd_add_f32(hi, lo, er + plr)
        return (hi, lo), None

    (hi, lo), _ = jax.lax.scan(
        body, (hi, lo),
        (jnp.moveaxis(p, 1, 0), jnp.moveaxis(e, 1, 0),
         jnp.moveaxis(pl, 1, 0)),
    )
    return hi, lo


def _dd_mul_dd(a_hi, a_lo, b_hi, b_lo):
    """dd × dd product (error O(eps²))."""
    p, e = _two_prod(a_hi, b_hi)
    e = e + (a_hi * b_lo + a_lo * b_hi)
    return fast_two_sum(p, e)


class DDLstsqResult(NamedTuple):
    """dd-refined least squares.  ``gnorm`` is the final dd-computed
    normal-equations residual ‖Aᵀ(b − Ax)‖∞ per lane — the optimality
    measure (zero at the exact minimizer)."""

    x_hi: jax.Array
    x_lo: jax.Array
    gnorm: jax.Array
    ok: jax.Array


@functools.partial(jax.jit, static_argnames=("iters", "t"))
@f32_matmuls
def lstsq_dd_batched(
    a: jax.Array, b: jax.Array, iters: int = 10, t: int = 6,
) -> DDLstsqResult:
    """Full-rank least squares ``argmin ‖Ax − b‖`` (``a [B, m, n]``,
    m ≥ n, ``b [B, m]``) to near-f64 accuracy on f32 hardware:
    corrected semi-normal equations (Björck's CSNE) with ERROR-FREE dd
    residuals.

    One f32 CholeskyQR2 gives R; each round computes ``r = b − A·x``
    and ``g = Aᵀr`` in dd (Ozaki slice GEMMs — both products reuse
    pre-sliced operands), then corrects through two triangular solves
    ``RᵀR d = g``.  Converges while κ(A)² · 2⁻²⁴ < 1 (κ ≲ 3e3; the
    refinement's dd residual makes the LIMIT the iteration matrix, not
    the residual precision — plain-f32 CSNE floors at ~κ·1e-7)."""
    from .lstsq import qr_batched

    f32 = jnp.float32
    a = a.astype(f32)
    b = b.astype(f32)
    B, m, n = a.shape
    qr = qr_batched(a)
    R = qr.R
    tri = functools.partial(
        jax.lax.linalg.triangular_solve,
        left_side=True, lower=False,
    )

    def corr(g):
        # RᵀR d = g
        y = tri(R, g[:, :, None], transpose_a=True)
        return tri(R, y, transpose_a=False)[:, :, 0]

    # x0 = R⁻¹ Qᵀ b
    qtb = jnp.einsum("bmi,bm->bi", qr.Q, b, precision=_HIGH)
    x_hi = tri(R, qtb[:, :, None])[:, :, 0]
    x_lo = jnp.zeros_like(x_hi)

    a_sl = slice_rows(a, t)
    at_sl = slice_rows(jnp.swapaxes(a, 1, 2), t)
    amax = jnp.max(jnp.abs(a), axis=(1, 2))
    bmax = jnp.max(jnp.abs(b), axis=1)

    def one_round(x_hi, x_lo):
        p = matmul_sliced_dd(a_sl, slice_cols(x_hi[:, :, None], t))
        r_hi, r_lo = dd_add_f32(-p.hi[:, :, 0], -p.lo[:, :, 0], b)
        ax_lo = jnp.einsum("bij,bj->bi", a, x_lo, precision=_HIGH)
        r_hi, r_lo = dd_add_f32(r_hi, r_lo, -ax_lo)
        # g = Aᵀ·(r_hi + r_lo): unlike the square-solve case, the
        # least-squares residual is NOT small at the optimum — the
        # cancellation happens INSIDE Aᵀr — so r_lo must flow through
        # its own product, not be collapsed into r_hi first.
        g = matmul_sliced_dd(at_sl, slice_cols(r_hi[:, :, None], t))
        at_rlo = jnp.einsum(
            "bij,bj->bi", jnp.swapaxes(a, 1, 2), r_lo,
            precision=_HIGH,
        )
        g_hi, g_lo = dd_add_f32(
            g.hi[:, :, 0], g.lo[:, :, 0], at_rlo
        )
        g1 = g_hi + g_lo
        d = corr(g1)
        x_hi, x_lo = dd_add_f32(x_hi, x_lo, d)
        return x_hi, x_lo, jnp.max(jnp.abs(g1), axis=1)

    def target(x_hi):
        return 1e-10 * jnp.maximum(
            amax * jnp.maximum(
                amax * jnp.max(jnp.abs(x_hi), axis=1), bmax
            ),
            1e-30,
        )

    def cond(c):
        k, x_hi, _, gn = c
        return (k < iters) & jnp.any(gn > target(x_hi))

    def body(c):
        k, x_hi, x_lo, _ = c
        x_hi, x_lo, gn = one_round(x_hi, x_lo)
        return k + 1, x_hi, x_lo, gn

    init = (0, x_hi, x_lo, jnp.full((B,), jnp.inf, f32))
    _, x_hi, x_lo, gn = jax.lax.while_loop(cond, body, init)
    ok = qr.ok & (gn <= target(x_hi))
    return DDLstsqResult(x_hi, x_lo, gn, ok)


class DDInverseResult(NamedTuple):
    """dd-refined inverse: ``A⁻¹ ≈ x_hi + x_lo``; ``resid`` =
    ‖I − A·X‖∞ per lane (dd-computed left-residual)."""

    x_hi: jax.Array
    x_lo: jax.Array
    resid: jax.Array
    ok: jax.Array


@functools.partial(jax.jit, static_argnames=("iters", "t"))
@f32_matmuls
def inverse_dd_batched(
    a: jax.Array, iters: int = 6, t: int = 6,
) -> DDInverseResult:
    """Matrix inverse to f64-class residual on f32 hardware: the tuned
    f32 inverse (Pallas Gauss–Jordan / blocked LU via dispatch) +
    Newton–Schulz refinement ``X ← X + X·(I − A·X)`` with the residual
    ``I − A·X`` computed by error-free Ozaki slice GEMMs.  Quadratic:
    each round squares the residual, so 2 rounds take 1e-7 → ~1e-13
    (κ ≲ 1e6; the while_loop exits at the dd floor).  The correction
    product runs in plain HIGHEST f32 — it multiplies a term that is
    already ≤ 2⁻²⁴ relative."""
    from . import dispatch

    f32 = jnp.float32
    a = a.astype(f32)
    B, n, _ = a.shape
    x_hi = dispatch.inverse_batched(a)
    x_lo = jnp.zeros_like(x_hi)
    a_sl = slice_rows(a, t)
    eye = jnp.eye(n, dtype=f32)

    def one_round(x_hi, x_lo):
        p = matmul_sliced_dd(a_sl, slice_cols(x_hi, t))
        r_hi, r_lo = dd_add_f32(-p.hi, -p.lo, eye[None])
        ax_lo = jnp.einsum(
            "bij,bjk->bik", a, x_lo, precision=_HIGH
        )
        r_hi, r_lo = dd_add_f32(r_hi, r_lo, -ax_lo)
        r = r_hi + r_lo
        d = jnp.einsum("bij,bjk->bik", x_hi, r, precision=_HIGH)
        x_hi, x_lo = dd_add_f32(x_hi, x_lo, d)
        return x_hi, x_lo, jnp.max(jnp.abs(r), axis=(1, 2))

    def cond(c):
        k, _, _, resid = c
        return (k < iters) & jnp.any(resid > 1e-12)

    def body(c):
        k, x_hi, x_lo, _ = c
        x_hi, x_lo, resid = one_round(x_hi, x_lo)
        return k + 1, x_hi, x_lo, resid

    init = (0, x_hi, x_lo, jnp.full((B,), jnp.inf, f32))
    _, x_hi, x_lo, resid = jax.lax.while_loop(cond, body, init)
    ok = (resid <= 1e-10) & jnp.all(jnp.isfinite(x_hi), axis=(1, 2))
    return DDInverseResult(x_hi, x_lo, resid, ok)


# ---------------------------------------------------------------------------
# General (non-symmetric) eigenvalue refinement: f64-class spectra on chip
# ---------------------------------------------------------------------------

def _dd_recip(d_hi, d_lo):
    """dd reciprocal by one Newton step.  The correction
    ``e = 1 − d·inv0`` lives entirely BELOW f32 resolution, so
    ``d_hi·inv0`` must be an exact TwoProd — a plain f32 product
    rounds e away and floors the quotient at ~6e-8 (the eigh_dd
    lesson)."""
    inv0 = 1.0 / d_hi
    p, pe = _two_prod(d_hi, inv0)
    e_hi, e_lo = dd_add_f32(
        -p, -(pe + d_lo * inv0), jnp.ones_like(d_hi)
    )
    q, qe = _two_prod(inv0, e_hi)
    return dd_add_f32(q, qe + inv0 * e_lo, inv0)


class DDEigResult(NamedTuple):
    """dd-refined GENERAL (non-symmetric) eigenvalues.

    ``lam_re/lam_im`` carry the refined spectrum as f32 with trailing
    dd bits in ``*_lo``; ``s`` is the per-eigenvalue reciprocal
    condition ``|yᴴx|`` (unit right/left eigenvectors — dgeevx RCONDE);
    ``resid`` the dd-computed ``‖Av − λv‖₂`` per column; ``err_bound``
    the first-order honest bound ``resid / s`` (|λ̂ − λ| ≲ ‖r‖·‖y‖ /
    |yᴴv|) — CLUSTERED or defective eigenvalues show up as small s /
    large err_bound rather than silently-wrong digits."""

    lam_re: jax.Array     # [B, n]
    lam_re_lo: jax.Array  # [B, n]
    lam_im: jax.Array     # [B, n]
    lam_im_lo: jax.Array  # [B, n]
    s: jax.Array          # [B, n]
    resid: jax.Array      # [B, n]
    err_bound: jax.Array  # [B, n]
    valid: jax.Array      # [B, n] both eigenvectors exist
    converged: jax.Array  # [B]


def eig_dd_batched(a: jax.Array, t: int = 6) -> DDEigResult:
    """General real-batch eigenvalues to (near-)f64 accuracy on f32
    hardware — the TPU-native answer to "general spectra cap at f32"
    (native f64 is absent and the emulated-f64 Schur miscompiles,
    `ops/schur.py` guard).

    One f32 Schur pass gives right AND left eigenvectors (left via the
    ``J Tᵀ J`` reversal trick of ``eig_condition_batched``); the
    TWO-SIDED Rayleigh quotient ``λ = yᴴAv / yᴴv`` evaluated against
    the ORIGINAL matrix in error-free slice GEMMs + float-float
    arithmetic is then second-order accurate: eigenvector errors ε of
    the f32 pass contribute O(ε²/s), so separated spectra land at
    ~1e-11·‖A‖ while the dd bilinear forms (~2⁻⁴⁸) stay far below.
    Complex pairs are handled in re/im arithmetic throughout.

    Honesty: clustering/defectiveness defeats quadratic convergence —
    exactly there ``s`` collapses and ``err_bound = resid/s`` grows;
    callers gate on ``err_bound``, never on wishful digits.

    STRUCTURE (load-bearing): the Schur pass is a chunked HOST driver,
    so this entry is not itself jitted; the heavy refinement core
    (trevc, back-transforms, slice GEMMs, compensated dot scans) IS
    jitted; but the final compensated division tail runs EAGERLY,
    op-by-op.  XLA:CPU's fused-loop codegen does not honor the exact
    rounding the float-float chains rely on — the compiled HLO is a
    correct Dekker sequence, yet execution returns a different error
    term than the op-by-op semantics (verified by emulating the
    optimized HLO in numpy f32: emulation exact to 2.8e-16, XLA
    execution off by 3.6e-9 = the collapsed lo word).
    ``optimization_barrier`` does not prevent it (the rewrite happens
    at codegen, below HLO).  Eager dispatch executes each op as its
    own program — no cross-op fusion, exact everywhere; the tail is
    O(B·n) scalars, so the extra dispatches are noise."""
    from .schur import real_schur_vectors

    f32 = jnp.float32
    a32 = a.astype(f32)
    sv = real_schur_vectors(a32)
    (Vr, Vi, Avr_hi, Avr_lo, Avi_hi, Avi_lo, num_re, num_im,
     den_re, den_im, lam0_re, lam0_im, valid) = _eig_dd_core(
        a32, sv.T, sv.Q, sv.scale, t
    )

    # ---- EAGER compensated tail: λ = num·conj(den)/|den|² in dd ----
    den2 = dd_add_dd(
        *_dd_mul_dd(*den_re, *den_re), *_dd_mul_dd(*den_im, *den_im)
    )
    s = jnp.sqrt(jnp.maximum(den2[0], 0.0))  # |yᴴv|, unit y and v
    # defective lanes have yᴴv → 0: guard the reciprocal, fall back to
    # the Schur eigenvalue there (flagged through s / err_bound).
    degenerate = s < jnp.float32(1e-12)
    den2_safe = (jnp.where(degenerate, 1.0, den2[0]),
                 jnp.where(degenerate, 0.0, den2[1]))
    inv_hi, inv_lo = _dd_recip(*den2_safe)
    pre = dd_add_dd(
        *_dd_mul_dd(*num_re, *den_re), *_dd_mul_dd(*num_im, *den_im)
    )
    pim = dd_add_dd(
        *_dd_mul_dd(*num_im, *den_re),
        *dd_neg(*_dd_mul_dd(*num_re, *den_im)),
    )
    lr_hi, lr_lo = _dd_mul_dd(*pre, inv_hi, inv_lo)
    li_hi, li_lo = _dd_mul_dd(*pim, inv_hi, inv_lo)
    lr_hi = jnp.where(degenerate, lam0_re, lr_hi)
    lr_lo = jnp.where(degenerate, 0.0, lr_lo)
    li_hi = jnp.where(degenerate, lam0_im, li_hi)
    li_lo = jnp.where(degenerate, 0.0, li_lo)

    # dd residual ‖Av − λv‖ per column (collapsed pair is plenty at
    # the ~1e-14 scale the bound needs); eager too — the cancellation
    # Av − λv is exactly what fused codegen reorders.
    rr = (Avr_hi - (lr_hi[:, None, :] * Vr - li_hi[:, None, :] * Vi)
          + Avr_lo - (lr_lo[:, None, :] * Vr - li_lo[:, None, :] * Vi))
    ri = (Avi_hi - (lr_hi[:, None, :] * Vi + li_hi[:, None, :] * Vr)
          + Avi_lo - (lr_lo[:, None, :] * Vi + li_lo[:, None, :] * Vr))
    resid = jnp.sqrt(jnp.sum(rr * rr + ri * ri, axis=1))
    err_bound = resid / jnp.maximum(s, jnp.float32(1e-30))

    return DDEigResult(
        lr_hi, lr_lo, li_hi, li_lo, s, resid, err_bound,
        valid, sv.converged,
    )


@functools.partial(jax.jit, static_argnames=("t",))
@f32_matmuls
def _eig_dd_core(a32, T, Q, scale, t: int):
    """Jitted heavy part: eigenvectors, back-transforms, dd A·V, and
    the compensated column dots (their TwoSum chains live inside scan
    bodies, which XLA does not fuse across — verified exact under
    jit).  The division tail is deliberately NOT here: see
    ``eig_dd_batched``'s structure note."""
    from .schur import _eigvals_from_T, _trevc_full

    B, n, _ = a32.shape
    Xr, Xi, valid_r = _trevc_full(T)
    # left eigenvectors: Tᵀ is quasi-LOWER triangular; conjugating by
    # the anti-diagonal J restores upper form with reversed blocks —
    # one extra _trevc_full call (reference-free; see
    # ops/schur.eig_condition_batched for the derivation).
    S = jnp.swapaxes(T, 1, 2)[:, ::-1, ::-1]
    Zr, Zi, valid_l = _trevc_full(S)
    Yr = Zr[:, ::-1, ::-1]
    Yi = Zi[:, ::-1, ::-1]
    valid_l = valid_l[:, ::-1]
    lam0_re, lam0_im = _eigvals_from_T(T)
    lamS_re, lamS_im = _eigvals_from_T(S)
    lamS_im = lamS_im[:, ::-1]
    conj_fix = jnp.abs(lamS_im - lam0_im) < jnp.abs(lamS_im + lam0_im)
    Yi = jnp.where(conj_fix[:, None, :], -Yi, Yi)

    def back(Yr, Yi, mul):
        """T-basis → original basis (A = D⁻¹ Q T Qᵀ D): right eigvecs
        ride D⁻¹Q (mul = 1/scale), left eigvecs ride D Q (mul =
        scale); unit-normalize complex columns."""
        with jax.default_matmul_precision("float32"):
            Vr = jnp.einsum("bij,bjk->bik", Q, Yr, precision=_HIGH)
            Vi = jnp.einsum("bij,bjk->bik", Q, Yi, precision=_HIGH)
        Vr = Vr * mul[:, :, None]
        Vi = Vi * mul[:, :, None]
        nrm = jnp.maximum(
            jnp.sqrt(jnp.sum(Vr * Vr + Vi * Vi, axis=1)), 1e-30
        )
        return Vr / nrm[:, None, :], Vi / nrm[:, None, :]

    Vr, Vi = back(Xr, Xi, 1.0 / scale)
    Wr, Wi = back(Yr, Yi, scale)

    # A·[Vr | Vi] once in dd; split back into the re/im products.
    av = matmul_dd_batched(a32, jnp.concatenate([Vr, Vi], axis=2), t=t)
    Avr_hi, Avi_hi = av.hi[:, :, :n], av.hi[:, :, n:]
    Avr_lo, Avi_lo = av.lo[:, :, :n], av.lo[:, :, n:]

    zero = jnp.zeros_like(Vr)
    # numerator yᴴ(Av) = [yrᵀAvr + yiᵀAvi] + i[yrᵀAvi − yiᵀAvr]
    num_re = dd_add_dd(
        *_dot_columns_dd(Wr, Avr_hi, Avr_lo),
        *_dot_columns_dd(Wi, Avi_hi, Avi_lo),
    )
    num_im = dd_add_dd(
        *_dot_columns_dd(Wr, Avi_hi, Avi_lo),
        *dd_neg(*_dot_columns_dd(Wi, Avr_hi, Avr_lo)),
    )
    # denominator yᴴv
    den_re = dd_add_dd(
        *_dot_columns_dd(Wr, Vr, zero),
        *_dot_columns_dd(Wi, Vi, zero),
    )
    den_im = dd_add_dd(
        *_dot_columns_dd(Wr, Vi, zero),
        *dd_neg(*_dot_columns_dd(Wi, Vr, zero)),
    )
    return (Vr, Vi, Avr_hi, Avr_lo, Avi_hi, Avi_lo, num_re, num_im,
            den_re, den_im, lam0_re, lam0_im, valid_r & valid_l)
