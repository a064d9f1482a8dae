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
    """Exact sum: returns (s, e) with s = fl(a+b), s + e = a + b."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def fast_two_sum(a, b):
    """Exact sum assuming |a| >= |b| (or a = 0)."""
    s = a + b
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


@functools.partial(jax.jit, static_argnames=("t",))
def matmul_dd_batched(a: jax.Array, b: jax.Array, t: int = 6) -> DDMatmul:
    """``a @ b`` for f32 batches ``[B, m, k] × [B, k, n]`` with
    ~2⁻⁴⁸-relative (f64-class) accuracy, computed ENTIRELY in
    bf16 GEMMs + exact f32 elementwise arithmetic.

    ``t`` slices capture ``8t`` bits below each row/column maximum
    (t=6 → 48 bits ≈ double precision normwise; t=3 → f32-class at a
    third of the cost).  Slice pairs with ``i + j ≥ t`` fall below the
    truncation floor and are skipped: ``t(t+1)/2`` GEMMs total, each a
    native single-pass bf16 MXU op (cheaper than one HIGHEST f32
    GEMM's 6 passes for t ≤ 3.5... and ~3.5× one for t = 6)."""
    f32 = jnp.float32
    a = a.astype(f32)
    b = b.astype(f32)
    B, m, k = a.shape
    _, _, n = b.shape
    va, sa = _pow2_norm(a, axis=2)          # sa [B, m, 1]
    vb, sb = _pow2_norm(b, axis=1)          # sb [B, 1, n]
    sl_a = _slice_int8(va, t)
    sl_b = _slice_int8(vb, t)

    # chunk the contraction to keep every accumulation window exact
    nc = -(-k // _KCHUNK)
    pad = nc * _KCHUNK - k
    if pad:
        zpa = jnp.zeros((B, m, pad), jnp.bfloat16)
        zpb = jnp.zeros((B, pad, n), jnp.bfloat16)
        sl_a = [jnp.concatenate([x, zpa], axis=2) for x in sl_a]
        sl_b = [jnp.concatenate([x, zpb], axis=1) for x in sl_b]
    sl_a = [x.reshape(B, m, nc, _KCHUNK) for x in sl_a]
    sl_b = [x.reshape(B, nc, _KCHUNK, n) for x in sl_b]

    hi = jnp.zeros((B, m, n), f32)
    lo = jnp.zeros((B, m, n), f32)
    scale = sa * sb                          # [B, m, n] (outer, exact)
    # descending magnitude: (i + j) ascending
    for s in range(2 * t - 1):
        for i in range(t):
            j = s - i
            if j < 0 or j >= t or i + j >= t:
                continue
            g = jnp.einsum(
                "bmck,bckn->bcmn", sl_a[i], sl_b[j],
                preferred_element_type=f32,
            )                                # [B, nc, m, n] exact
            term_scale = scale * (2.0 ** (-_QBITS * (i + j + 2)))
            for c in range(nc):
                hi, lo = dd_add_f32(hi, lo, g[:, c] * term_scale)
    return DDMatmul(hi, lo)


class DDSolveResult(NamedTuple):
    """dd-refined solve: ``x ≈ x_hi + x_lo``.  ``resid_hi`` is the
    LAST dd residual's max-norm per lane (an f64-class a-posteriori
    bound); ``ok`` = factorization succeeded AND the residual shrank
    to ≤ 1e-10·scale (κ ≳ 1e7 lanes fail honestly)."""

    x_hi: jax.Array
    x_lo: jax.Array
    resid: jax.Array
    ok: jax.Array


@functools.partial(jax.jit, static_argnames=("iters", "t"))
@f32_matmuls
def solve_dd_batched(
    a: jax.Array, b: jax.Array, iters: int = 4, t: int = 6,
) -> DDSolveResult:
    """Solve ``A x = b`` (``b`` vectors ``[B, n]``) to f64-CLASS
    backward error on f32 hardware: one tuned f32 LU factorization +
    ``iters`` rounds of iterative refinement with error-free-GEMM
    (Ozaki) dd residuals, solution carried as a dd pair.

    Convergence: each round multiplies the error by ~κ(A)·2⁻²⁴, so
    κ ≲ 1e6 reaches ~1e-13 relative residual in 2-3 rounds (the plain
    f32 path floors at ~1e-7).  The residual is COMPUTED, not assumed:
    ``resid`` is the final dd residual norm."""
    from .lu import lu_factor_batched, lu_solve_batched

    f32 = jnp.float32
    a = a.astype(f32)
    b = b.astype(f32)
    B, n = b.shape
    fac = lu_factor_batched(a)
    x_hi = lu_solve_batched(fac, b)
    x_lo = jnp.zeros_like(x_hi)
    resid = jnp.zeros((B,), f32)
    for _ in range(iters):
        # r = b − A·x_hi − A·x_lo  (dd; the x_lo product in plain
        # HIGHEST f32 — its own error is ~2⁻²⁴·|x_lo| ≈ 2⁻⁴⁸·|x|)
        p = matmul_dd_batched(a, x_hi[:, :, None], t=t)
        r_hi, r_lo = dd_add_f32(-p.hi[:, :, 0], -p.lo[:, :, 0], b)
        ax_lo = jnp.einsum(
            "bij,bj->bi", a, x_lo, precision=_HIGH
        )
        r_hi, r_lo = dd_add_f32(r_hi, r_lo, -ax_lo)
        d = lu_solve_batched(fac, r_hi + r_lo)
        x_hi, x_lo = dd_add_f32(x_hi, x_lo, d)
        resid = jnp.max(jnp.abs(r_hi + r_lo), axis=1)
    scale = jnp.maximum(
        jnp.max(jnp.abs(a), axis=(1, 2))
        * jnp.max(jnp.abs(x_hi), axis=1),
        jnp.max(jnp.abs(b), axis=1),
    )
    ok = fac.ok & (resid <= 1e-10 * jnp.maximum(scale, 1e-30))
    return DDSolveResult(x_hi, x_lo, resid, ok)
