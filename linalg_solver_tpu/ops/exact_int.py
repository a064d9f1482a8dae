"""Fraction-free (Bareiss) elimination on device: BIT-EXACT integer
linear algebra.

The float Gauss–Jordan/LU paths need tolerances; for integer matrices the
Bareiss algorithm keeps every intermediate an exact integer (each 2×2
cross-multiplication step is exactly divisible by the previous pivot), so
zero tests, pivot choices, determinants and ranks are exact — matching the
exact host path bit for bit, with no tolerance knobs.

TPU has no native f64/i64 vector arithmetic, so the working type is
int32: exactness holds while intermediates stay below 2³¹.  Bareiss
intermediates are bounded by Hadamard's inequality — ``bareiss_safe``
checks a given (n, max|entry|) against it.  Config-1-sized problems
(8×8, entries in [-5, 5]) fit comfortably.

Pivoting uses the reference's **first nonzero row** rule
(reference linalg.py:548-567), so pivot sequences bit-match the exact
path by construction.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def bareiss_safe(n: int, amax: int) -> bool:
    """True if an n×n integer matrix with entries |a| ≤ amax can NEVER
    overflow int32 during Bareiss elimination (worst-case Hadamard bound
    on the pre-division cross products).

    This is very conservative — real matrices stay far below Hadamard's
    bound, which is why ``bareiss_batched`` also verifies at runtime and
    reports per-element ``ok`` flags: results are exact iff ``ok``."""
    def minor_bound(k):
        return (amax * amax * k) ** (k / 2)

    # Step k multiplies entries bounded by minor_bound(k+1) with the
    # pivot (also a (k+1)-minor); the difference doubles the magnitude.
    worst = max(
        2 * minor_bound(k + 1) ** 2 for k in range(max(n - 1, 1))
    )
    return worst < 2**31


class BareissResult(NamedTuple):
    det: jax.Array    # [B] int32 — exact determinant
    rank: jax.Array   # [B] int32 — exact rank
    ok: jax.Array     # [B] bool — False if int32 overflow was detected


@functools.partial(jax.jit, static_argnames=())
def bareiss_batched(a: jax.Array) -> BareissResult:
    """Exact determinant and rank of an integer batch ``[B, n, n]``.

    Fraction-free elimination with first-nonzero-row pivoting and column
    skipping on rank deficiency.  Overflow is detected by mirroring the
    computation in float64-free fashion: any intermediate whose float32
    mirror exceeds 2³⁰ marks the element as unreliable (``ok=False``).
    """
    B, n, _ = a.shape
    M = a.astype(jnp.int32)
    rows = jnp.arange(n)

    def body(j, carry):
        M, r, prev, sign, rank, ok = carry
        # col j at-or-below pivot row r (per batch element): first nonzero.
        col = M[:, :, j]
        eligible = (rows[None, :] >= r[:, None]) & (col != 0)
        p = jnp.argmax(eligible, axis=1)
        has_pivot = eligible.any(axis=1)

        # Swap rows r and p via one-hot exchange.
        do_swap = has_pivot & (p != r)
        oh_r = (rows[None, :] == r[:, None]).astype(M.dtype)
        oh_p = (rows[None, :] == p[:, None]).astype(M.dtype)
        row_r = jnp.einsum("bn,bnk->bk", oh_r, M)
        row_p = jnp.einsum("bn,bnk->bk", oh_p, M)
        delta = (row_r - row_p) * do_swap[:, None].astype(M.dtype)
        M = M - oh_r[:, :, None] * delta[:, None, :] \
              + oh_p[:, :, None] * delta[:, None, :]
        sign = jnp.where(do_swap, -sign, sign)

        # Fraction-free elimination of rows below r:
        #   M[i, :] := (M[i, :]·piv − M[i, j]·row_r) / prev   (exact)
        piv = jnp.einsum("bn,bn->b", oh_r.astype(M.dtype), M[:, :, j])
        pivot_row = jnp.einsum("bn,bnk->bk", oh_r, M)
        below = (rows[None, :] > r[:, None]) & has_pivot[:, None]
        factors = M[:, :, j] * below.astype(M.dtype)

        # Overflow sentinel BEFORE multiplying: the cross products
        # |M[i,:]|·|piv| + |M[i,j]|·|row_r| for the updated rows must stay
        # below 2³¹ or int32 wraps silently.  Only rows at/below the pivot
        # participate.
        active = (rows[None, :] >= r[:, None]).astype(jnp.float32)
        max_m = jnp.max(
            jnp.abs(M).astype(jnp.float32) * active[:, :, None],
            axis=(1, 2),
        )
        piv_f = jnp.abs(piv).astype(jnp.float32)
        overflow_risk = 2.0 * max_m * jnp.maximum(piv_f, 1.0) >= 2.0**31
        ok = ok & ~(overflow_risk & has_pivot)

        updated = (
            M * piv[:, None, None] - factors[:, :, None] * pivot_row[:, None, :]
        )
        # Exact division by the previous pivot (Bareiss invariant).
        updated = updated // prev[:, None, None]
        M = jnp.where(below[:, :, None], updated, M)

        rank = rank + has_pivot.astype(jnp.int32)
        prev = jnp.where(has_pivot, piv, prev)
        r = r + has_pivot.astype(jnp.int32)
        return M, r, prev, sign, rank, ok

    init = (
        M,
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), jnp.int32),
        jnp.ones((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), bool),
    )
    M, r, prev, sign, rank, ok = lax.fori_loop(0, n, body, init)

    # After full elimination the last pivot IS det(A) up to the swap sign
    # (Bareiss invariant: the pivot at step k is the leading k×k minor of
    # the pivoted matrix).  Rank-deficient matrices have det 0.
    det = jnp.where(rank == n, sign * prev, 0)
    return BareissResult(det.astype(jnp.int32), rank, ok)


def bareiss_det_batched(a: jax.Array) -> jax.Array:
    return bareiss_batched(a).det


def bareiss_rank_batched(a: jax.Array) -> jax.Array:
    return bareiss_batched(a).rank


# ---------------------------------------------------------------------------
# Multi-word exact integers: CRT over 15-bit primes
# ---------------------------------------------------------------------------
#
# Bareiss is bit-exact only while intermediates fit int32.  Beyond that
# bound the TPU-native answer is residue arithmetic: eliminate modulo K
# 15-bit primes entirely on device (residue products < 2³⁰ stay exact in
# int32), then reconstruct the (arbitrarily large) determinant on the
# host with Python bigints via the Chinese Remainder Theorem.  Device
# work is O(K·n³·B) dense modular elimination — MXU/VPU-friendly — and
# the host does O(K) bigint ops per matrix.

#: primes just below 2^15 — residue×residue < 2^30 < int32 overflow.
_PRIMES = [
    32749, 32719, 32717, 32713, 32707, 32693, 32687, 32653, 32647,
    32633, 32621, 32611, 32609, 32603, 32587, 32579, 32573, 32569,
    32563, 32561, 32537, 32533, 32531, 32507, 32503, 32497, 32491,
    32479, 32467, 32443, 32441, 32429, 32423, 32413, 32411, 32401,
    32381, 32377, 32371, 32369, 32363, 32359, 32353, 32341, 32327,
    32323, 32321, 32309, 32303, 32299, 32297, 32261, 32257, 32251,
    32237, 32233, 32213, 32203, 32191, 32189, 32183, 32173, 32159,
    32143,
]


def _hadamard_bits(n: int, amax: int) -> int:
    """Bits needed to hold |det| of an n×n matrix with entries ≤ amax
    (Hadamard's bound), plus the sign."""
    if amax == 0:
        return 2
    return int(math.ceil(n * (math.log2(max(amax, 1)) + 0.5 * math.log2(n)))) + 2


@jax.jit
def _modular_elim_batched(a: jax.Array, p: jax.Array):
    """Determinant residue and rank of ``a`` over Z_p for every matrix.

    ``a: [B, n, n] int32``, ``p`` scalar int32 prime.  Returns
    ``(det_mod [B], rank [B])`` with ``det_mod`` in ``[0, p)``.
    """
    B, n, _ = a.shape
    M = jnp.mod(a.astype(jnp.int32), p)          # nonneg residues
    rows = jnp.arange(n)

    def modmul(x, y):
        return jnp.mod(x * y, p)

    def modinv(x):
        # Fermat: x^(p-2) mod p, binary exponentiation over 15 bits of
        # the traced exponent.
        e = p - 2

        def step(k, carry):
            acc, base = carry
            bit = (e >> k) & 1
            acc = jnp.where(bit > 0, modmul(acc, base), acc)
            return acc, modmul(base, base)

        acc, _ = lax.fori_loop(
            0, 16, step, (jnp.ones_like(x), x)
        )
        return acc

    def body(j, carry):
        M, r, det, rank = carry
        col = M[:, :, j]
        eligible = (rows[None, :] >= r[:, None]) & (col != 0)
        pidx = jnp.argmax(eligible, axis=1)
        has = eligible.any(axis=1)

        oh_r = (rows[None, :] == r[:, None]).astype(M.dtype)
        oh_p = (rows[None, :] == pidx[:, None]).astype(M.dtype)
        do_swap = has & (pidx != r)
        row_r = jnp.einsum("bn,bnk->bk", oh_r, M)
        row_p = jnp.einsum("bn,bnk->bk", oh_p, M)
        delta = (row_r - row_p) * do_swap[:, None].astype(M.dtype)
        M = M - oh_r[:, :, None] * delta[:, None, :] \
              + oh_p[:, :, None] * delta[:, None, :]
        det = jnp.where(do_swap, jnp.mod(-det, p), det)

        piv = jnp.einsum("bn,bn->b", oh_r, M[:, :, j])
        pivot_row = jnp.einsum("bn,bnk->bk", oh_r, M)
        inv = modinv(jnp.where(has, piv, 1))
        below = (rows[None, :] > r[:, None]) & has[:, None]
        factors = modmul(M[:, :, j], inv[:, None]) * below.astype(M.dtype)
        M = jnp.mod(
            M - modmul(factors[:, :, None], pivot_row[:, None, :]), p
        )
        det = jnp.where(has, modmul(det, piv), det)
        rank = rank + has.astype(jnp.int32)
        r = r + has.astype(jnp.int32)
        return M, r, det, rank

    init = (
        M,
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    _, _, det, rank = lax.fori_loop(0, n, body, init)
    det = jnp.where(rank == n, det, 0)
    return det, rank


def crt_det_batched(a, primes=None):
    """EXACT determinant of an integer batch of ANY magnitude (no int32
    intermediate bound): modular elimination over enough 15-bit primes
    to cover Hadamard's bound, CRT-reconstructed on the host.

    Returns a Python list of exact ints (they can exceed int64).
    """
    import numpy as np

    a = jnp.asarray(a, jnp.int32)
    B, n, _ = a.shape
    amax = int(jnp.max(jnp.abs(a)))
    if primes is None:
        bits = _hadamard_bits(n, amax)
        count = max(bits // 15 + 1, 2)
        if count > len(_PRIMES):
            raise ValueError(
                f"determinant bound needs {count} primes; "
                f"only {len(_PRIMES)} configured"
            )
        primes = _PRIMES[:count]
    residues = [
        np.asarray(_modular_elim_batched(a, jnp.int32(p))[0])
        for p in primes
    ]
    # Host CRT with Python bigints, mapped to the symmetric range.
    Pprod = 1
    for p in primes:
        Pprod *= p
    dets = []
    for b in range(B):
        x = 0
        for p, res in zip(primes, residues):
            q = Pprod // p
            x += int(res[b]) * q * pow(q, -1, p)
        x %= Pprod
        if x > Pprod // 2:
            x -= Pprod
        dets.append(x)
    return dets


def crt_rank_batched(a, primes=None):
    """Rank of an integer batch via modular elimination.  The rank over
    Z_p never exceeds the rational rank and equals it unless p divides
    all maximal nonzero minors — taking the max over several independent
    15-bit primes makes a miss astronomically unlikely (probability
    ~(rank-deficiency density)^K)."""
    import numpy as np

    a = jnp.asarray(a, jnp.int32)
    primes = primes or _PRIMES[:3]
    ranks = [
        np.asarray(_modular_elim_batched(a, jnp.int32(p))[1])
        for p in primes
    ]
    return np.maximum.reduce(ranks)


@jax.jit
def _modular_solve_batched(a: jax.Array, b: jax.Array, p: jax.Array):
    """Solve ``a x ≡ b (mod p)`` by full Gauss–Jordan over Z_p.

    ``a [B, n, n] int32``, ``b [B, n] int32``, ``p`` scalar prime.
    Returns ``(x_mod [B, n], det_mod [B], ok [B])`` — ``ok`` False where
    a is singular mod p (det residue 0; the caller retries the lane's
    verdict across primes: det(A) ≠ 0 guarantees all but finitely many
    primes succeed)."""
    B, n, _ = a.shape
    M = jnp.mod(
        jnp.concatenate(
            [a.astype(jnp.int32), b.astype(jnp.int32)[:, :, None]],
            axis=2,
        ),
        p,
    )
    rows = jnp.arange(n)

    def modmul(x, y):
        return jnp.mod(x * y, p)

    def modinv(x):
        e = p - 2

        def step(k, carry):
            acc, base = carry
            bit = (e >> k) & 1
            acc = jnp.where(bit > 0, modmul(acc, base), acc)
            return acc, modmul(base, base)

        acc, _ = lax.fori_loop(0, 16, step, (jnp.ones_like(x), x))
        return acc

    def body(j, carry):
        M, det, ok = carry
        col = M[:, :, j]
        eligible = (rows[None, :] >= j) & (col != 0)
        pidx = jnp.argmax(eligible, axis=1)
        has = eligible.any(axis=1)

        oh_j = (rows[None, :] == j).astype(M.dtype)
        oh_p = (rows[None, :] == pidx[:, None]).astype(M.dtype)
        do_swap = has & (pidx != j)
        row_j = jnp.einsum("bn,bnk->bk", oh_j, M)
        row_p = jnp.einsum("bn,bnk->bk", oh_p, M)
        delta = (row_j - row_p) * do_swap[:, None].astype(M.dtype)
        M = M - oh_j[:, :, None] * delta[:, None, :] \
              + oh_p[:, :, None] * delta[:, None, :]
        det = jnp.where(do_swap, jnp.mod(-det, p), det)

        piv = jnp.einsum("bn,bn->b", oh_j, M[:, :, j])
        det = jnp.where(has, modmul(det, piv), jnp.zeros_like(det))
        inv = modinv(jnp.where(has, piv, 1))
        # Normalize the pivot row, then eliminate EVERY other row
        # (Gauss–Jordan): after n steps the left block is I.
        pivot_row = modmul(
            jnp.einsum("bn,bnk->bk", oh_j, M), inv[:, None]
        )
        M = M * (1 - oh_j[:, :, None]).astype(M.dtype) \
            + pivot_row[:, None, :] * oh_j[:, :, None].astype(M.dtype)
        others = (1 - oh_j)[:, :, None].astype(M.dtype)
        factors = M[:, :, j] * (1 - oh_j).astype(M.dtype)
        M = jnp.mod(
            M - modmul(factors[:, :, None], pivot_row[:, None, :]) * others,
            p,
        )
        ok = ok & has
        return M, det, ok

    init = (
        M,
        jnp.ones((B,), jnp.int32),
        jnp.ones((B,), bool),
    )
    M, det, ok = lax.fori_loop(0, n, body, init)
    det = jnp.where(ok, det, 0)
    return M[:, :, n], det, ok


def crt_solve_batched(a, b, primes=None):
    """EXACT rational solution of integer systems ``a x = b`` (square,
    nonsingular): Cramer's rule assembled from device modular solves.

    Per 15-bit prime, one batched Gauss–Jordan over Z_p yields
    ``x_p = A⁻¹b mod p`` and ``det_p``; the integer vector
    ``y = adj(A)·b = det(A)·x`` and ``det(A)`` are CRT-reconstructed on
    the host over enough primes to cover Hadamard's bound, and the
    exact answer is ``x_i = y_i / det`` as ``fractions.Fraction``.

    The device does ALL the O(K·n³·B) elimination work in int32 residue
    arithmetic; the host does O(K·n) bigint ops per matrix.  This is
    the device-native counterpart of the reference's exact
    ``find_preimage_of`` on regular systems (reference
    linalg.py:632-680) — same exactness, MXU/VPU throughput.

    Returns ``(xs, dets)``: ``xs[b]`` a list of n Fractions (or None
    where the matrix is singular — det 0), ``dets[b]`` the exact
    integer determinant.
    """
    import numpy as np
    from fractions import Fraction

    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    B, n, _ = a.shape
    amax = int(jnp.max(jnp.abs(a)))
    bmax = int(jnp.max(jnp.abs(b)))
    if primes is not None:
        count = len(primes)
        pool = list(primes)
    else:
        # y = adj(A)b: |y_i| ≤ n·bmax·H(n−1, amax); det: H(n, amax).
        bits_y = _hadamard_bits(max(n - 1, 1), amax) + max(
            math.ceil(math.log2(n * max(bmax, 1) + 1)), 1
        )
        bits = max(bits_y, _hadamard_bits(n, amax))
        count = max(bits // 15 + 1, 2)
        # A prime p with det ≡ 0 (mod p) yields no usable residue for
        # that lane and must be SKIPPED there (its det_p = 0 would
        # corrupt the CRT into a silently wrong "exact" answer).  A
        # NONZERO det below the Hadamard bound has < count distinct
        # 15-bit prime divisors, so a pool of 2·count primes guarantees
        # ≥ count usable residues per nonsingular lane; a lane failing
        # on ALL 2·count primes is genuinely singular (its det would
        # otherwise exceed the bound).
        pool = _PRIMES
        if 2 * count > len(pool):
            raise ValueError(
                f"solution bound needs a pool of {2 * count} primes; "
                f"only {len(pool)} configured"
            )

    # Run primes until every lane has `count` usable residues (or the
    # pool is exhausted — only singular lanes remain short then).
    used = []       # (p, x_mod [B, n], det_mod [B], ok [B])
    successes = np.zeros((B,), int)
    for p in pool:
        x_p, det_p, ok_p = _modular_solve_batched(a, b, jnp.int32(p))
        # y_p = det·x mod p — the Cramer numerator's residue.
        used.append((
            p,
            np.asarray(jnp.mod(x_p * det_p[:, None], p)),
            np.asarray(det_p),
            np.asarray(ok_p),
        ))
        successes += used[-1][3].astype(int)
        if (successes >= count).all():
            break

    def crt(pairs):
        """CRT of [(p, residue)] to the symmetric range."""
        Pprod = 1
        for p, _ in pairs:
            Pprod *= p
        x = 0
        for p, r in zip([p for p, _ in pairs],
                        [r for _, r in pairs]):
            q = Pprod // p
            x += int(r) * q * pow(q, -1, p)
        x %= Pprod
        return x - Pprod if x > Pprod // 2 else x

    xs, dets = [], []
    for lane in range(B):
        lane_used = [
            (p, xm[lane], dm[lane]) for p, xm, dm, ok in used if ok[lane]
        ][:count]
        if len(lane_used) < count:
            if lane_used:
                raise ValueError(
                    f"lane {lane}: only {len(lane_used)} of {count} "
                    f"usable primes — prime pool exhausted"
                )
            # Singular on every tried prime ⇒ det = 0 (a nonzero det
            # under the bound cannot be divisible by them all).
            xs.append(None)
            dets.append(0)
            continue
        det = crt([(p, dm) for p, _, dm in lane_used])
        dets.append(det)
        lane_x = []
        for i in range(n):
            y_i = crt([(p, xm[i]) for p, xm, _ in lane_used])
            lane_x.append(Fraction(y_i, det))
        xs.append(lane_x)
    return xs, dets
