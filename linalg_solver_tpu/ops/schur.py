"""Batched real Schur form: Hessenberg reduction + Francis double-shift QR.

TPU-first redesign of the eigenvalue path (the reference computes
eigenvalues symbolically via the characteristic polynomial,
reference linalg.py:424-480; the device equivalent needs a dense
eigensolver).  The previous device solver (``eigen.eigvals_qr``) ran
unreduced explicit QR — O(n³) per iteration with one global Wilkinson
shift and no deflation, which stalls on multiple/clustered eigenvalues.
This module implements the real thing:

- ``hessenberg``: n−2 Householder similarity steps (masked full-width
  updates, fori_loop — O(n³) once).
- ``real_schur``: implicit Francis double-shift QR with bulge chasing on
  the Hessenberg form.  One sweep is O(n²) (3-row/3-column updates along
  the chase), shifts come from the trailing 2×2 of each matrix's own
  active window, converged subdiagonal entries are explicitly deflated,
  and an exceptional ad-hoc shift breaks stagnation (LAPACK dlahqr
  style).  Batched: every matrix in the batch carries its own window
  ``[lo, hi]``, shift pair and deflation state; the chase position ``k``
  is shared (lane-masked), so the whole batch advances in lockstep under
  ``vmap``-free full-batch ops.
- ``eigvals_schur``: eigenvalues from the quasi-triangular result (1×1
  blocks on the diagonal, complex-conjugate pairs from 2×2 blocks).

Iteration stops through a ``lax.while_loop`` as soon as EVERY matrix in
the batch has deflated completely, so well-conditioned batches pay only
the ~2 sweeps/eigenvalue that Francis QR actually needs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


@jax.jit
@f32_matmuls
def hessenberg(a: jax.Array) -> jax.Array:
    """Reduce a batched ``[B, n, n]`` real matrix to upper Hessenberg form
    by Householder similarity transforms (same eigenvalues)."""
    B, n, _ = a.shape
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    idx = jnp.arange(n)

    def body(k, H):
        x = H[:, :, k]                              # [B, n]
        mask = (idx[None, :] > k).astype(H.dtype)
        xm = x * mask
        xk = jnp.take_along_axis(
            xm, jnp.full((B, 1), 0, jnp.int32) + (k + 1), axis=1
        )[:, 0]
        norm = jnp.sqrt(jnp.sum(xm * xm, axis=1))
        alpha = -jnp.sign(jnp.where(xk == 0, 1.0, xk)) * norm
        e = (idx[None, :] == (k + 1)).astype(H.dtype)
        v = xm - alpha[:, None] * e
        vnorm2 = jnp.sum(v * v, axis=1)
        beta = jnp.where(vnorm2 > 0, 2.0 / vnorm2, 0.0)
        vH = jnp.einsum("bn,bnm->bm", v, H, precision=_HIGH)
        H = H - beta[:, None, None] * v[:, :, None] * vH[:, None, :]
        Hv = jnp.einsum("bnm,bm->bn", H, v, precision=_HIGH)
        H = H - beta[:, None, None] * Hv[:, :, None] * v[:, None, :]
        return H

    return lax.fori_loop(0, max(n - 2, 0), body, a)


class SchurResult(NamedTuple):
    T: jax.Array          # [B, n, n] quasi-upper-triangular
    converged: jax.Array  # [B] bool — window fully deflated
    sweeps: jax.Array     # [] i32 — sweeps actually executed


def _take1(M: jax.Array, i: jax.Array, j: jax.Array) -> jax.Array:
    """``M[b, i[b], j[b]]`` for batched indices (clamped)."""
    n = M.shape[-1]
    i = jnp.clip(i, 0, n - 1)
    j = jnp.clip(j, 0, n - 1)
    rows = jnp.take_along_axis(
        M, i[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]
    return jnp.take_along_axis(
        rows, j[:, None].astype(jnp.int32), axis=1
    )[:, 0]


def _deflate(H, hi, stagnant, anorm):
    """Zero negligible subdiagonals; pull ``hi`` up past converged
    1×1 and 2×2 trailing blocks (a few fixed-point rounds handle
    consecutive deflations).  ``H`` is the padded ``[B, n+1, n+1]``.

    The threshold is ``ulp·(|h_ii| + |h_i+1,i+1|) + ulp·‖A‖`` — the
    norm term matters: one sweep's roundoff injects ~ulp·‖A‖ into every
    subdiagonal entry, so the classical local-diagonal criterion alone
    is unreachable whenever the local diagonal is small relative to the
    matrix (the iteration then stalls forever, bouncing on the roundoff
    floor).  Zeroing at ulp·‖A‖ is backward-stable — the Hessenberg
    reduction already carries that same backward error."""
    B, npad, _ = H.shape
    dtype = H.dtype
    eps = jnp.finfo(dtype).eps
    tiny = jnp.finfo(dtype).tiny
    idx = jnp.arange(npad)
    rc = idx[:, None] == idx[None, :] + 1      # subdiagonal positions

    d = jnp.diagonal(H, axis1=1, axis2=2)
    sub = jnp.diagonal(H, offset=-1, axis1=1, axis2=2)
    h11, h22 = d[:, :-1], d[:, 1:]
    sup = jnp.diagonal(H, offset=1, axis1=1, axis2=2)
    # Strict local criterion (LAPACK-style): converged pairs that never
    # pass it exit instead as isolated 2×2 blocks (the window shrinks
    # from the top) and their eigenvalues are taken from the block
    # quadratic, which preserves the h21·h12 coupling — force-zeroing
    # h21 at a looser ulp·‖A‖ threshold costs O(ulp·‖A‖²/gap) eigenvalue
    # error (measured 1e-3 at n=256).  When the local diagonal is
    # negligible (e.g. skew-symmetric input — diagonal ~0) the criterion
    # is augmented with the neighboring subdiagonal magnitudes, dlahqr's
    # tst==0 fallback.
    tst = jnp.abs(h11) + jnp.abs(h22)
    nbr = jnp.zeros_like(tst)
    nbr = nbr.at[:, 1:].add(jnp.abs(sub[:, :-1]))
    nbr = nbr.at[:, :-1].add(jnp.abs(sub[:, 1:]))
    tst = jnp.where(tst <= eps * anorm[:, None], tst + nbr, tst)
    tol_local = eps * tst + tiny
    # Second criterion (Ahues–Tisseur, as in dlahqr): deflate when the
    # off-diagonal PRODUCT is negligible against the local diagonal
    # structure even though |h21| alone is not.  Without it, clustered
    # spectra stall: mid-window subdiagonals bottom out a small factor
    # above ulp·|diag| (each sweep's bulge re-pollutes them), the bulge
    # is then chased through a near-zero entry and washes out the shift
    # (vanishing-bulge phenomenon), and the window never splits —
    # measured: multiplicity-85 symmetric spectra at n=256 never
    # converge, eigenvalue errors O(1).
    ab = jnp.maximum(jnp.abs(sub), jnp.abs(sup))
    ba = jnp.minimum(jnp.abs(sub), jnp.abs(sup))
    aa = jnp.maximum(jnp.abs(h22), jnp.abs(h11 - h22))
    bb = jnp.minimum(jnp.abs(h22), jnp.abs(h11 - h22))
    s_at = jnp.maximum(aa + ab, tiny)
    small_at = ba * (ab / s_at) <= jnp.maximum(
        tiny / eps, eps * (bb * (aa / s_at))
    )
    # Stall breaker (after 20 deflation-free sweeps), perturbation-
    # ordered: zeroing sub_i moves the adjacent eigenvalues by
    # ~|h21·h12| / max(gap, √(h21·h12)); break the stall with the LEAST
    # damaging entries first, loosening the bound exponentially with
    # continued stagnation so any stall eventually breaks.
    prod = jnp.abs(sub) * jnp.abs(sup)
    gap = jnp.abs(h11 - h22)
    pert = prod / jnp.maximum(gap, jnp.sqrt(prod) + tiny)
    escal = jnp.exp2(
        jnp.clip((stagnant.astype(d.dtype) - 20.0) / 5.0, 0.0, 30.0)
    )
    stalled = stagnant >= 20
    small = (
        (jnp.abs(sub) <= tol_local)
        | small_at
        | (
            stalled[:, None]
            # The magnitude gate must escalate along with the
            # perturbation gate: a window bouncing above eps·‖A‖ would
            # otherwise stall forever.
            & (jnp.abs(sub) <= (eps * anorm * escal)[:, None])
            & (pert <= (eps * anorm * escal)[:, None])
        )
    )
    sub0 = jnp.where(small, 0.0, sub)
    # Write sub0 back onto the subdiagonal (position (j+1, j) takes
    # sub0[:, j] — a column-broadcast under the subdiagonal mask).
    sub0_pad = jnp.concatenate(
        [sub0, jnp.zeros((B, 1), dtype)], axis=1
    )
    H = jnp.where(rc[None, :, :], sub0_pad[:, None, :], H)

    def pull(_, carry):
        hi, moved = carry
        s_hi = _take1(H, hi, hi - 1)          # H[hi, hi-1]
        s_hi1 = _take1(H, hi - 1, hi - 2)     # H[hi-1, hi-2]
        d1 = (hi > 0) & (s_hi == 0)
        d2 = (~d1) & (hi > 1) & (s_hi1 == 0)
        d2_edge = (~d1) & (hi == 1)                 # 2×2 block at top
        hi_new = jnp.where(
            d1, hi - 1,
            jnp.where(d2 | d2_edge, hi - 2, hi),
        )
        return jnp.maximum(hi_new, -1), moved | (hi_new != hi)

    (hi, moved), _ = lax.scan(
        lambda c, _: (pull(0, c), None),
        (hi, jnp.zeros((B,), bool)), None, length=4,
    )
    stagnant = jnp.where(moved, 0, stagnant + 1)
    return H, hi, stagnant


def _block_bounds(H, hi):
    """Per-position unreduced-block bounds from the subdiagonal zero
    pattern: ``start[k]``/``end[k]`` delimit the block containing row k
    (capped at the global window ``hi``; rows beyond it are converged).

    This is what makes the sweep MULTIBULGE: the matrix splits into
    independent unreduced diagonal blocks as mid-window subdiagonals
    deflate, and a per-position map lets one scan chase a bulge in EVERY
    block simultaneously instead of only the bottom window (on clustered
    spectra the blocks are many and small — sequential processing pays
    a full n-step sweep per block-sweep)."""
    B, npad, _ = H.shape
    idx = jnp.arange(npad)
    sub = jnp.diagonal(H, offset=-1, axis1=1, axis2=2)   # [B, npad-1]
    z = sub == 0                   # boundary between rows j and j+1
    # start[k] = 1 + last boundary j ≤ k−1 (0 if none): shifted max-scan.
    run = jnp.where(z, idx[None, :-1] + 1, 0)
    smax = lax.associative_scan(jnp.maximum, run, axis=1)
    start = jnp.concatenate(
        [jnp.zeros((B, 1), smax.dtype), smax], axis=1
    )
    # end[k] = first boundary j ≥ k (npad if none): reverse min-scan.
    cand = jnp.where(z, idx[None, :-1], npad)
    emin = lax.associative_scan(
        jnp.minimum, cand, axis=1, reverse=True
    )
    end = jnp.concatenate(
        [emin, jnp.full((B, 1), npad, emin.dtype)], axis=1
    )
    end = jnp.minimum(end, hi[:, None])
    start = jnp.minimum(start, jnp.maximum(end, 0))
    return start, end


def _shifts_per_block(H, end, hi, stagnant):
    """Double-shift (sum s, product p) per POSITION, from the trailing
    2×2 of each position's own block; dlahqr's exceptional shift after
    10 stagnant sweeps (bottom block only — stagnation is tracked on the
    global window)."""
    B, npad, _ = H.shape
    diag = jnp.diagonal(H, axis1=1, axis2=2)             # [B, npad]
    sub = jnp.concatenate(
        [jnp.diagonal(H, offset=-1, axis1=1, axis2=2),
         jnp.zeros((B, 1), H.dtype)], axis=1,
    )                                                    # sub[j] = H[j+1, j]
    sup = jnp.concatenate(
        [jnp.diagonal(H, offset=1, axis1=1, axis2=2),
         jnp.zeros((B, 1), H.dtype)], axis=1,
    )                                                    # sup[j] = H[j, j+1]

    e = jnp.clip(end, 1, npad - 1)

    def take(v, i):
        return jnp.take_along_axis(v, i, axis=1)

    h00 = take(diag, e - 1)
    h01 = take(sup, e - 1)
    h10 = take(sub, e - 1)
    h11 = take(diag, e)
    s = h00 + h11
    p = h00 * h11 - h01 * h10
    # Exceptional shift, eigenvalues of [[0.75·t + h11, −0.4375·t],
    # [t, 0.75·t + h11]] with t = |H[e,e−1]| + |H[e−1,e−2]|.
    exc = (
        ((stagnant > 0) & (stagnant % 10 == 0))[:, None]
        & (end == hi[:, None])
    )
    t_exc = jnp.abs(h10) + jnp.abs(take(sub, jnp.maximum(e - 2, 0)))
    d_exc = 0.75 * t_exc + h11
    s = jnp.where(exc, 2.0 * d_exc, s)
    p = jnp.where(exc, d_exc * d_exc + 0.4375 * t_exc * t_exc, p)
    return s, p


def _one_sweep(H, hi, stagnant, anorm):
    """Deflate, pick per-block shifts, run one multibulge Francis sweep
    (one bulge per unreduced diagonal block, all chased in one scan)."""
    B, npad, _ = H.shape
    n = npad - 1

    H, hi, stagnant = _deflate(H, hi, stagnant, anorm)
    start, end = _block_bounds(H, hi)
    s_arr, p_arr = _shifts_per_block(H, end, hi, stagnant)
    # NB: lax.scan, NOT lax.fori_loop — on the TPU backend the
    # fori_loop lowering of this body miscompiles (the loop produces
    # O(1)-different results from the identical body run stepwise or
    # under scan; observed on v5e, jax 0.8 era).  Scan is bit-correct.
    (H, *_), _ = lax.scan(
        lambda c, k: (_chase_step(k, c), None),
        (H, start, end, s_arr, p_arr),
        jnp.arange(max(n - 1, 1)),
    )
    return H, hi, stagnant


def _chase_step(k, carry):
        H, start, end, s_arr, p_arr = carry
        B, npad, _ = H.shape

        def col_at(v):  # v[:, k] with traced k
            return lax.dynamic_slice_in_dim(v, k, 1, axis=1)[:, 0]

        lo = col_at(start)
        hi = col_at(end)
        s = col_at(s_arr)
        p = col_at(p_arr)
        active = (k >= lo) & (k <= hi - 1) & (hi >= 2)   # [B]
        create = active & (k == lo)

        # One slice serves everything: rows k..k+2, columns k−1..k+1.
        km1 = jnp.maximum(k - 1, 0)
        blk = lax.dynamic_slice(H, (0, k, km1), (B, 3, 3))
        # Column offsets within blk: bulge column k−1 is blk[:, :, 0]
        # (at k=0 the slice starts at column 0, but k=0 is always a
        # *create* step, which reads columns k, k+1 = blk[:, :, c0+*]).
        c0 = jnp.where(k > 0, 1, 0)
        h_kk = blk[:, 0, :]
        h_k1 = blk[:, 1, :]
        h_k2 = blk[:, 2, :]

        def col(v3, off):  # v3[:, c0+off] with dynamic c0
            return jnp.where(c0 > 0, v3[:, 1 + off], v3[:, off])

        # first column of (H−aI)(H−bI) restricted to rows k..k+2
        a00 = col(h_kk, 0)
        a10 = col(h_k1, 0)
        a01 = col(h_kk, 1)
        a11 = col(h_k1, 1)
        a21 = col(h_k2, 1)
        x_new = a00 * a00 + a01 * a10 - s * a00 + p
        y_new = a10 * (a00 + a11 - s)
        z_new = a10 * a21
        # chasing: the bulge sits in column k−1 = blk[:, :, 0]
        x = jnp.where(create, x_new, blk[:, 0, 0])
        y = jnp.where(create, y_new, blk[:, 1, 0])
        z = jnp.where(create, z_new, blk[:, 2, 0])
        z = jnp.where(k + 2 <= hi, z, 0.0)   # 2-row step at the window foot

        # 3-vector Householder annihilating (y, z).
        nrm = jnp.sqrt(x * x + y * y + z * z)
        alpha = -jnp.sign(jnp.where(x == 0, 1.0, x)) * nrm
        v0 = x - alpha
        vnorm2 = v0 * v0 + y * y + z * z
        beta = jnp.where(
            active & (vnorm2 > 0), 2.0 / vnorm2, 0.0
        )
        v = jnp.stack([v0, y, z], axis=1)               # [B, 3]

        # Rows k..k+2 (full width): H ← (I − βvvᵀ) H; the transform
        # annihilates the bulge tail in column k−1 (rows k+1, k+2) up to
        # roundoff — force exact zeros there in the same write (LAPACK
        # dlaqr* does the same) so the matrix stays Hessenberg.
        rows = lax.dynamic_slice(H, (0, k, 0), (B, 3, npad))
        vr = jnp.einsum("bi,bin->bn", v, rows, precision=_HIGH)
        rows = rows - beta[:, None, None] * v[:, :, None] * vr[:, None, :]
        chasing = active & (k > lo)
        colpos = lax.broadcasted_iota(jnp.int32, (1, 1, npad), 2)
        tailmask = (
            chasing[:, None, None]
            & (colpos == km1)
            & (lax.broadcasted_iota(jnp.int32, (1, 3, 1), 1) > 0)
        )
        rows = jnp.where(tailmask, 0.0, rows)
        H = lax.dynamic_update_slice(H, rows, (0, k, 0))
        # Columns k..k+2 (full height): H ← H (I − βvvᵀ).
        cols = lax.dynamic_slice(H, (0, 0, k), (B, npad, 3))
        cv = jnp.einsum("bni,bi->bn", cols, v, precision=_HIGH)
        cols = cols - beta[:, None, None] * cv[:, :, None] * v[:, None, :]
        H = lax.dynamic_update_slice(H, cols, (0, 0, k))
        # XLA TPU reorders the unaligned in-place row/column updates
        # across loop iterations without this fence (observed: the
        # second fori iteration reads pre-update values — results
        # diverge O(1) from the interpreted semantics).
        H = lax.optimization_barrier(H)
        return H, start, end, s_arr, p_arr


@jax.jit
def balance_batched(a: jax.Array, iters: int = 6) -> jax.Array:
    """Osborne/gebal-style balancing: diagonal similarity D⁻¹AD with
    power-of-two factors equalizing row/column 1-norms.

    Same eigenvalues (exact similarity — power-of-two scaling is exact
    in floating point), much smaller ‖A‖ when the input hides a modest
    spectrum inside a badly scaled basis.  Every eps·‖A‖ term in the QR
    iteration (roundoff per sweep, deflation thresholds) shrinks with
    it — the step that lets sgeev reach ~eps·ρ(A) eigenvalue accuracy
    instead of eps·‖A‖.
    """
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=bool)

    def pass_(_, A):
        off = jnp.where(eye, 0.0, jnp.abs(A))
        r = jnp.sum(off, axis=2)                  # row sums  [B, n]
        c = jnp.sum(off, axis=1)                  # col sums  [B, n]
        safe = (r > 0) & (c > 0)
        # f = 2^round(log2(sqrt(c/r))): exact diagonal similarity.
        e = jnp.round(0.5 * (jnp.log2(jnp.where(safe, c, 1.0))
                             - jnp.log2(jnp.where(safe, r, 1.0))))
        f = jnp.exp2(jnp.clip(e, -40, 40))
        # gebal gate: scale only where it actually reduces r+c by ≥5%
        # (unconditional rounding oscillates on already-balanced input).
        improves = (r * f + c / f) < 0.95 * (r + c)
        f = jnp.where(safe & improves, f, 1.0)
        return A * (f[:, :, None] / f[:, None, :])

    return lax.fori_loop(0, iters, pass_, a)


@functools.partial(jax.jit, static_argnames=("balance",))
@f32_matmuls
def _schur_init(a: jax.Array, balance: bool = True):
    """Balance + Hessenberg + one-row/column zero pad (so the 3-wide
    dynamic slices of the bulge chase never clamp at the bottom edge)."""
    B = a.shape[0]
    if balance:
        a = balance_batched(a)
    H = jnp.pad(hessenberg(a), ((0, 0), (0, 1), (0, 1)))
    hi0 = jnp.full((B,), a.shape[1] - 1, jnp.int32)
    anorm = jnp.max(jnp.sum(jnp.abs(H), axis=2), axis=1)  # ‖·‖_inf
    return H, hi0, jnp.zeros((B,), jnp.int32), anorm


@functools.partial(jax.jit, static_argnames=("chunk",))
@f32_matmuls
def _schur_sweeps(state, chunk: int):
    """Up to ``chunk`` Francis sweeps (stops early when every lane has
    deflated).  Kept bounded because the tunnel-attached TPU runtime
    kills single programs that execute for too long."""
    def cond(st):
        H, hi, stagnant, anorm, it = st
        return (it < chunk) & jnp.any(hi >= 1)

    def body(st):
        H, hi, stagnant, anorm, it = st
        H, hi, stagnant = _one_sweep(H, hi, stagnant, anorm)
        return H, hi, stagnant, anorm, it + 1

    H, hi, stagnant, anorm = state
    H, hi, stagnant, anorm, it = lax.while_loop(
        cond, body, (H, hi, stagnant, anorm, jnp.zeros((), jnp.int32))
    )
    return (H, hi, stagnant, anorm), it


@jax.jit
def _schur_finalize(state):
    H, hi, stagnant, anorm = state
    H, hi, _ = _deflate(H, hi, stagnant, anorm)
    n = H.shape[1] - 1
    T = H[:, :n, :n]
    # Everything below the first subdiagonal is mathematically zero;
    # wipe the bulge-chase roundoff residue (~ulp·‖A‖).
    T = jnp.where(jnp.tril(jnp.ones((n, n), bool), -2)[None], 0.0, T)
    return SchurResult(T, hi < 1, jnp.zeros((), jnp.int32))


def real_schur(
    a: jax.Array, max_sweeps: int = 0, chunk: int = 64,
    balance: bool = True,
) -> SchurResult:
    """Quasi-upper-triangular (real Schur) form of every matrix in
    ``[B, n, n]`` via Hessenberg + Francis double-shift QR.

    ``max_sweeps=0`` picks ``8·n`` (Francis QR needs ~2 per eigenvalue;
    the margin covers clustered spectra and exceptional-shift restarts).
    Sweeps run in device programs of at most ``chunk`` sweeps with a
    host-side convergence check in between — a single huge program
    trips the remote runtime's execution watchdog at large ``n``.
    """
    B, n, _ = a.shape
    if n <= 2:
        H = hessenberg(a)
        return SchurResult(
            H, jnp.ones((B,), bool), jnp.zeros((), jnp.int32)
        )
    if max_sweeps == 0:
        max_sweeps = 8 * n
    state = _schur_init(a, balance=balance)
    done = 0
    while done < max_sweeps:
        state, it = _schur_sweeps(state, min(chunk, max_sweeps - done))
        done += int(it)
        if int(it) < chunk or not bool((state[1] >= 1).any()):
            break
    res = _schur_finalize(state)
    return SchurResult(
        res.T, res.converged, jnp.asarray(done, jnp.int32)
    )


class SchurEigvals(NamedTuple):
    real: jax.Array  # [B, n]
    imag: jax.Array  # [B, n]
    converged: jax.Array  # [B]


def eigvals_schur(
    a: jax.Array, max_sweeps: int = 0, chunk: int = 64,
    balance: bool = True,
) -> SchurEigvals:
    """Eigenvalues of a batched real matrix via the real Schur form:
    diagonal entries for 1×1 blocks, exact conjugate pairs from 2×2
    blocks (nonzero subdiagonal entries after deflation)."""
    res = real_schur(
        a, max_sweeps=max_sweeps, chunk=chunk, balance=balance
    )
    re, im = _eigvals_from_T(res.T)
    return SchurEigvals(re, im, res.converged)


@jax.jit
def _eigvals_from_T(T: jax.Array):
    B, n, _ = T.shape
    diag = jnp.diagonal(T, axis1=1, axis2=2)
    sub = jnp.concatenate(
        [jnp.diagonal(T, offset=-1, axis1=1, axis2=2),
         jnp.zeros((B, 1), T.dtype)], axis=1
    )
    up = jnp.concatenate(
        [jnp.diagonal(T, offset=1, axis1=1, axis2=2),
         jnp.zeros((B, 1), T.dtype)], axis=1
    )
    live = sub != 0                       # [B, n]: block (i, i+1)
    nxt = jnp.roll(diag, -1, axis=1)
    tr2 = diag + nxt
    # ((h11−h22)/2)² + h12·h21 — algebraically (tr/2)²−det but without
    # the catastrophic cancellation for close roots.
    disc2 = ((diag - nxt) / 2) ** 2 + up * sub
    re_pair = tr2 / 2
    im_pair = jnp.sqrt(jnp.maximum(-disc2, 0))
    sq = jnp.sqrt(jnp.maximum(disc2, 0))

    is_second = jnp.concatenate(
        [jnp.zeros((B, 1), bool), live[:, :-1]], axis=1
    )
    is_first = live & ~is_second

    real = jnp.where(is_first, re_pair, diag)
    real = jnp.where(is_second, jnp.roll(re_pair, 1, axis=1), real)
    real = jnp.where(is_first & (disc2 >= 0), re_pair + sq, real)
    real = jnp.where(
        is_second & (jnp.roll(disc2, 1, axis=1) >= 0),
        jnp.roll(re_pair - sq, 1, axis=1),
        real,
    )
    imag = jnp.where(is_first & (disc2 < 0), im_pair, 0.0)
    imag = jnp.where(
        is_second & (jnp.roll(disc2, 1, axis=1) < 0),
        -jnp.roll(im_pair, 1, axis=1),
        imag,
    )
    return real, imag
