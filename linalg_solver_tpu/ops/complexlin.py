"""Batched COMPLEX dense linear algebra on the real kernels.

TPUs have no complex MXU datatype; XLA lowers complex ops to real
pairs op-by-op, which bypasses this framework's tuned solvers.
Instead these wrappers embed ``M = X + iY`` as the real ``2n × 2n``
matrix ``[[X, −Y], [Y, X]]`` (an algebra isomorphism: products, sums,
inverses and solves commute with the embedding) and run the
framework's REAL batched paths — the blocked/Pallas LU solve, the
Gauss–Jordan inverse, the LU determinant — at 4× the real flops (the
embedding's cost; XLA's own complex lowering pays the same 4
real GEMMs).

Input/output convention: complex data as (re, im) array pairs — the
same re/im-arithmetic convention as the eigensolver's strevc kernel
(``ops.schur``), avoiding complex64 layouts on the device entirely.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _embed(re: jax.Array, im: jax.Array) -> jax.Array:
    """[B, n, n] pair → [B, 2n, 2n] real embedding [[X, −Y], [Y, X]]."""
    top = jnp.concatenate([re, -im], axis=2)
    bot = jnp.concatenate([im, re], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def solve_complex_batched(
    a_re: jax.Array, a_im: jax.Array,
    b_re: jax.Array, b_im: jax.Array,
    backend: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Solve complex square systems ``(A_re + i·A_im) x = b_re + i·b_im``
    (``b`` vectors ``[B, n]``); returns ``(x_re, x_im)``."""
    from . import dispatch

    n = a_re.shape[-1]
    M = _embed(a_re, a_im)
    rhs = jnp.concatenate([b_re, b_im], axis=1)
    x = dispatch.solve_batched(M, rhs, backend=backend)
    return x[:, :n], x[:, n:]


def inverse_complex_batched(
    a_re: jax.Array, a_im: jax.Array, backend: str = "auto"
) -> Tuple[jax.Array, jax.Array]:
    """Inverse of complex batches; returns ``(inv_re, inv_im)``."""
    from . import dispatch

    n = a_re.shape[-1]
    inv = dispatch.inverse_batched(_embed(a_re, a_im), backend=backend)
    # inv is the embedding of A⁻¹: read off its blocks.
    return inv[:, :n, :n], inv[:, n:, :n]


def _gauss_pivots_complex(a_re: jax.Array, a_im: jax.Array):
    """Pivoted complex Gauss elimination in re/im arithmetic; returns
    per-step ``(pivots_re, pivots_im, signs, ok)`` with
    ``det = Π signs[k]·pivot[k]``.  An O(n³) loop kept simple because
    complex determinants are a cold path; shared by ``det`` (plain
    product) and ``slogdet`` (log-magnitude + phase accumulation)."""
    B, n, _ = a_re.shape
    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    re = a_re.astype(f32)
    im = a_im.astype(f32)
    rows = jnp.arange(n)

    def body(k, st):
        re, im, pr, pi, sg, ok = st
        # partial pivot by |entry|² in column k, rows ≥ k
        mag = re[:, :, k] ** 2 + im[:, :, k] ** 2
        masked = jnp.where(rows[None, :] >= k, mag, -1.0)
        p = jnp.argmax(masked, axis=1)
        has = jnp.take_along_axis(masked, p[:, None], 1)[:, 0] > 0
        ok = ok & has
        do_swap = has & (p != k)
        oh_k = (rows[None, :] == k).astype(f32)
        oh_p = (rows[None, :] == p[:, None]).astype(f32)

        def swap(M):
            row_k = jnp.einsum("bn,bnk->bk", oh_k, M)
            row_p = jnp.einsum("bn,bnk->bk", oh_p, M)
            delta = (row_k - row_p) * do_swap[:, None].astype(f32)
            return (
                M
                - oh_k[:, :, None] * delta[:, None, :]
                + oh_p[:, :, None] * delta[:, None, :]
            )

        re, im = swap(re), swap(im)
        sgn = jnp.where(do_swap, -1.0, 1.0)
        pre = re[:, k, k]
        pim = im[:, k, k]
        oh = (rows[None, :] == k).astype(f32)
        pr = pr + oh * pre[:, None]
        pi = pi + oh * pim[:, None]
        sg = sg * sgn
        den = jnp.where(has, pre * pre + pim * pim, 1.0)[:, None]
        below = (rows[None, :] > k) & has[:, None]
        # factor = a[i,k] / pivot (complex divide)
        fre = (
            re[:, :, k] * pre[:, None] + im[:, :, k] * pim[:, None]
        ) / den
        fim = (
            im[:, :, k] * pre[:, None] - re[:, :, k] * pim[:, None]
        ) / den
        fre = jnp.where(below, fre, 0.0)
        fim = jnp.where(below, fim, 0.0)
        prow_re = re[:, k, :]
        prow_im = im[:, k, :]
        re = re - (
            fre[:, :, None] * prow_re[:, None, :]
            - fim[:, :, None] * prow_im[:, None, :]
        )
        im = im - (
            fre[:, :, None] * prow_im[:, None, :]
            + fim[:, :, None] * prow_re[:, None, :]
        )
        return re, im, pr, pi, sg, ok

    init = (
        re, im,
        jnp.zeros((B, n), f32), jnp.zeros((B, n), f32),
        jnp.ones((B,), f32),
        jnp.ones((B,), bool),
    )
    re, im, pr, pi, sg, ok = jax.lax.fori_loop(0, n, body, init)
    return pr, pi, sg, ok


def det_complex_batched(
    a_re: jax.Array, a_im: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Complex determinant; returns ``(det_re, det_im)``.

    ``det(embed(M)) = |det(M)|²`` loses the phase, so the determinant
    cannot reuse the real embedding; it runs the direct complex Gauss
    elimination (`_gauss_pivots_complex`)."""
    pr, pi, sg, ok = _gauss_pivots_complex(a_re, a_im)
    B, n = pr.shape

    def body(k, st):
        dre, dim_ = st
        pre, pim = pr[:, k], pi[:, k]
        return dre * pre - dim_ * pim, dre * pim + dim_ * pre

    dre, dim_ = jax.lax.fori_loop(
        0, n, body, (jnp.ones((B,), pr.dtype), jnp.zeros((B,), pr.dtype))
    )
    dre, dim_ = sg * dre, sg * dim_
    return jnp.where(ok, dre, 0.0), jnp.where(ok, dim_, 0.0)


def slogdet_complex_batched(
    a_re: jax.Array, a_im: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """``(sign_re, sign_im, log|det|)`` with ``sign`` the unit-modulus
    phase (numpy ``slogdet`` semantics for complex input) — stays
    finite where the plain product over/underflows.  Singular lanes:
    sign 0, logabs −inf."""
    pr, pi, sg, ok = _gauss_pivots_complex(a_re, a_im)
    mag2 = pr * pr + pi * pi
    safe = jnp.maximum(mag2, 1e-37)
    logabs = 0.5 * jnp.sum(jnp.log(safe), axis=1)
    B, n = pr.shape

    def body(k, st):
        sre, sim = st
        inv = jax.lax.rsqrt(safe[:, k])
        ure, uim = pr[:, k] * inv, pi[:, k] * inv
        return sre * ure - sim * uim, sre * uim + sim * ure

    sre, sim = jax.lax.fori_loop(
        0, n, body, (sg, jnp.zeros((B,), pr.dtype))
    )
    neg = jnp.full_like(logabs, -jnp.inf)
    return (
        jnp.where(ok, sre, 0.0),
        jnp.where(ok, sim, 0.0),
        jnp.where(ok, logabs, neg),
    )


class ComplexEighResult(NamedTuple):
    """Hermitian complex eigendecomposition.  ``ok=False`` marks lanes
    where the doubled-pair extraction lost complex independence
    (possible only for degenerate eigenvalues with adversarial basis
    mixing) — verified via V^H V and the eigen residual, never
    silently wrong."""

    w: jax.Array      # [B, n] ascending real eigenvalues
    v_re: jax.Array   # [B, n, n]
    v_im: jax.Array   # [B, n, n]
    ok: jax.Array     # [B]


def eigh_complex_batched(
    a_re: jax.Array, a_im: jax.Array
) -> ComplexEighResult:
    """Eigendecomposition of batched HERMITIAN complex matrices
    ``A = X + iY`` (X symmetric, Y antisymmetric; inputs are
    projected).

    The real embedding ``[[X, −Y], [Y, X]]`` is symmetric with every
    eigenvalue of A doubled, and its 2-dim real eigenspaces map onto
    the 1-dim complex eigenspaces by ``[p; q] ↦ p + iq`` (the J-
    rotation ``[−q; p]`` maps to ``i·v``) — so one real ``eigh`` of
    the 2n problem plus an every-other selection of the ascending
    pairs recovers the complex decomposition, all on the tuned real
    path.  Complex eigenvectors come out unit-norm for free (the real
    unit norm IS the complex one)."""
    from .symmetric import eigh_batched

    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    X = 0.5 * (a_re + jnp.swapaxes(a_re, 1, 2)).astype(f32)
    Y = 0.5 * (a_im - jnp.swapaxes(a_im, 1, 2)).astype(f32)
    B, n, _ = X.shape
    r = eigh_batched(_embed(X, Y))
    w = r.w[:, ::2]
    v_re = r.V[:, :n, ::2]
    v_im = r.V[:, n:, ::2]
    # Honesty: complex orthonormality V^H V = I catches a doubled pair
    # selected twice (degenerate mixing), and the residual catches
    # pair-straddling selections.
    hp = jax.lax.Precision.HIGHEST
    g_re = jnp.einsum("bni,bnj->bij", v_re, v_re, precision=hp) + \
        jnp.einsum("bni,bnj->bij", v_im, v_im, precision=hp)
    g_im = jnp.einsum("bni,bnj->bij", v_re, v_im, precision=hp) - \
        jnp.einsum("bni,bnj->bij", v_im, v_re, precision=hp)
    eye = jnp.eye(n, dtype=f32)
    orth_err = jnp.max(
        jnp.abs(g_re - eye) + jnp.abs(g_im), axis=(1, 2)
    )
    av_re = jnp.einsum("bij,bjk->bik", X, v_re, precision=hp) - \
        jnp.einsum("bij,bjk->bik", Y, v_im, precision=hp)
    av_im = jnp.einsum("bij,bjk->bik", X, v_im, precision=hp) + \
        jnp.einsum("bij,bjk->bik", Y, v_re, precision=hp)
    res = jnp.sqrt(jnp.sum(
        (av_re - w[:, None, :] * v_re) ** 2
        + (av_im - w[:, None, :] * v_im) ** 2, axis=1
    ))
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=1), 1e-30)
    eps = float(jnp.finfo(f32).eps)
    tol = 64.0 * n * eps
    ok = r.converged & (orth_err < tol * n) & (
        jnp.max(res, axis=1) < tol * scale
    )
    ok_np = __import__("numpy").asarray(ok)
    if not ok_np.all():
        # Degenerate-eigenvalue repair: with an A-eigenvalue of
        # multiplicity m the embedding has a 2m-dim real eigenspace,
        # and the every-other selection can pick two J-partners
        # (complex-DEPENDENT: C(Jw) = i·C(w)).  Re-select on host by
        # complex MGS over ALL 2n candidates in ascending order —
        # only the flagged lanes pay.
        import numpy as np

        Vfull = np.asarray(r.V, np.float64)
        wfull = np.asarray(r.w, np.float64)
        w_h = np.asarray(w).copy()
        vr_h = np.asarray(v_re).copy()
        vi_h = np.asarray(v_im).copy()
        fixed = ok_np.copy()
        for b in np.nonzero(~ok_np)[0]:
            kept = []
            kw = []
            for j in range(2 * n):
                c = Vfull[b, :n, j] + 1j * Vfull[b, n:, j]
                for kvec in kept:
                    c = c - (kvec.conj() @ c) * kvec
                nc = np.linalg.norm(c)
                if nc > 0.3:
                    kept.append(c / nc)
                    kw.append(wfull[b, j])
                if len(kept) == n:
                    break
            if len(kept) == n:
                Vc = np.stack(kept, axis=1)
                w_h[b] = np.asarray(kw, w_h.dtype)
                vr_h[b] = Vc.real.astype(vr_h.dtype)
                vi_h[b] = Vc.imag.astype(vi_h.dtype)
                fixed[b] = True
        w = jnp.asarray(w_h)
        v_re = jnp.asarray(vr_h)
        v_im = jnp.asarray(vi_h)
        ok = jnp.asarray(fixed) & r.converged
    return ComplexEighResult(w, v_re, v_im, ok)


class ComplexEigResult(NamedTuple):
    """General complex eigendecomposition (eigenvalues in no
    particular order; ``valid`` per column, ``ok`` per lane gates the
    A-block extraction count and residuals)."""

    real: jax.Array   # [B, n]
    imag: jax.Array   # [B, n]
    v_re: jax.Array   # [B, n, n]
    v_im: jax.Array   # [B, n, n]
    valid: jax.Array  # [B, n]
    ok: jax.Array     # [B]


def eig_complex_batched(a_re: jax.Array, a_im: jax.Array):
    """Eigendecomposition of batched GENERAL complex matrices through
    the real embedding ``M = [[X, −Y], [Y, X]]``.

    ``M ≅ A ⊕ conj(A)``, so ``spec(M) = spec(A) ⊎ conj(spec(A))``.
    The A-block members are identified from the eigenVECTOR structure:
    for any eigenpair ``(λ, [a; b])`` of M, ``u = a + ib`` satisfies
    ``A u = λ u`` identically — and ``u ≡ 0`` exactly on the
    conj-block copies.  Selection is greedy by descending ‖u‖ but
    CONSUMES THE CONJUGATE PARTNER from the candidate pool at every
    pick (host-side per lane): a naive top-n-by-‖u‖ rule breaks
    whenever both λ and λ̄ lie in spec(A) — e.g. real-valued A, where
    M = A ⊕ A and EVERY column has ‖u‖ ~ 1, so top-n can return λ
    twice and λ̄ never.  Verified by true complex residuals."""
    import numpy as np

    from .schur import eig_batched

    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    X = a_re.astype(f32)
    Y = a_im.astype(f32)
    B, n, _ = X.shape
    eg = eig_batched(_embed(X, Y))
    # complex eigenvector w = [a; b]: a = top, b = bottom
    a_r = eg.vectors_real[:, :n, :]
    a_i = eg.vectors_imag[:, :n, :]
    b_r = eg.vectors_real[:, n:, :]
    b_i = eg.vectors_imag[:, n:, :]
    u_re = a_r - b_i
    u_im = a_i + b_r
    unorm = jnp.sqrt(jnp.sum(u_re**2 + u_im**2, axis=1))  # [B, 2n]
    un = np.asarray(unorm)
    valid_in = np.asarray(eg.valid)
    lam_all = (np.asarray(eg.real, np.float64)
               + 1j * np.asarray(eg.imag, np.float64))  # [B, 2n]
    score = np.where(valid_in, un, -1.0)
    # Greedy pair-consuming selection: spec(M) = S ⊎ conj(S) pairs
    # every A-eigenvalue with a conjugate partner; picking a column
    # must retire that partner or duplicated spectra slip through
    # with perfect residuals (each copy IS a true eigenpair).  The
    # eigenvalue multiset alone cannot disambiguate {λ, λ̄} from
    # {λ, λ} (real A: S = S̄, every column has ‖u‖ ~ 1 and the two
    # copies of λ give PARALLEL u = (α+iβ)v) — so a pick must also be
    # complex-independent of same-cluster picks; dependent candidates
    # stay alive to serve as some later pick's conjugate partner.
    u_h = (np.asarray(u_re, np.float64)
           + 1j * np.asarray(u_im, np.float64))  # [B, n, 2n]
    idx = np.zeros((B, n), np.int32)
    ok_sel = np.zeros(B, bool)
    lam_scale = np.maximum(np.abs(lam_all).max(axis=1), 1e-30)
    for b in range(B):
        alive = valid_in[b].copy()
        tried = np.zeros(2 * n, bool)
        kept_u, kept_lam, picked = [], [], []
        pair_ok = True
        ctol = 1e-3 * lam_scale[b]
        for j in np.argsort(-score[b], kind="stable"):
            if len(picked) == n:
                break
            if not alive[j] or tried[j]:
                continue  # consumed as a partner / known duplicate
            if score[b, j] <= 1e-3:
                break  # remaining candidates are conj-block copies
            c = u_h[b, :, j] / max(np.linalg.norm(u_h[b, :, j]), 1e-30)
            for kl, ku in zip(kept_lam, kept_u):
                if abs(kl - lam_all[b, j]) < ctol:
                    c = c - (ku.conj() @ c) * ku
            if np.linalg.norm(c) < 0.3:
                tried[j] = True  # duplicate copy: partner-only
                continue
            cand = np.nonzero(alive)[0]
            cand = cand[cand != j]
            if cand.size == 0:
                break
            k = cand[np.argmin(np.abs(lam_all[b, cand]
                                      - lam_all[b, j].conj()))]
            if abs(lam_all[b, k] - lam_all[b, j].conj()) \
                    > 1e-2 * lam_scale[b]:
                pair_ok = False  # multiset structure broken
            alive[j] = False
            alive[k] = False
            kept_u.append(c / np.linalg.norm(c))
            kept_lam.append(lam_all[b, j])
            picked.append(j)
        if len(picked) == n:
            idx[b] = picked
            ok_sel[b] = pair_ok

    idxj = jnp.asarray(idx)
    take = lambda arr: jnp.take_along_axis(arr, idxj[:, None, :], axis=2)
    u_re = take(u_re)
    u_im = take(u_im)
    lam_re = jnp.take_along_axis(eg.real, idxj, axis=1)
    lam_im = jnp.take_along_axis(eg.imag, idxj, axis=1)
    valid = jnp.take_along_axis(eg.valid, idxj, axis=1)
    nrm = jnp.sqrt(jnp.sum(u_re**2 + u_im**2, axis=1))
    nrm = jnp.maximum(nrm, 1e-30)[:, None, :]
    u_re, u_im = u_re / nrm, u_im / nrm
    # true complex residuals ‖A v − λ v‖
    hp = jax.lax.Precision.HIGHEST
    av_re = jnp.einsum("bij,bjk->bik", X, u_re, precision=hp) - \
        jnp.einsum("bij,bjk->bik", Y, u_im, precision=hp)
    av_im = jnp.einsum("bij,bjk->bik", X, u_im, precision=hp) + \
        jnp.einsum("bij,bjk->bik", Y, u_re, precision=hp)
    rr = av_re - (lam_re[:, None, :] * u_re - lam_im[:, None, :] * u_im)
    ri = av_im - (lam_re[:, None, :] * u_im + lam_im[:, None, :] * u_re)
    res = jnp.sqrt(jnp.sum(rr * rr + ri * ri, axis=1))
    scale = jnp.maximum(
        jnp.max(jnp.abs(X) + jnp.abs(Y), axis=(1, 2)), 1e-30
    )
    valid = valid & (res < 1e-2 * scale[:, None])
    ok = jnp.asarray(ok_sel) & eg.converged & jnp.all(valid, axis=1)
    return ComplexEigResult(
        lam_re, lam_im, u_re, u_im, valid, ok
    )


# ---------------------------------------------------------------------------
# Complex matmul helpers (4 real GEMMs at HIGHEST precision)
# ---------------------------------------------------------------------------

def _cmatmul(ar, ai, br, bi, ta=False):
    """Complex product A·B (or Aᴴ·B with ``ta=True``) on (re, im)
    pairs."""
    hp = jax.lax.Precision.HIGHEST
    if ta:
        f = lambda x, y: jnp.einsum("bji,bjk->bik", x, y, precision=hp)
        # (Ar - i Ai)ᵀ (Br + i Bi)
        return (
            f(ar, br) + f(ai, bi),
            f(ar, bi) - f(ai, br),
        )
    f = lambda x, y: jnp.einsum("bij,bjk->bik", x, y, precision=hp)
    return f(ar, br) - f(ai, bi), f(ar, bi) + f(ai, br)


class ComplexCholResult(NamedTuple):
    """Complex Cholesky ``A = L·Lᴴ`` (L lower triangular, real positive
    diagonal).  ``ok=False`` flags non-Hermitian-positive-definite
    lanes (their L is garbage past the failure pivot)."""

    l_re: jax.Array
    l_im: jax.Array
    ok: jax.Array


def chol_complex_batched(
    a_re: jax.Array, a_im: jax.Array
) -> ComplexCholResult:
    """Cholesky of batched HERMITIAN-PD complex matrices, right-looking
    rank-1 updates in re/im arithmetic (reference semantics:
    numpy.linalg.cholesky for complex input).  The real embedding is
    useless here — ``chol(embed(A)) ≠ embed(chol(A))`` (the embedding
    of a complex triangular matrix is not triangular) — so the loop
    runs directly, O(n) steps of rank-1 GEMM updates."""
    B, n, _ = a_re.shape
    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    re = a_re.astype(f32)
    im = 0.5 * (a_im - jnp.swapaxes(a_im, 1, 2)).astype(f32)
    re = 0.5 * (re + jnp.swapaxes(re, 1, 2))
    rows = jnp.arange(n)

    def body(k, st):
        re, im, lr, li, ok = st
        d = re[:, k, k]                       # real for Hermitian A
        ok = ok & (d > 0)
        dsafe = jnp.where(d > 0, d, 1.0)
        inv = jax.lax.rsqrt(dsafe)
        mask = (rows[None, :] >= k).astype(f32)
        cr = re[:, :, k] * mask * inv[:, None]
        ci = im[:, :, k] * mask * inv[:, None]
        oh = (rows[None, :] == k).astype(f32)
        lr = lr + cr[:, :, None] * oh[:, None, :]
        li = li + ci[:, :, None] * oh[:, None, :]
        # trailing update A -= c cᴴ  (c cᴴ)_{ij} = c_i conj(c_j)
        re = re - (cr[:, :, None] * cr[:, None, :]
                   + ci[:, :, None] * ci[:, None, :])
        im = im - (ci[:, :, None] * cr[:, None, :]
                   - cr[:, :, None] * ci[:, None, :])
        return re, im, lr, li, ok

    z = jnp.zeros((B, n, n), f32)
    re, im, lr, li, ok = jax.lax.fori_loop(
        0, n, body, (re, im, z, z, jnp.ones((B,), bool))
    )
    return ComplexCholResult(lr, li, ok)


class ComplexQRResult(NamedTuple):
    """Thin complex QR: ``A = Q·R``, Q [B, m, n] with QᴴQ = I, R upper
    triangular with real positive diagonal (LAPACK convention)."""

    q_re: jax.Array
    q_im: jax.Array
    r_re: jax.Array
    r_im: jax.Array
    ok: jax.Array


def qr_complex_batched(
    a_re: jax.Array, a_im: jax.Array
) -> ComplexQRResult:
    """Thin QR of batched complex ``[B, m, n]`` (m ≥ n, full column
    rank) by complex CholeskyQR2 — the same MXU-shaped algorithm as
    the real ``ops.lstsq.qr_batched``: two passes of
    ``G = AᴴA; L = chol(G); Q = A·L⁻ᴴ`` square the conditioning once
    but the second pass repairs orthogonality to f32 roundoff.  The
    triangular inverse L⁻¹ goes through the real-embedding general
    inverse (cold-path simplicity; n is the small dimension)."""
    G_re, G_im = _cmatmul(a_re, a_im, a_re, a_im, ta=True)
    c1 = chol_complex_batched(G_re, G_im)
    il1_re, il1_im = inverse_complex_batched(c1.l_re, c1.l_im)
    # Q1 = A · L⁻ᴴ: (L⁻¹)ᴴ = conj-transpose of the inverse
    ih_re = jnp.swapaxes(il1_re, 1, 2)
    ih_im = -jnp.swapaxes(il1_im, 1, 2)
    q_re, q_im = _cmatmul(a_re, a_im, ih_re, ih_im)
    G2_re, G2_im = _cmatmul(q_re, q_im, q_re, q_im, ta=True)
    c2 = chol_complex_batched(G2_re, G2_im)
    il2_re, il2_im = inverse_complex_batched(c2.l_re, c2.l_im)
    q_re, q_im = _cmatmul(
        q_re, q_im, jnp.swapaxes(il2_re, 1, 2),
        -jnp.swapaxes(il2_im, 1, 2),
    )
    # R = L2ᴴ · L1ᴴ  (A = Q2 (L2ᴴ L1ᴴ))
    r_re, r_im = _cmatmul(
        jnp.swapaxes(c2.l_re, 1, 2), -jnp.swapaxes(c2.l_im, 1, 2),
        jnp.swapaxes(c1.l_re, 1, 2), -jnp.swapaxes(c1.l_im, 1, 2),
    )
    return ComplexQRResult(q_re, q_im, r_re, r_im, c1.ok & c2.ok)


class ComplexSVDResult(NamedTuple):
    """Thin complex SVD ``A = U diag(s) Vᴴ`` (s descending ≥ 0)."""

    u_re: jax.Array
    u_im: jax.Array
    s: jax.Array
    v_re: jax.Array
    v_im: jax.Array
    ok: jax.Array


def svd_complex_batched(
    a_re: jax.Array, a_im: jax.Array, iters: int = 8
) -> ComplexSVDResult:
    """Thin SVD of batched complex ``[B, m, n]`` (any shape).

    The QDWH polar factor of ``embed(A)`` IS ``embed(U_polar(A))`` by
    uniqueness of the polar decomposition (the embedding is an algebra
    isomorphism commuting with ᴴ↔ᵀ), so the tuned REAL
    ``ops.svd.polar_batched`` does all the heavy lifting; the blocks
    are read off (averaged — their agreement is part of ``ok``), then
    ``H = Uᴴ A`` is complex-Hermitian-PSD and ``eigh_complex_batched``
    finishes.  Host-driven (the degenerate-eigh repair), not
    jittable — like ``eig_complex_batched``."""
    from .svd import polar_batched

    B, m, n = a_re.shape
    if m < n:
        r = svd_complex_batched(
            jnp.swapaxes(a_re, 1, 2), -jnp.swapaxes(a_im, 1, 2),
            iters=iters,
        )
        # A = (Aᴴ)ᴴ = (U' s V'ᴴ)ᴴ = V' s U'ᴴ
        return ComplexSVDResult(
            r.v_re, r.v_im, r.s, r.u_re, r.u_im, r.ok
        )
    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    a_re = a_re.astype(f32)
    a_im = a_im.astype(f32)
    pol = polar_batched(_embed(a_re, a_im), iters=iters)
    up = pol.up
    u_re = 0.5 * (up[:, :m, :n] + up[:, m:, n:])
    u_im = 0.5 * (up[:, m:, :n] - up[:, :m, n:])
    emb_err = jnp.max(jnp.abs(up - _embed(u_re, u_im)), axis=(1, 2))
    h_re, h_im = _cmatmul(u_re, u_im, a_re, a_im, ta=True)
    eh = eigh_complex_batched(h_re, h_im)
    s = jnp.maximum(eh.w[:, ::-1], 0.0)
    v_re = eh.v_re[:, :, ::-1]
    v_im = eh.v_im[:, :, ::-1]
    su_re, su_im = _cmatmul(u_re, u_im, v_re, v_im)
    ok = pol.ok & eh.ok & (emb_err < 1e-3)
    return ComplexSVDResult(su_re, su_im, s, v_re, v_im, ok)


def pinv_complex_batched(
    a_re: jax.Array, a_im: jax.Array, rcond=None
):
    """Moore–Penrose pseudoinverse of batched complex matrices via the
    complex SVD: ``A⁺ = V Σ⁺ Uᴴ`` (numpy default cutoff
    ``rcond = max(m, n)·eps``)."""
    B, m, n = a_re.shape
    r = svd_complex_batched(a_re, a_im)
    if rcond is None:
        rcond = max(m, n) * float(jnp.finfo(r.s.dtype).eps)
    cut = rcond * jnp.max(r.s, axis=1, keepdims=True)
    sinv = jnp.where(r.s > cut, 1.0 / jnp.maximum(r.s, 1e-37), 0.0)
    vr = r.v_re * sinv[:, None, :]
    vi = r.v_im * sinv[:, None, :]
    # (V Σ⁺) Uᴴ = (V Σ⁺) (conj U)ᵀ
    p_re, p_im = _cmatmul(
        vr, vi, jnp.swapaxes(r.u_re, 1, 2), -jnp.swapaxes(r.u_im, 1, 2),
    )
    # Self-contained honesty: the SVD's ok is conservative on exactly
    # rank-deficient input (the polar factor is non-unique on the null
    # directions, which the Σ⁺ cutoff then discards anyway) — verify
    # the Penrose identities A·A⁺·A = A and A⁺·A·A⁺ = A⁺ directly.
    ap_re, ap_im = _cmatmul(a_re, a_im, p_re, p_im)
    apa_re, apa_im = _cmatmul(ap_re, ap_im, a_re, a_im)
    pap_re, pap_im = _cmatmul(p_re, p_im, ap_re, ap_im)
    amax = jnp.maximum(
        jnp.max(jnp.abs(a_re) + jnp.abs(a_im), axis=(1, 2)), 1e-30
    )
    pmax = jnp.maximum(
        jnp.max(jnp.abs(p_re) + jnp.abs(p_im), axis=(1, 2)), 1e-30
    )
    e1 = jnp.max(
        jnp.abs(apa_re - a_re) + jnp.abs(apa_im - a_im), axis=(1, 2)
    )
    e2 = jnp.max(
        jnp.abs(pap_re - p_re) + jnp.abs(pap_im - p_im), axis=(1, 2)
    )
    ok = (e1 < 1e-3 * amax) & (e2 < 1e-3 * pmax)
    return p_re, p_im, ok


def lstsq_complex_batched(
    a_re: jax.Array, a_im: jax.Array,
    b_re: jax.Array, b_im: jax.Array,
):
    """Minimum-norm least-squares solution of complex ``A x ≈ b``
    (``b`` vectors ``[B, m]``) through the complex pseudoinverse —
    rank-deficient-safe, matching numpy.linalg.lstsq semantics."""
    p_re, p_im, ok = pinv_complex_batched(a_re, a_im)
    hp = jax.lax.Precision.HIGHEST
    mv = lambda M, v: jnp.einsum("bij,bj->bi", M, v, precision=hp)
    x_re = mv(p_re, b_re) - mv(p_im, b_im)
    x_im = mv(p_re, b_im) + mv(p_im, b_re)
    return x_re, x_im, ok


# ---------------------------------------------------------------------------
# Complex matrix functions + matrix equations through the embedding
# ---------------------------------------------------------------------------

def _extract(M: jax.Array, m: int, n: int):
    """Read the (re, im) blocks off an (approximately) embedded
    ``[B, 2m, 2n]`` matrix, plus the embedding-structure error (the
    two re blocks / two im blocks must agree — a true embedded result
    differs only by roundoff)."""
    re = 0.5 * (M[:, :m, :n] + M[:, m:, n:])
    im = 0.5 * (M[:, m:, :n] - M[:, :m, n:])
    err = jnp.max(jnp.abs(M - _embed(re, im)), axis=(1, 2))
    scale = jnp.maximum(jnp.max(jnp.abs(M), axis=(1, 2)), 1e-30)
    return re, im, err / scale


def expm_complex_batched(a_re: jax.Array, a_im: jax.Array):
    """Complex matrix exponential: ``expm(embed(A)) = embed(expm(A))``
    exactly (every real-coefficient power series commutes with the
    embedding), so the tuned real Padé-13 scaling-and-squaring
    (`ops.funm.expm_batched`) does the work.  Returns
    ``(re, im, ok)`` with ``ok`` gating the embedded structure of the
    result (violations mean the real path itself broke down)."""
    from .funm import expm_batched

    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    n = a_re.shape[-1]
    E = expm_batched(_embed(a_re.astype(f32), a_im.astype(f32)))
    re, im, err = _extract(E, n, n)
    return re, im, (err < 1e-4) & jnp.all(jnp.isfinite(E), axis=(1, 2))


def sqrtm_complex_batched(a_re: jax.Array, a_im: jax.Array):
    """Principal complex matrix square root via the embedded
    Denman–Beavers iteration (`ops.funm.sqrtm_batched`); defined for
    the same lanes as the complex principal root (no eigenvalues on
    ℝ⁻ — ``spec(embed A) = spec(A) ∪ conj(spec A)`` hits ℝ⁻ exactly
    when spec(A) does).  Returns ``(re, im, ok)``."""
    from .funm import sqrtm_batched

    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    n = a_re.shape[-1]
    r = sqrtm_batched(_embed(a_re.astype(f32), a_im.astype(f32)))
    re, im, err = _extract(r.Y, n, n)
    return re, im, r.converged & (err < 1e-4)


def logm_complex_batched(a_re: jax.Array, a_im: jax.Array):
    """Principal complex matrix logarithm via the embedded
    inverse-scaling-and-squaring (`ops.funm.logm_batched`).  Returns
    ``(re, im, ok)``."""
    from .funm import logm_batched

    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    n = a_re.shape[-1]
    r = logm_batched(_embed(a_re.astype(f32), a_im.astype(f32)))
    re, im, err = _extract(r.L, n, n)
    return re, im, r.converged & (err < 1e-4)


def funm_hermitian_batched(a_re: jax.Array, a_im: jax.Array, f):
    """Apply a scalar function to a HERMITIAN complex matrix through
    its eigendecomposition: ``f(A) = V f(Λ) Vᴴ`` (the complex
    counterpart of `ops.funm`'s SPD spectral helpers).  ``f`` maps a
    real eigenvalue array to a real array.  Returns ``(re, im, ok)``;
    host-driven (the degenerate-eigh repair)."""
    eh = eigh_complex_batched(a_re, a_im)
    fw = f(eh.w)
    vr = eh.v_re * fw[:, None, :]
    vi = eh.v_im * fw[:, None, :]
    # (V f(Λ)) Vᴴ
    re, im = _cmatmul(
        vr, vi, jnp.swapaxes(eh.v_re, 1, 2), -jnp.swapaxes(eh.v_im, 1, 2),
    )
    return re, im, eh.ok


def funm_complex_batched(a_re: jax.Array, a_im: jax.Array, f):
    """Apply an arbitrary analytic scalar function to a GENERAL complex
    matrix through its eigendecomposition ``f(A) = V f(Λ) V⁻¹`` (the
    complex counterpart of ``ops.funm.funm_batched``).  ``f`` receives
    a complex [B, n] eigenvalue array and returns complex.  Returns
    ``(re, im, resid, ok)`` with ``resid`` the per-lane relative
    reconstruction error of the diagonalization (grows with κ(V);
    near-defective input should use the Padé/Newton specialisations).
    Host-driven (the eigendecomposition's chunked driver)."""
    r = eig_complex_batched(a_re, a_im)
    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    lam = jax.lax.complex(r.real.astype(f32), r.imag.astype(f32))
    fd = f(lam)
    fr = jnp.real(fd).astype(f32)
    fi = jnp.imag(fd).astype(f32)
    vinv_re, vinv_im = inverse_complex_batched(r.v_re, r.v_im)
    w_re = r.v_re * fr[:, None, :] - r.v_im * fi[:, None, :]
    w_im = r.v_re * fi[:, None, :] + r.v_im * fr[:, None, :]
    F_re, F_im = _cmatmul(w_re, w_im, vinv_re, vinv_im)
    # Reconstruction diagnostic with the same V, V⁻¹ (f = identity).
    z_re = r.v_re * r.real[:, None, :] - r.v_im * r.imag[:, None, :]
    z_im = r.v_re * r.imag[:, None, :] + r.v_im * r.real[:, None, :]
    A_re, A_im = _cmatmul(z_re, z_im, vinv_re, vinv_im)
    anorm = jnp.maximum(
        jnp.max(jnp.abs(a_re) + jnp.abs(a_im), axis=(1, 2)), 1e-30
    )
    resid = jnp.max(
        jnp.abs(A_re - a_re) + jnp.abs(A_im - a_im), axis=(1, 2)
    ) / anorm
    n = a_re.shape[-1]
    eps = float(jnp.finfo(f32).eps)
    ok = r.ok & (resid <= 1e3 * n * eps)
    return F_re, F_im, resid, ok


def sylvester_complex_batched(
    a_re, a_im, b_re, b_im, c_re, c_im,
):
    """Solve the complex Sylvester equation ``A X + X B = C`` through
    the embedded real equation ``embed(A) Z + Z embed(B) = embed(C)``
    (`ops.sylvester.sylvester_batched`); its unique solution is
    ``embed(X)`` whenever it exists.

    CAVEAT (flagged, not silent): the embedded equation requires
    ``(spec A ∪ conj spec A) ∩ −(spec B ∪ conj spec B) = ∅`` — e.g.
    ``A = [i], B = [i]`` is complex-solvable but embeds singularly.
    ``ok`` is a self-contained TRUE-RESIDUAL check
    (``‖AX + XB − C‖ ≤ tol·scale``), so such lanes report False
    rather than wrong answers."""
    from .sylvester import sylvester_batched

    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    n = a_re.shape[-1]
    m = b_re.shape[-1]
    a_re, a_im = a_re.astype(f32), a_im.astype(f32)
    b_re, b_im = b_re.astype(f32), b_im.astype(f32)
    c_re, c_im = c_re.astype(f32), c_im.astype(f32)
    r = sylvester_batched(
        _embed(a_re, a_im), _embed(b_re, b_im), _embed(c_re, c_im)
    )
    x_re, x_im, emb_err = _extract(r.X, n, m)
    ax_re, ax_im = _cmatmul(a_re, a_im, x_re, x_im)
    xb_re, xb_im = _cmatmul(x_re, x_im, b_re, b_im)
    res = jnp.max(
        jnp.abs(ax_re + xb_re - c_re) + jnp.abs(ax_im + xb_im - c_im),
        axis=(1, 2),
    )
    scale = jnp.maximum(
        (jnp.max(jnp.abs(a_re) + jnp.abs(a_im), axis=(1, 2))
         + jnp.max(jnp.abs(b_re) + jnp.abs(b_im), axis=(1, 2)))
        * jnp.maximum(
            jnp.max(jnp.abs(x_re) + jnp.abs(x_im), axis=(1, 2)), 1.0
        ),
        1e-30,
    )
    ok = r.ok & (emb_err < 1e-3) & (res < 1e-3 * scale)
    return x_re, x_im, ok


def lyapunov_complex_batched(a_re, a_im, q_re, q_im):
    """Continuous complex Lyapunov equation ``A X + X Aᴴ = Q``
    (``Q`` Hermitian ⇒ ``X`` Hermitian) — Sylvester with ``B = Aᴴ``."""
    return sylvester_complex_batched(
        a_re, a_im,
        jnp.swapaxes(a_re, 1, 2), -jnp.swapaxes(a_im, 1, 2),
        q_re, q_im,
    )


class ComplexGeigResult(NamedTuple):
    """Complex generalized eigenproblem ``A v = λ B v`` (B invertible).
    ``rcond_b`` estimates B's reciprocal condition from the embedded
    LU — eigenvalue error scales with ``1/rcond_b``."""

    real: jax.Array
    imag: jax.Array
    v_re: jax.Array
    v_im: jax.Array
    valid: jax.Array
    ok: jax.Array
    rcond_b: jax.Array


def eig_generalized_complex_batched(
    a_re, a_im, b_re, b_im,
) -> ComplexGeigResult:
    """Complex ``A v = λ B v`` by LU reduction to ``B⁻¹A`` (the same
    strategy as the real `ops.geig.eig_generalized_batched`,
    reference-free complex counterpart): one embedded solve with
    embedded-A right-hand side gives ``embed(B⁻¹A)`` directly, then
    `eig_complex_batched` finishes.  Eigenvector residuals are checked
    against the TRUE pencil (``‖A v − λ B v‖``), not the reduced
    matrix."""
    from .cond import rcond_batched

    f32 = jnp.result_type(a_re.dtype, jnp.float32)
    n = a_re.shape[-1]
    a_re, a_im = a_re.astype(f32), a_im.astype(f32)
    b_re, b_im = b_re.astype(f32), b_im.astype(f32)
    Be = _embed(b_re, b_im)
    # Z = embed(B)⁻¹ embed(A) = embed(B⁻¹A), one blocked solve per RHS
    from .lu_blocked import blocked_solve_batched
    from .lu import lu_factor_batched, lu_solve_batched

    Ae = _embed(a_re, a_im)
    nn = 2 * n
    nb = next((w for w in (64, 48, 32, 16, 8) if nn % w == 0), None)
    if nb is not None and nn >= 16:
        Z = blocked_solve_batched(Be, Ae, nb=nb)
    else:
        res = lu_factor_batched(Be)
        Z = jax.vmap(
            lambda c: lu_solve_batched(res, c), in_axes=2, out_axes=2
        )(Ae)
    m_re, m_im, emb_err = _extract(Z, n, n)
    eg = eig_complex_batched(m_re, m_im)
    # true pencil residuals ‖A v − λ B v‖ per column
    av_re, av_im = _cmatmul(a_re, a_im, eg.v_re, eg.v_im)
    bv_re, bv_im = _cmatmul(b_re, b_im, eg.v_re, eg.v_im)
    lr, li = eg.real[:, None, :], eg.imag[:, None, :]
    rr = av_re - (lr * bv_re - li * bv_im)
    ri = av_im - (lr * bv_im + li * bv_re)
    res_c = jnp.sqrt(jnp.sum(rr * rr + ri * ri, axis=1))
    scale = jnp.maximum(
        jnp.max(jnp.abs(a_re) + jnp.abs(a_im), axis=(1, 2))[:, None]
        + jnp.sqrt((lr * lr + li * li)[:, 0, :])
        * jnp.max(jnp.abs(b_re) + jnp.abs(b_im), axis=(1, 2))[:, None],
        1e-30,
    )
    valid = eg.valid & (res_c < 1e-2 * scale)
    rc = rcond_batched(Be)
    ok = eg.ok & (emb_err < 1e-3) & (rc > 0)
    return ComplexGeigResult(
        eg.real, eg.imag, eg.v_re, eg.v_im, valid, ok, rc
    )


class ComplexRootsResult(NamedTuple):
    real: jax.Array
    imag: jax.Array
    ok: jax.Array


def roots_complex_batched(c_re: jax.Array, c_im: jax.Array):
    """All d roots of batched degree-d polynomials with COMPLEX
    coefficients (descending order, ``c[:, 0]`` leading) — complex
    companion matrix through `eig_complex_batched` (the complex
    counterpart of `ops.roots.roots_batched`)."""
    B, dp1 = c_re.shape
    d = dp1 - 1
    if d < 1:
        raise ValueError("need degree >= 1 (at least 2 coefficients)")
    f32 = jnp.result_type(c_re.dtype, jnp.float32)
    c_re = c_re.astype(f32)
    c_im = c_im.astype(f32)
    lead2 = c_re[:, 0] ** 2 + c_im[:, 0] ** 2
    ok = lead2 > 0
    safe = jnp.where(ok, lead2, 1.0)
    # monic = c[1:] / c[0] (complex divide)
    mr = (c_re[:, 1:] * c_re[:, 0:1] + c_im[:, 1:] * c_im[:, 0:1]) \
        / safe[:, None]
    mi = (c_im[:, 1:] * c_re[:, 0:1] - c_re[:, 1:] * c_im[:, 0:1]) \
        / safe[:, None]
    sub = jnp.eye(d, k=-1, dtype=f32)
    first = (jnp.arange(d)[None, :, None] == 0).astype(f32)
    comp_re = jnp.broadcast_to(sub, (B, d, d)) * (1 - first) \
        - mr[:, None, :] * first
    comp_im = -mi[:, None, :] * first
    eg = eig_complex_batched(comp_re, comp_im)
    return ComplexRootsResult(eg.real, eg.imag, ok & eg.ok)


def solve_complex_dd_batched(
    a_re: jax.Array, a_im: jax.Array,
    b_re: jax.Array, b_im: jax.Array,
):
    """Complex solve to f64-CLASS backward error on f32 hardware: the
    real embedding composed with the extended-precision dd solver
    (`ops.dd.solve_dd_batched` — error-free Ozaki slice-GEMM residual
    refinement).  Returns ``(x_re, x_im, resid, ok)`` with the real
    parts carrying the collapsed dd solution (the embedding is exact,
    so the complex backward error equals the real one)."""
    from .dd import solve_dd_batched

    n = a_re.shape[-1]
    M = _embed(a_re, a_im)
    rhs = jnp.concatenate([b_re, b_im], axis=1)
    r = solve_dd_batched(M, rhs)
    x = r.x_hi + r.x_lo
    return x[:, :n], x[:, n:], r.resid, r.ok


@jax.jit
def complete_basis_complex_batched(u_re: jax.Array, u_im: jax.Array):
    """Orthonormal complement of complex orthonormal columns
    ``u [B, m, k]`` (k < m): ``[B, m, m-k]`` (re, im) with
    ``[u | complement]`` unitary.  Complex counterpart of
    ``ops.lstsq.complete_basis_batched`` — project a fixed Gaussian
    block onto ``range(u)^⊥`` (two rounds) and orthonormalize with
    complex CholeskyQR2; serves ``linalg.svd(full_matrices=True)``."""
    B, m, k = u_re.shape
    r = m - k
    f32 = jnp.result_type(u_re.dtype, jnp.float32)
    u_re = u_re.astype(f32)
    u_im = u_im.astype(f32)
    kr, ki = jax.random.split(jax.random.PRNGKey(7))
    w_re = jnp.broadcast_to(
        jax.random.normal(kr, (m, r), f32), (B, m, r)
    )
    w_im = jnp.broadcast_to(
        jax.random.normal(ki, (m, r), f32), (B, m, r)
    )
    for _ in range(2):
        p_re, p_im = _cmatmul(u_re, u_im, w_re, w_im, ta=True)
        q_re, q_im = _cmatmul(u_re, u_im, p_re, p_im)
        w_re, w_im = w_re - q_re, w_im - q_im
        qr = qr_complex_batched(w_re, w_im)
        w_re, w_im = qr.q_re, qr.q_im
    return w_re, w_im
