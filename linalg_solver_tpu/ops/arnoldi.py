"""Batched matrix-free Arnoldi (Krylov–Schur) for a few eigenpairs of
GENERAL real matrices.

Fills the iterative-eigensolver gap between ``ops.lobpcg`` (SPD extreme
pairs only) and the dense O(n³) ``ops.schur`` stack: ``k`` exterior
eigenvalues of an arbitrary real operator known only through matvecs,
at O(m · matvec + B·n·m²) per restart cycle with a small fixed basis
``m ≪ n``.

Algorithm — Krylov–Schur restarting (Stewart 2001), batched:

1. **Expansion**: grow a Krylov decomposition ``A·U_m = U_m·S + β·u⁺·eₘᵀ``
   by CGS2 Arnoldi steps (two classical Gram–Schmidt passes — all
   batched GEMVs, MXU work; no sequential MGS column sweeps).  Happy
   breakdown is handled per lane by splicing in a fresh orthonormalized
   random direction with zero coupling (the decomposition stays exact).
2. **Contraction**: eigendecompose the small Rayleigh matrix ``S``
   (``ops.schur.eig_batched`` — [B, m, m] is cheap), pick the wanted
   Ritz values per lane keeping conjugate pairs whole (an eigenvector
   group spans an invariant subspace of S, which is what makes the
   restarted relation ``A(UY) = (UY)(YᵀSY) + u⁺(βeₘᵀY)ᵀ`` exact — an
   arbitrary, non-invariant Y would leave a rank->1 residual and
   silently corrupt later Ritz estimates), re-orthonormalize the kept
   basis (shifted CholeskyQR3, ``ops.orth``), and resume expansion from
   column k+1.
3. **Honesty**: restart control uses the cheap S-based residual
   ``β·|yₘ|``, but the RETURNED ``resid``/``converged`` come from real
   matvecs on the final Ritz vectors (complex pairs in re/im
   arithmetic) — the same contract as ``ops.krylov``.

The reference has no iterative/partial eigensolvers (its eigen stack is
exact and dense, `reference linalg_solver/linalg.py:424-480`); this is
a TPU-native scale-out of that capability to operators too large to
densify, in the same family as the matrix-free Krylov linear solvers.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.precision import f32_matmuls
from .orth import orthonormal_columns

_HIGH = jax.lax.Precision.HIGHEST


class ArnoldiEigs(NamedTuple):
    """Top-k Ritz pairs.  Complex conjugate pairs appear with the
    ``+imag`` member first; when the k-th slot is the first member of a
    pair its conjugate is simply not listed (eigenvalues/vectors of the
    partner are the conjugates).  ``resid`` is the TRUE relative
    residual ``‖Av − λv‖ / scale`` from explicit matvecs (scale = the
    lane's largest Ritz magnitude); ``converged = resid ≤ tol``."""

    real: jax.Array           # [B, k]
    imag: jax.Array           # [B, k]
    vectors_real: jax.Array   # [B, n, k]
    vectors_imag: jax.Array   # [B, n, k]
    resid: jax.Array          # [B, k]
    converged: jax.Array      # [B, k] bool
    restarts: int             # python int — restart cycles used


def _make_expand(matvec, m: int):
    """Jitted expansion sweep: run Arnoldi steps j0..m−1 on the Krylov
    decomposition (U, S, u⁺)."""

    @jax.jit
    @f32_matmuls
    def expand(U, S, unext, j0, key):
        B, n, _ = U.shape

        def body(j, carry):
            U, S, unext, _ = carry
            U = jax.lax.dynamic_update_slice(
                U, unext[:, :, None], (0, 0, j)
            )
            w = matvec(unext)
            wnorm0 = jnp.sqrt(jnp.sum(w * w, axis=1))
            # CGS2: two classical Gram–Schmidt passes.  Unfilled basis
            # columns are exactly zero, so they contribute zero
            # coefficients — no masking needed.
            h1 = jnp.einsum("bnm,bn->bm", U, w, precision=_HIGH)
            w = w - jnp.einsum("bnm,bm->bn", U, h1, precision=_HIGH)
            h2 = jnp.einsum("bnm,bn->bm", U, w, precision=_HIGH)
            w = w - jnp.einsum("bnm,bm->bn", U, h2, precision=_HIGH)
            h = h1 + h2
            beta = jnp.sqrt(jnp.sum(w * w, axis=1))
            # Happy breakdown (invariant subspace found): splice in a
            # fresh orthonormalized random direction with ZERO coupling
            # so the decomposition stays exact for that lane.
            eps = jnp.finfo(w.dtype).eps
            good = beta > 64.0 * eps * jnp.maximum(wnorm0, 1e-30)
            r = jax.random.normal(
                jax.random.fold_in(key, j), (B, n), w.dtype
            )
            r = r - jnp.einsum(
                "bnm,bm->bn", U,
                jnp.einsum("bnm,bn->bm", U, r, precision=_HIGH),
                precision=_HIGH,
            )
            r = r - jnp.einsum(
                "bnm,bm->bn", U,
                jnp.einsum("bnm,bn->bm", U, r, precision=_HIGH),
                precision=_HIGH,
            )
            rnorm = jnp.maximum(
                jnp.sqrt(jnp.sum(r * r, axis=1)), 1e-30
            )
            unext_new = jnp.where(
                good[:, None],
                w / jnp.maximum(beta, 1e-30)[:, None],
                r / rnorm[:, None],
            )
            beta_eff = jnp.where(good, beta, 0.0)
            S = jax.lax.dynamic_update_slice(
                S, h[:, :, None], (0, 0, j)
            )
            # Subdiagonal coupling β → S[j+1, j] (only while a next
            # basis column exists; dynamic_update_slice would CLAMP the
            # out-of-range write at j = m−1, so gate it).
            S_sub = jax.lax.dynamic_update_slice(
                S, beta_eff[:, None, None], (0, j + 1, j)
            )
            S = jnp.where(j < m - 1, S_sub, S)
            return U, S, unext_new, beta_eff

        return jax.lax.fori_loop(
            j0, m, body, (U, S, unext, jnp.zeros((U.shape[0],), U.dtype))
        )

    return expand


@jax.jit
@f32_matmuls
def _contract(U, S, Yre, Yim, idx, use_im, slot_valid, beta):
    """Device side of the restart: build the kept real basis Y from the
    host-selected eigenvector slots, orthonormalize it, and project the
    Krylov decomposition onto it."""
    B, n, m = U.shape
    kp = idx.shape[1]
    # Y[b, :, s] = (use_im ? Yim : Yre)[b, :, idx[b, s]]  — m is small,
    # plain gathers are fine here (not a hot path).
    cols_re = jnp.take_along_axis(Yre, idx[:, None, :], axis=2)
    cols_im = jnp.take_along_axis(Yim, idx[:, None, :], axis=2)
    Y = jnp.where(use_im[:, None, :], cols_im, cols_re)
    Y = Y * slot_valid[:, None, :]
    # orthonormal_columns wants square stacks: pad columns to m.
    Ypad = jnp.concatenate(
        [Y, jnp.zeros((B, m, m - kp), Y.dtype)], axis=2
    )
    gmask = jnp.concatenate(
        [slot_valid.astype(bool),
         jnp.zeros((B, m - kp), bool)], axis=1
    )
    Q, _ = orthonormal_columns(Ypad, gmask)
    Y = Q[:, :, :kp]
    Snew = jnp.zeros_like(S)
    proj = jnp.einsum(
        "bim,bij,bjl->bml", Y, S, Y, precision=_HIGH
    )
    Snew = Snew.at[:, :kp, :kp].set(proj)
    # Residual coupling row: A·(UY) = (UY)·(YᵀSY) + u⁺·(β eₘᵀ Y).
    bnew = beta[:, None] * Y[:, m - 1, :]
    Snew = Snew.at[:, kp, :kp].set(bnew)
    Unew = jnp.zeros_like(U)
    Unew = Unew.at[:, :, :kp].set(
        jnp.einsum("bnm,bmk->bnk", U, Y, precision=_HIGH)
    )
    return Unew, Snew


def _select_host(re, im, valid, resid_est, dead, which, k, kp):
    """Per-lane greedy group selection on host: order eigenvalue GROUPS
    (conjugate pairs whole) by the `which` key, fill up to kp slots.
    Returns slot arrays (idx, use_im, slot_valid) for ``_contract`` plus
    the ordered output slots for the final extraction."""
    B, m = re.shape
    mag = np.hypot(re, im)
    if which == "LM":
        key = mag
    elif which == "SM":
        key = -mag
    elif which == "LR":
        key = re
    elif which == "SR":
        key = -re
    else:  # pragma: no cover
        raise ValueError(f"which={which!r} not in LM/SM/LR/SR")
    # Ritz columns supported on dead (decoupled zero) slots are
    # artifacts of an unfillable restart slot — never select them.
    key = np.where(valid & ~dead, key, -np.inf)

    idx = np.zeros((B, kp), np.int32)
    use_im = np.zeros((B, kp), bool)
    slot_valid = np.zeros((B, kp), bool)
    for b in range(B):
        groups = []
        j = 0
        while j < m:
            if im[b, j] != 0 and j + 1 < m and im[b, j + 1] != 0:
                groups.append((key[b, j], j, True))
                j += 2
            else:
                groups.append((key[b, j], j, False))
                j += 1
        groups.sort(key=lambda g: -g[0])
        s = 0
        for gkey, j, is_pair in groups:
            if not np.isfinite(gkey):
                continue
            need = 2 if is_pair else 1
            if s + need > kp:
                continue  # try a smaller group for the tail slot
            idx[b, s] = j
            use_im[b, s] = False
            slot_valid[b, s] = True
            if is_pair:
                idx[b, s + 1] = j
                use_im[b, s + 1] = True
                slot_valid[b, s + 1] = True
            s += need
            if s == kp:
                break
    return idx, use_im, slot_valid


def eigs_arnoldi_matvec(
    matvec: Callable[[jax.Array], jax.Array],
    v0: jax.Array,
    k: int,
    which: str = "LM",
    m: Optional[int] = None,
    tol: Optional[float] = None,
    max_restarts: int = 30,
) -> ArnoldiEigs:
    """k exterior eigenpairs of the batched linear operator ``matvec``
    (``[B, n] → [B, n]``), matrix-free, via Krylov–Schur restarts.

    ``v0 [B, n]`` seeds the Krylov space (and fixes B, n).  ``m`` is
    the basis size (default ``max(2k+2, 16)``, clamped to n); must
    satisfy ``m ≥ k+2``.  ``which`` ∈ LM/SM/LR/SR orders Ritz values by
    magnitude / real part (SM converges slowly without shift-invert —
    prefer composing a solve into ``matvec``).
    """
    B, n = v0.shape
    dtype = jnp.result_type(v0.dtype, jnp.float32)
    if m is None:
        m = max(2 * k + 2, 16)
    m = min(m, n)
    if m < k + 2:
        raise ValueError(
            f"basis m={m} must be ≥ k+2={k + 2} (n too small? "
            "use the dense ops.schur path)"
        )
    kp = k + 1
    if tol is None:
        tol = 200.0 * float(jnp.finfo(dtype).eps)

    from .schur import eig_batched

    expand = _make_expand(matvec, m)
    key = jax.random.PRNGKey(7)

    v0 = v0.astype(dtype)
    unext = v0 / jnp.maximum(
        jnp.sqrt(jnp.sum(v0 * v0, axis=1)), 1e-30
    )[:, None]
    U = jnp.zeros((B, n, m), dtype)
    S = jnp.zeros((B, m, m), dtype)
    j0 = jnp.zeros((), jnp.int32)
    dead = np.zeros((B, m), bool)

    restarts_used = max_restarts
    for it in range(max_restarts):
        U, S, unext, beta = expand(U, S, unext, j0, key)
        eig = eig_batched(S)
        re = np.asarray(eig.real)
        im = np.asarray(eig.imag)
        valid = np.asarray(eig.valid)
        ylast = np.sqrt(
            np.asarray(eig.vectors_real)[:, m - 1, :] ** 2
            + np.asarray(eig.vectors_imag)[:, m - 1, :] ** 2
        )
        resid_est = np.asarray(beta)[:, None] * ylast
        # Ritz columns living on dead (zero) slots: eigvec mass there.
        if dead.any():
            mass = (
                np.asarray(eig.vectors_real) ** 2
                + np.asarray(eig.vectors_imag) ** 2
            )
            dead_ritz = (mass * dead[:, :, None]).sum(axis=1) > 0.5
        else:
            dead_ritz = np.zeros((B, m), bool)
        idx, use_im, slot_valid = _select_host(
            re, im, valid, resid_est, dead_ritz, which, k, kp
        )
        scale = np.maximum(
            np.abs(np.take_along_axis(np.hypot(re, im), idx, axis=1))
            .max(axis=1),
            1e-30,
        )
        sel_resid = np.take_along_axis(resid_est, idx, axis=1)
        done = (
            (sel_resid <= tol * scale[:, None]) | ~slot_valid
        ).all()
        if done or it == max_restarts - 1:
            restarts_used = it + 1
            break
        U, S = _contract(
            U, S, eig.vectors_real, eig.vectors_imag,
            jnp.asarray(idx), jnp.asarray(use_im),
            jnp.asarray(slot_valid, dtype), beta,
        )
        unext = unext  # still orthonormal to span(U·Y)
        j0 = jnp.asarray(kp, jnp.int32)
        dead = np.zeros((B, m), bool)
        dead[:, :kp] = ~slot_valid
        key = jax.random.fold_in(key, it)

    # ---- final extraction: first k slots, TRUE residuals by matvec --
    idx_k = jnp.asarray(idx[:, :k])
    use_im_k = jnp.asarray(use_im[:, :k])
    out = _extract(
        U, matvec, eig.vectors_real, eig.vectors_imag,
        jnp.asarray(re), jnp.asarray(im), idx_k, use_im_k,
    )
    Xre, Xim, lam_re, lam_im, resid = out
    scale_j = jnp.maximum(
        jnp.max(jnp.hypot(lam_re, lam_im), axis=1), 1e-30
    )
    conv = (resid <= tol * scale_j[:, None]) & jnp.asarray(
        slot_valid[:, :k]
    )
    return ArnoldiEigs(
        real=lam_re, imag=lam_im,
        vectors_real=Xre, vectors_imag=Xim,
        resid=resid / scale_j[:, None], converged=conv,
        restarts=restarts_used,
    )


@f32_matmuls
def _extract(U, matvec, Yre, Yim, re, im, idx, use_im):
    """Ritz vectors X = U·y for the selected slots (complex pairs: the
    +imag member carries (re, im); its slot partner the conjugate), and
    true residuals ‖Ax − λx‖ from one batched matvec per part."""
    yre = jnp.take_along_axis(Yre, idx[:, None, :], axis=2)
    yim = jnp.take_along_axis(Yim, idx[:, None, :], axis=2)
    # A slot marked use_im is the conjugate member: eigvec conj(v).
    yim = jnp.where(use_im[:, None, :], -yim, yim)
    lam_re = jnp.take_along_axis(re, idx, axis=1)
    lam_im0 = jnp.take_along_axis(im, idx, axis=1)
    lam_im = jnp.where(use_im, -jnp.abs(lam_im0), jnp.abs(lam_im0))
    Xre = jnp.einsum("bnm,bmk->bnk", U, yre, precision=_HIGH)
    Xim = jnp.einsum("bnm,bmk->bnk", U, yim, precision=_HIGH)
    nrm = jnp.sqrt(jnp.sum(Xre * Xre + Xim * Xim, axis=1))
    nrm = jnp.maximum(nrm, 1e-30)[:, None, :]
    Xre, Xim = Xre / nrm, Xim / nrm
    k = idx.shape[1]
    Are = jnp.stack(
        [matvec(Xre[:, :, j]) for j in range(k)], axis=2
    )
    Aim = jnp.stack(
        [matvec(Xim[:, :, j]) for j in range(k)], axis=2
    )
    lr = lam_re[:, None, :]
    li = lam_im[:, None, :]
    res_re = Are - (lr * Xre - li * Xim)
    res_im = Aim - (lr * Xim + li * Xre)
    resid = jnp.sqrt(
        jnp.sum(res_re * res_re + res_im * res_im, axis=1)
    )
    return Xre, Xim, lam_re, lam_im, resid


def eigs_arnoldi_batched(
    a: jax.Array,
    k: int,
    which: str = "LM",
    m: Optional[int] = None,
    tol: Optional[float] = None,
    max_restarts: int = 30,
    v0: Optional[jax.Array] = None,
) -> ArnoldiEigs:
    """Dense-matrix convenience wrapper: ``matvec = a @ v`` (batched
    GEMV), deterministic seed vector when ``v0`` is omitted."""
    B, n, _ = a.shape

    def matvec(v):
        return jnp.einsum("bij,bj->bi", a, v, precision=_HIGH)

    if v0 is None:
        v0 = jax.random.normal(
            jax.random.PRNGKey(0), (B, n),
            jnp.result_type(a.dtype, jnp.float32),
        )
    return eigs_arnoldi_matvec(
        matvec, v0, k, which=which, m=m, tol=tol,
        max_restarts=max_restarts,
    )


def eigs_arnoldi_shifted_batched(
    a: jax.Array,
    k: int,
    sigma: float,
    m: Optional[int] = None,
    tol: Optional[float] = None,
    max_restarts: int = 30,
    v0: Optional[jax.Array] = None,
) -> ArnoldiEigs:
    """The ``k`` eigenvalues of ``a`` CLOSEST to the shift ``σ``
    (interior eigenvalues), by shift-invert Arnoldi: one LU of
    ``A − σI`` per batch, then Krylov–Schur on ``(A − σI)⁻¹`` whose
    LM Ritz values ``μ`` map back through ``λ = σ + 1/μ`` with the
    same eigenvectors.  This is THE convergence fix for interior /
    smallest-magnitude targets (plain Arnoldi ``which="SM"`` stalls).

    ``resid``/``converged`` are recomputed against A itself (not the
    transformed operator) — honest flags for the reported pairs.
    """
    from .lu import lu_factor_batched, lu_solve_batched

    B, n, _ = a.shape
    dtype = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(dtype)
    shifted = a - jnp.asarray(sigma, dtype) * jnp.eye(n, dtype=dtype)
    fac = lu_factor_batched(shifted)

    def matvec(v):
        return lu_solve_batched(fac, v)

    if v0 is None:
        v0 = jax.random.normal(jax.random.PRNGKey(0), (B, n), dtype)
    res = eigs_arnoldi_matvec(
        matvec, v0, k, which="LM", m=m, tol=tol,
        max_restarts=max_restarts,
    )
    if tol is None:
        tol = 200.0 * float(jnp.finfo(dtype).eps)
    mu_re, mu_im = res.real, res.imag
    mu2 = jnp.maximum(mu_re * mu_re + mu_im * mu_im, 1e-38)
    lam_re = sigma + mu_re / mu2
    lam_im = -mu_im / mu2
    # True residuals against A (the returned ones were for (A−σI)⁻¹).
    with jax.default_matmul_precision("float32"):
        Ar = jnp.einsum(
            "bij,bjk->bik", a, res.vectors_real, precision=_HIGH
        )
        Ai = jnp.einsum(
            "bij,bjk->bik", a, res.vectors_imag, precision=_HIGH
        )
    lr, li = lam_re[:, None, :], lam_im[:, None, :]
    rr = Ar - (lr * res.vectors_real - li * res.vectors_imag)
    ri = Ai - (lr * res.vectors_imag + li * res.vectors_real)
    resid = jnp.sqrt(jnp.sum(rr * rr + ri * ri, axis=1))
    scale = jnp.maximum(
        jnp.max(jnp.abs(a), axis=(1, 2)), 1e-30
    )[:, None]
    ok_lane = fac.ok[:, None]
    return ArnoldiEigs(
        real=lam_re, imag=lam_im,
        vectors_real=res.vectors_real,
        vectors_imag=res.vectors_imag,
        resid=resid / scale,
        converged=(resid <= tol * scale * n) & ok_lane,
        restarts=res.restarts,
    )
