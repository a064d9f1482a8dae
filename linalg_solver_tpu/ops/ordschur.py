"""Ordered Schur forms: rsf2csf + batched eigenvalue reordering.

The LAPACK analogue is ``dtrexc``/``dtrsen`` (MATLAB ``ordschur``,
scipy's ``schur(sort=...)``): given a Schur decomposition
``A = Q T Qᴴ``, apply unitary similarities that move a selected set of
eigenvalues to the top-left of ``T``, so the leading columns of ``Q``
span the corresponding invariant subspace.  The reference has no
counterpart (its spectral path is symbolic, reference
linalg.py:424-480) — this is part of the production spectral family
built around ``ops.schur``.

TPU-first design
----------------
LAPACK reorders by bubbling ONE eigenvalue at a time with data-dependent
2×2/2×2 real block swaps (dlaexc) — a serial, branch-heavy loop.  Here:

1. ``rsf2csf_batched`` converts the real quasi-triangular form to a
   COMPLEX upper-triangular form (scipy ``rsf2csf``): every 2×2
   complex-pair block is diagonalized-at-the-top by one complex 2×2
   unitary; all blocks rotate in ONE similarity (disjoint supports).
   In the complex form every diagonal entry is an eigenvalue and every
   adjacent swap is one complex Givens rotation — no case analysis.
2. The reorder is an **odd–even transposition sort** on the diagonal:
   sweep ``s`` rotates ALL disjoint adjacent pairs of parity ``s % 2``
   whose keys compare out of order, simultaneously, as masked
   shifted-array row/column mixes (O(n²) VPU work per sweep, O(n³)
   total — the same complexity class as LAPACK's worst case, with no
   sequential per-swap dependency inside a sweep and the whole batch in
   lockstep).  The comparator is strict, so the sort is stable and
   conjugate pairs (equal keys) keep their relative order.

Swapping adjacent eigenvalues ``λ₁, λ₂`` with coupling ``t``: the
eigenvector of ``[[λ₁, t], [0, λ₂]]`` for ``λ₂`` is ``v = [t, λ₂−λ₁]``;
the unitary ``U = [v/‖v‖, v⊥/‖v‖]`` gives ``Uᴴ [[λ₁,t],[0,λ₂]] U =
[[λ₂, t'], [0, λ₁]]`` with ``|t'| = |t|`` (the swap is perfectly
stable — unlike eigenvector-based reordering there is no
ill-conditioning: this is why trexc exists).  ``v = 0`` (equal
eigenvalues, zero coupling) makes the swap a no-op on ``T``; the key
vectors still swap so the partition bookkeeping stays exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.precision import f32_matmuls
from .schur import (
    SchurVectors,
    _standardize_real_blocks,
    _tridiag_parts,
    real_schur_vectors,
)

_HIGH = jax.lax.Precision.HIGHEST


class ComplexSchur(NamedTuple):
    """Complex Schur form ``A = Q T Qᴴ`` on (re, im) pairs: ``T`` upper
    triangular with the eigenvalues on the diagonal, ``Q`` unitary."""

    t_re: jax.Array  # [B, n, n]
    t_im: jax.Array
    q_re: jax.Array
    q_im: jax.Array


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cmatmul(ar, ai, br, bi):
    f = lambda x, y: jnp.einsum("bij,bjk->bik", x, y, precision=_HIGH)
    return f(ar, br) - f(ai, bi), f(ar, bi) + f(ai, br)


@jax.jit
@f32_matmuls
def rsf2csf_batched(T: jax.Array, Q: jax.Array) -> ComplexSchur:
    """Real quasi-triangular Schur form → complex upper-triangular
    Schur form (scipy ``rsf2csf``), batched.

    Real-eigenvalue 2×2 blocks are split orthogonally first
    (dlanv2-style); each remaining complex-pair block ``[[a,b],[c,d]]``
    (eigenvalues ``μ ± iν``) is rotated by the complex unitary built
    from its unit eigenvector ``[ (a−d)/2 + iν, c ] / ‖·‖`` — putting
    ``μ + iν`` first, its conjugate second (scipy's convention up to
    block-local phase).  All blocks are disjoint, so one global
    similarity applies every rotation at once.
    """
    T, Q = _standardize_real_blocks(T, Q)
    B, n, _ = T.shape
    dtype = T.dtype
    idx = jnp.arange(n)

    diag, sub, sup = _tridiag_parts(T)
    sub_prev = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), sub[:, :-1]], axis=1
    )
    a = diag
    d = jnp.concatenate([diag[:, 1:], jnp.zeros((B, 1), dtype)], axis=1)
    c = sub
    half = (a - d) / 2
    disc = half * half + sup * c
    top = (sub != 0) & (sub_prev == 0) & (disc < 0)     # [B, n]
    nu = jnp.sqrt(jnp.maximum(-disc, 0.0))
    mu = (a + d) / 2

    # Unit eigenvector v = [half + i·nu, c] of the block for mu + i·nu.
    nrm = jnp.sqrt(half * half + nu * nu + c * c)
    nrm = jnp.where(nrm > 0, nrm, 1.0)
    u0r, u0i = half / nrm, nu / nrm
    u1 = c / nrm                                        # real

    topf = top.astype(dtype)
    bot = jnp.concatenate([jnp.zeros((B, 1), bool), top[:, :-1]], axis=1)
    eye_m = (idx[:, None] == idx[None, :]).astype(dtype)[None]
    up_m = (idx[:, None] + 1 == idx[None, :]).astype(dtype)[None]
    lo_m = (idx[:, None] == idx[None, :] + 1).astype(dtype)[None]
    # G = I except per block: [[u0, -u1], [u1, conj(u0)]].
    dvec_r = jnp.where(top, u0r, 1.0)
    dvec_i = jnp.where(top, u0i, 0.0)
    dvec_r = jnp.where(bot, jnp.roll(u0r, 1, axis=1), dvec_r)
    dvec_i = jnp.where(bot, -jnp.roll(u0i, 1, axis=1), dvec_i)
    off = jnp.where(top, u1, 0.0)
    g_re = (
        eye_m * dvec_r[:, :, None]
        - up_m * off[:, :, None]
        + lo_m * off[:, None, :]
    )
    g_im = eye_m * dvec_i[:, :, None]

    # T_c = Gᴴ T G  (T real), Q_c = Q G (Q real).
    ht_re = jnp.einsum("bji,bjk->bik", g_re, T, precision=_HIGH)
    ht_im = -jnp.einsum("bji,bjk->bik", g_im, T, precision=_HIGH)
    t_re, t_im = _cmatmul(ht_re, ht_im, g_re, g_im)
    q_re = jnp.einsum("bij,bjk->bik", Q, g_re, precision=_HIGH)
    q_im = jnp.einsum("bij,bjk->bik", Q, g_im, precision=_HIGH)

    # Force exact structure: strictly-lower zero, block diagonals exact.
    tril = jnp.tril(jnp.ones((n, n), bool), -1)[None]
    t_re = jnp.where(tril, 0.0, t_re)
    t_im = jnp.where(tril, 0.0, t_im)
    w_re = jnp.where(top | bot, jnp.where(top, mu, jnp.roll(mu, 1, 1)),
                     diag)
    w_im = jnp.where(top, nu, jnp.where(bot, -jnp.roll(nu, 1, 1), 0.0))
    diag_m = eye_m > 0
    t_re = jnp.where(diag_m, w_re[:, :, None] * eye_m, t_re)
    t_im = jnp.where(diag_m, w_im[:, :, None] * eye_m, t_im)
    return ComplexSchur(t_re, t_im, q_re, q_im)


def _shift_up(x, axis=1):
    """x'[i] = x[i+1], zero-padded at the end (along ``axis``)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(1, None)
    return jnp.pad(x[tuple(sl)], pad)


def _shift_down(x, axis=1):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, -1)
    return jnp.pad(x[tuple(sl)], pad)


def _reorder_sweeps(t_re, t_im, q_re, q_im, keys, aux, sweeps: int):
    """Odd–even transposition sort of the complex-Schur diagonal by
    descending ``keys`` (strict comparator → stable).  ``aux`` is a dict
    of per-position vectors permuted alongside (eigenvalues, select
    flags).  Returns the reordered form, keys, and aux."""
    B, n, _ = t_re.shape
    dtype = t_re.dtype
    idx = jnp.arange(n)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny * 1e4, dtype)

    aux_names = sorted(aux)
    aux_vals = [aux[k] for k in aux_names]

    def sweep(s, carry):
        t_re, t_im, q_re, q_im, keys, *aux_vals = carry
        parity = s % 2
        pair_top = ((idx % 2) == parity) & (idx < n - 1)   # [n]

        lam_re = jnp.diagonal(t_re, axis1=1, axis2=2)
        lam_im = jnp.diagonal(t_im, axis1=1, axis2=2)
        lam2_re = _shift_up(lam_re)
        lam2_im = _shift_up(lam_im)
        t12_re = jnp.concatenate(
            [jnp.diagonal(t_re, offset=1, axis1=1, axis2=2),
             jnp.zeros((B, 1), dtype)], axis=1)
        t12_im = jnp.concatenate(
            [jnp.diagonal(t_im, offset=1, axis1=1, axis2=2),
             jnp.zeros((B, 1), dtype)], axis=1)

        want = pair_top[None, :] & (keys < _shift_up(keys))  # [B, n]
        wantf = want.astype(dtype)

        # v = [t12, λ₂ − λ₁]; U = [v, v⊥]/‖v‖ (v = 0 → U = I).
        d_re = lam2_re - lam_re
        d_im = lam2_im - lam_im
        nrm2 = t12_re**2 + t12_im**2 + d_re**2 + d_im**2
        ok_v = nrm2 > tiny
        nrm = jnp.sqrt(jnp.where(ok_v, nrm2, 1.0))
        do = wantf * ok_v.astype(dtype)                    # rotate mask
        u0r = jnp.where(do > 0, t12_re / nrm, 1.0)
        u0i = jnp.where(do > 0, t12_im / nrm, 0.0)
        u1r = jnp.where(do > 0, d_re / nrm, 0.0)
        u1i = jnp.where(do > 0, d_im / nrm, 0.0)

        topm = (pair_top[None, :] * jnp.ones((B, 1), dtype))  # [B, n]
        botm = _shift_down(topm)

        # Row mix M ← Uᴴ M:
        #   row_i    = conj(u0)·M_i − ... actually  conj(u0)·M_i + conj(u1)·M_{i+1}
        #   row_{i+1} = −u1·M_i + u0·M_{i+1}
        def rowmix(m_re, m_im):
            up_re, up_im = _shift_up(m_re), _shift_up(m_im)
            dn_re, dn_im = _shift_down(m_re), _shift_down(m_im)
            a_re, a_im = _cmul(u0r[:, :, None], -u0i[:, :, None],
                               m_re, m_im)
            b_re, b_im = _cmul(u1r[:, :, None], -u1i[:, :, None],
                               up_re, up_im)
            top_re, top_im = a_re + b_re, a_im + b_im
            u0r_s, u0i_s = _shift_down(u0r), _shift_down(u0i)
            u1r_s, u1i_s = _shift_down(u1r), _shift_down(u1i)
            c_re, c_im = _cmul(-u1r_s[:, :, None], -u1i_s[:, :, None],
                               dn_re, dn_im)
            d2_re, d2_im = _cmul(u0r_s[:, :, None], u0i_s[:, :, None],
                                 m_re, m_im)
            bot_re, bot_im = c_re + d2_re, c_im + d2_im
            tm = topm[:, :, None]
            bm = botm[:, :, None]
            new_re = tm * top_re + bm * bot_re + (1 - tm - bm) * m_re
            new_im = tm * top_im + bm * bot_im + (1 - tm - bm) * m_im
            return new_re, new_im

        # Col mix M ← M U:
        #   col_i    = u0·M_{:,i} + u1·M_{:,i+1}
        #   col_{i+1} = −conj(u1)·M_{:,i} + conj(u0)·M_{:,i+1}
        def colmix(m_re, m_im):
            up_re = _shift_up(m_re, 2)
            up_im = _shift_up(m_im, 2)
            dn_re = _shift_down(m_re, 2)
            dn_im = _shift_down(m_im, 2)
            a_re, a_im = _cmul(u0r[:, None, :], u0i[:, None, :],
                               m_re, m_im)
            b_re, b_im = _cmul(u1r[:, None, :], u1i[:, None, :],
                               up_re, up_im)
            top_re, top_im = a_re + b_re, a_im + b_im
            u0r_s, u0i_s = _shift_down(u0r), _shift_down(u0i)
            u1r_s, u1i_s = _shift_down(u1r), _shift_down(u1i)
            c_re, c_im = _cmul(-u1r_s[:, None, :], u1i_s[:, None, :],
                               dn_re, dn_im)
            d2_re, d2_im = _cmul(u0r_s[:, None, :], -u0i_s[:, None, :],
                                 m_re, m_im)
            bot_re, bot_im = c_re + d2_re, c_im + d2_im
            tm = topm[:, None, :]
            bm = botm[:, None, :]
            new_re = tm * top_re + bm * bot_re + (1 - tm - bm) * m_re
            new_im = tm * top_im + bm * bot_im + (1 - tm - bm) * m_im
            return new_re, new_im

        # Rotations are masked by `do`, but the permutation bookkeeping
        # (keys, eigenvalues, aux) swaps by `want`: a v=0 pair (equal
        # eigenvalues, zero coupling) swaps trivially.
        t_re, t_im = rowmix(t_re, t_im)
        t_re, t_im = colmix(t_re, t_im)
        q_re, q_im = colmix(q_re, q_im)

        def vswap(x):
            xf = x.astype(dtype)
            sw = (want.astype(dtype) * _shift_up(xf)
                  + (1 - want.astype(dtype)) * xf)
            swb = _shift_down(want.astype(dtype))
            out = swb * _shift_down(xf) + (1 - swb) * sw
            return out.astype(x.dtype) if x.dtype != dtype else out

        keys = vswap(keys)
        aux_vals = [vswap(v) for v in aux_vals]
        new_lam_re = vswap(lam_re)
        new_lam_im = vswap(lam_im)

        # Force exact structure: triangular + exact swapped diagonal.
        tril = jnp.tril(jnp.ones((n, n), bool), -1)[None]
        t_re = jnp.where(tril, 0.0, t_re)
        t_im = jnp.where(tril, 0.0, t_im)
        eye_m = jnp.eye(n, dtype=dtype)[None]
        t_re = jnp.where(eye_m > 0, new_lam_re[:, :, None] * eye_m, t_re)
        t_im = jnp.where(eye_m > 0, new_lam_im[:, :, None] * eye_m, t_im)
        return (t_re, t_im, q_re, q_im, keys, *aux_vals)

    carry = (t_re, t_im, q_re, q_im, keys, *aux_vals)
    carry = lax.fori_loop(0, sweeps, sweep, carry)
    t_re, t_im, q_re, q_im, keys, *aux_vals = carry
    return t_re, t_im, q_re, q_im, keys, dict(zip(aux_names, aux_vals))


class OrderedSchur(NamedTuple):
    """Reordered COMPLEX Schur form of a real matrix batch (on (re, im)
    pairs): ``A = Q T Qᴴ`` with the selected (or key-sorted)
    eigenvalues leading.  ``m`` counts selected eigenvalues per lane
    (``n`` in sort mode); the first ``m`` columns of ``Q`` span the
    corresponding invariant subspace."""

    t_re: jax.Array   # [B, n, n]
    t_im: jax.Array
    q_re: jax.Array
    q_im: jax.Array
    w_re: jax.Array   # [B, n] reordered eigenvalues (= diag T)
    w_im: jax.Array
    m: jax.Array      # [B] i32


@functools.partial(jax.jit, static_argnames=("sweeps",))
@f32_matmuls
def schur_reorder_batched(
    T: jax.Array, Q: jax.Array, select: jax.Array, sweeps: int = 0
) -> OrderedSchur:
    """MATLAB-``ordschur`` analogue: given a REAL Schur pair ``(T, Q)``
    (quasi-triangular, e.g. from :func:`ops.schur.real_schur_vectors`)
    and a per-diagonal-position boolean ``select`` [B, n], return a
    COMPLEX Schur form with the selected eigenvalues moved to the
    top-left.  ``select`` is symmetrized over 2×2 conjugate-pair blocks
    (a pair is selected if either position is) — conjugate pairs cannot
    be split by a real-coefficient invariant subspace."""
    B, n, _ = T.shape
    # Symmetrize select over complex-pair blocks BEFORE conversion
    # (pairs are adjacent in the quasi-triangular form).
    diag, sub, _ = _tridiag_parts(T)
    sub_prev = jnp.concatenate(
        [jnp.zeros((B, 1), T.dtype), sub[:, :-1]], axis=1
    )
    pair_top = (sub != 0) & (sub_prev == 0)
    sel = select.astype(bool)
    sel_up = jnp.concatenate([sel[:, 1:], jnp.zeros((B, 1), bool)], 1)
    sel = jnp.where(pair_top, sel | sel_up, sel)
    pair_bot = jnp.concatenate(
        [jnp.zeros((B, 1), bool), pair_top[:, :-1]], axis=1
    )
    sel = jnp.where(pair_bot, jnp.roll(sel, 1, axis=1), sel)

    cs = rsf2csf_batched(T, Q)
    keys = sel.astype(T.dtype)
    t_re, t_im, q_re, q_im, keys, _ = _reorder_sweeps(
        cs.t_re, cs.t_im, cs.q_re, cs.q_im, keys, {},
        sweeps if sweeps else n,
    )
    w_re = jnp.diagonal(t_re, axis1=1, axis2=2)
    w_im = jnp.diagonal(t_im, axis1=1, axis2=2)
    m = jnp.sum(sel, axis=1).astype(jnp.int32)
    return OrderedSchur(t_re, t_im, q_re, q_im, w_re, w_im, m)


_SORT_KEYS = ("abs_desc", "abs_asc", "real_desc", "real_asc")


@functools.partial(jax.jit, static_argnames=("key", "sweeps"))
@f32_matmuls
def schur_sort_batched(
    T: jax.Array, Q: jax.Array, key: str = "abs_desc", sweeps: int = 0
) -> OrderedSchur:
    """Sort the Schur diagonal by an eigenvalue key: ``abs_desc`` /
    ``abs_asc`` (|λ|), ``real_desc`` / ``real_asc`` (Re λ).  The sort is
    stable, so conjugate pairs (identical keys) stay adjacent with the
    ``+iν`` member first."""
    if key not in _SORT_KEYS:
        raise ValueError(f"key must be one of {_SORT_KEYS}")
    B, n, _ = T.shape
    cs = rsf2csf_batched(T, Q)
    w_re = jnp.diagonal(cs.t_re, axis1=1, axis2=2)
    w_im = jnp.diagonal(cs.t_im, axis1=1, axis2=2)
    if key.startswith("abs"):
        k = jnp.sqrt(w_re * w_re + w_im * w_im)
    else:
        k = w_re
    if key.endswith("asc"):
        k = -k
    t_re, t_im, q_re, q_im, _, _ = _reorder_sweeps(
        cs.t_re, cs.t_im, cs.q_re, cs.q_im, k, {}, sweeps if sweeps else n
    )
    return OrderedSchur(
        t_re, t_im, q_re, q_im,
        jnp.diagonal(t_re, axis1=1, axis2=2),
        jnp.diagonal(t_im, axis1=1, axis2=2),
        jnp.full((B,), n, jnp.int32),
    )


class InvariantSubspace(NamedTuple):
    """Real orthonormal basis of the invariant subspace for a selected,
    conjugation-closed eigenvalue set: the first ``m[b]`` columns of
    ``v[b]`` (the rest exactly zero).  ``w_re/w_im`` are ALL
    eigenvalues, reordered selected-first; ``resid`` is the per-lane
    relative invariance defect ``‖A V − V (VᵀA V)‖_F / ‖A‖_F``."""

    v: jax.Array       # [B, n, n]
    m: jax.Array       # [B] i32
    w_re: jax.Array    # [B, n]
    w_im: jax.Array
    resid: jax.Array   # [B]
    ok: jax.Array      # [B]
    converged: jax.Array  # [B] eigensolver flag


def invariant_subspace_batched(
    a: jax.Array, select_fn, max_sweeps: int = 0, chunk: int = 64,
    balance: bool = True, tol: float = 1e-3,
) -> InvariantSubspace:
    """Orthonormal basis of the invariant subspace of each ``A`` in the
    batch spanned by the eigenvalues picked by ``select_fn(w_re, w_im)
    -> bool [B, n]`` (e.g. ``lambda re, im: re < 0`` for the stable
    subspace).  The selection must be closed under conjugation
    (``select_fn`` sees exact conjugate pairs, so any function of
    ``(re, |im|)`` is safe); pairs are symmetrized defensively.

    Pipeline: :func:`ops.schur.real_schur_vectors` → complex reorder →
    un-balance the leading columns → real span = orthonormalized
    ``[Re | Im]`` of the leading complex columns (rank-revealing: the
    2m candidate vectors span exactly m real dimensions for a
    conjugation-closed set).  Cross-checked by the returned invariance
    residual."""
    sv: SchurVectors = real_schur_vectors(
        a, max_sweeps=max_sweeps, chunk=chunk, balance=balance
    )
    return _invariant_subspace_from_schur(a, sv, select_fn, tol)


@functools.partial(jax.jit, static_argnames=("select_fn", "tol"))
@f32_matmuls
def _invariant_subspace_from_schur(a, sv, select_fn, tol):
    from .orth import orthonormal_columns
    from .spd import pivoted_cholesky_batched

    B, n, _ = a.shape
    dtype = sv.T.dtype
    cs = rsf2csf_batched(sv.T, sv.Q)
    w_re = jnp.diagonal(cs.t_re, axis1=1, axis2=2)
    w_im = jnp.diagonal(cs.t_im, axis1=1, axis2=2)
    sel = jnp.asarray(select_fn(w_re, w_im), bool)
    # Defensive conjugate closure: a pair is (λ at i, λ̄ at i+1).
    pair = (w_im != 0) & (w_im == -jnp.roll(w_im, -1, axis=1)) \
        & (w_re == jnp.roll(w_re, -1, axis=1))
    sel_up = jnp.concatenate([sel[:, 1:], jnp.zeros((B, 1), bool)], 1)
    sel = jnp.where(pair, sel | sel_up, sel)
    pair_bot = jnp.concatenate(
        [jnp.zeros((B, 1), bool), pair[:, :-1]], axis=1
    )
    sel = jnp.where(pair_bot, jnp.roll(sel, 1, axis=1), sel)

    keys = sel.astype(dtype)
    t_re, t_im, q_re, q_im, keys, _ = _reorder_sweeps(
        cs.t_re, cs.t_im, cs.q_re, cs.q_im, keys, {}, n
    )
    m = jnp.sum(sel, axis=1).astype(jnp.int32)
    colmask = jnp.arange(n)[None, :] < m[:, None]      # [B, n]

    # Un-balance: Schur is of D A D⁻¹, so invariant columns of A are
    # D⁻¹ · q (span preserved; orthonormality restored below).
    inv_s = (1.0 / sv.scale)[:, :, None]
    qs_re = q_re * inv_s * colmask[:, None, :]
    qs_im = q_im * inv_s * colmask[:, None, :]

    # Real span: [Re | Im] has real rank exactly m for a
    # conjugation-closed selection — pick m independent columns by
    # pivoted Cholesky on the Gram matrix, then orthonormalize.
    X = jnp.concatenate([qs_re, qs_im], axis=2)        # [B, n, 2n]
    gram = jnp.einsum("bji,bjk->bik", X, X, precision=_HIGH)
    pc = pivoted_cholesky_batched(gram)
    # One-hot select of the first-m pivot columns of X.
    order = pc.piv                                      # [B, 2n]
    keep = jnp.arange(2 * n)[None, :] < m[:, None]      # first m pivots
    oh = (
        (order[:, :, None] == jnp.arange(2 * n)[None, None, :])
        & keep[:, :, None]
    ).astype(dtype)                                    # [B, 2n(slot), 2n(col)]
    cand = jnp.einsum("bic,bsc->bis", X, oh, precision=_HIGH)[:, :, :n]
    gmask = (jnp.arange(n)[None, :] < m[:, None])
    V, _ = orthonormal_columns(cand, gmask)

    # Invariance defect: R = A V − V (Vᵀ A V) on the masked columns.
    AV = jnp.einsum("bij,bjk->bik", a.astype(dtype), V, precision=_HIGH)
    H = jnp.einsum("bji,bjk->bik", V, AV, precision=_HIGH)
    Hm = H * gmask[:, :, None] * gmask[:, None, :]
    R = (AV - jnp.einsum("bij,bjk->bik", V, Hm, precision=_HIGH)) \
        * gmask[:, None, :]
    anorm = jnp.sqrt(jnp.sum(a.astype(dtype) ** 2, axis=(1, 2)))
    resid = jnp.sqrt(jnp.sum(R * R, axis=(1, 2))) \
        / jnp.maximum(anorm, jnp.finfo(dtype).tiny)
    ok = (resid < tol) & sv.converged
    return InvariantSubspace(
        V, m, jnp.diagonal(t_re, axis1=1, axis2=2),
        jnp.diagonal(t_im, axis1=1, axis2=2), resid, ok, sv.converged,
    )


# ---------------------------------------------------------------------------
# Cluster condition numbers (dtrsen's s and sep)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("adjoint",))
@f32_matmuls
def _trsyl_masked(t_re, t_im, m, c_re, c_im, adjoint: bool = False):
    """Solve the triangular Sylvester equation in GLOBAL coordinates of
    one reordered complex Schur form ``T``: with ``T11 = T[:m, :m]``,
    ``T22 = T[m:, m:]`` (``m`` per lane, masked — no dynamic shapes),

        T11 X − X T22 = C          (adjoint=False)
        T11ᴴ X − X T22ᴴ = C        (adjoint=True)

    for ``X`` supported on rows ``< m`` × columns ``≥ m`` (``C`` is read
    only there).  This is the ztrsyl kernel both dtrsen quantities need.

    Structure: ``X[i, j]`` depends on rows below (T11 back-substitution)
    and columns left (T22 coupling) — a row scan with an inner column
    scan (n² sequential steps of O(n) vector work, O(n³) total; the
    heavy per-row sum is one masked GEMV).  The adjoint case mirrors
    both directions (T11ᴴ is lower triangular) and conjugates.
    Near-singular denominators (eigenvalue shared between the clusters)
    are floored at ``eps·‖T‖`` LAPACK-style and flagged.
    """
    B, n, _ = t_re.shape
    dtype = t_re.dtype
    idx = jnp.arange(n)
    sel_row = (idx[None, :] < m[:, None]).astype(dtype)      # [B, n]
    unsel_col = (idx[None, :] >= m[:, None]).astype(dtype)
    diag_re = jnp.diagonal(t_re, axis1=1, axis2=2)
    diag_im = jnp.diagonal(t_im, axis1=1, axis2=2)
    if adjoint:
        diag_im = -diag_im
    smin = jnp.finfo(dtype).eps * jnp.maximum(
        jnp.max(jnp.abs(t_re) + jnp.abs(t_im), axis=(1, 2)), 1.0
    )

    def outer(carry, t):
        X_re, X_im, pert = carry
        i = t if adjoint else n - 1 - t
        if adjoint:
            # column i of T, conjugated: (T11ᴴ X)_{i·} couples i' < i.
            trow_re = lax.dynamic_slice(
                t_re, (0, 0, i), (B, n, 1))[:, :, 0]
            trow_im = -lax.dynamic_slice(
                t_im, (0, 0, i), (B, n, 1))[:, :, 0]
            done = (idx[None, :] < i).astype(dtype)
        else:
            trow_re = lax.dynamic_slice(
                t_re, (0, i, 0), (B, 1, n))[:, 0, :]
            trow_im = lax.dynamic_slice(
                t_im, (0, i, 0), (B, 1, n))[:, 0, :]
            done = (idx[None, :] > i).astype(dtype)
        w_re = trow_re * done * sel_row
        w_im = trow_im * done * sel_row
        s1_re = jnp.einsum("bk,bkj->bj", w_re, X_re, precision=_HIGH) \
            - jnp.einsum("bk,bkj->bj", w_im, X_im, precision=_HIGH)
        s1_im = jnp.einsum("bk,bkj->bj", w_re, X_im, precision=_HIGH) \
            + jnp.einsum("bk,bkj->bj", w_im, X_re, precision=_HIGH)
        rhs_re = lax.dynamic_slice(
            c_re, (0, i, 0), (B, 1, n))[:, 0, :] - s1_re
        rhs_im = lax.dynamic_slice(
            c_im, (0, i, 0), (B, 1, n))[:, 0, :] - s1_im

        dii_re = jnp.take_along_axis(
            diag_re, jnp.full((B, 1), i, jnp.int32), axis=1)[:, 0]
        dii_im = jnp.take_along_axis(
            diag_im, jnp.full((B, 1), i, jnp.int32), axis=1)[:, 0]
        den_re = dii_re[:, None] - diag_re                   # [B, n]
        den_im = dii_im[:, None] - diag_im
        small = den_re * den_re + den_im * den_im < (smin * smin)[:, None]
        den_re = jnp.where(
            small, jnp.where(den_re < 0, -smin[:, None], smin[:, None]),
            den_re,
        )
        den_im = jnp.where(small, 0.0, den_im)
        den2 = den_re * den_re + den_im * den_im

        row_active = sel_row[
            jnp.arange(B), jnp.full((B,), i, jnp.int32)
        ]                                                     # [B]
        act = row_active[:, None] * unsel_col                 # [B, n]
        pert = pert | jnp.any(small & (act > 0), axis=1)

        # Inner column scan: x_j = (rhs_j + acc_j)/den_j, then feed the
        # coupling to later columns — forward: acc += x_j·T[j, :] (row j
        # of T22); adjoint: acc += x_j·conj(T[:, j]) (column j — the
        # (X T22ᴴ)_{ij'} = Σ_k x_k·conj(T_{j'k}) pattern).
        if adjoint:
            tmove_re = jnp.moveaxis(t_re, 2, 0)               # [n, B, n]
            tmove_im = -jnp.moveaxis(t_im, 2, 0)
        else:
            tmove_re = jnp.moveaxis(t_re, 1, 0)               # [n, B, n]
            tmove_im = jnp.moveaxis(t_im, 1, 0)
        order = jnp.arange(n - 1, -1, -1) if adjoint else jnp.arange(n)

        def inner(acc, j):
            acc_re, acc_im = acc
            rr = jnp.take_along_axis(rhs_re, j[None, None].repeat(B, 0),
                                     axis=1)[:, 0]
            ri = jnp.take_along_axis(rhs_im, j[None, None].repeat(B, 0),
                                     axis=1)[:, 0]
            ar = jnp.take_along_axis(acc_re, j[None, None].repeat(B, 0),
                                     axis=1)[:, 0]
            ai = jnp.take_along_axis(acc_im, j[None, None].repeat(B, 0),
                                     axis=1)[:, 0]
            dr = jnp.take_along_axis(den_re, j[None, None].repeat(B, 0),
                                     axis=1)[:, 0]
            di = jnp.take_along_axis(den_im, j[None, None].repeat(B, 0),
                                     axis=1)[:, 0]
            d2 = jnp.take_along_axis(den2, j[None, None].repeat(B, 0),
                                     axis=1)[:, 0]
            aj = jnp.take_along_axis(act, j[None, None].repeat(B, 0),
                                     axis=1)[:, 0]
            nr = rr + ar
            ni = ri + ai
            x_re = (nr * dr + ni * di) / d2 * aj
            x_im = (ni * dr - nr * di) / d2 * aj
            # coupling row: (X T22)_{i j'} = Σ_k x_k T_{k j'} — after
            # computing x_j, add x_j·T[j, :].  Adjoint: (X T22ᴴ)_{i j'}
            # = Σ_k x_k conj(T_{j' k}) — add x_j·conj(T column j
            # read as row of Tᵀ) = x_j·conj(T[:, j])ᵀ → use T[j2, :] of
            # the TRANSPOSE; handled by passing tmove of swapaxes.
            tr = tmove_re[j]
            ti = tmove_im[j]
            xr = x_re[:, None]
            xi = x_im[:, None]
            acc_re = acc_re + (xr * tr - xi * ti) * unsel_col
            acc_im = acc_im + (xr * ti + xi * tr) * unsel_col
            return (acc_re, acc_im), (x_re, x_im)

        z = jnp.zeros((B, n), dtype)
        (_, _), (xs_re, xs_im) = lax.scan(inner, (z, z), order)
        # xs in scan order → scatter back to natural order.
        inv = jnp.argsort(order)
        xrow_re = jnp.moveaxis(xs_re, 0, 1)[:, inv]
        xrow_im = jnp.moveaxis(xs_im, 0, 1)[:, inv]
        X_re = lax.dynamic_update_slice(
            X_re, xrow_re[:, None, :], (0, i, 0))
        X_im = lax.dynamic_update_slice(
            X_im, xrow_im[:, None, :], (0, i, 0))
        return (X_re, X_im, pert), None

    Z = jnp.zeros((B, n, n), dtype)
    (X_re, X_im, pert), _ = lax.scan(
        outer, (Z, Z, jnp.zeros((B,), bool)), jnp.arange(n)
    )
    return X_re, X_im, pert


class ClusterCondition(NamedTuple):
    """dtrsen-style condition numbers for a selected eigenvalue cluster
    (all per lane):

    - ``s``: reciprocal condition of the cluster average,
      ``1/√(1 + ‖X‖²_F)`` with ``T11 X − X T22 = T12`` — a perturbation
      ``E`` moves the cluster mean by ≲ ``‖E‖/s``.
    - ``sep``: estimated ``sep(T11, T22) = σ_min(Z ↦ T11 Z − Z T22)``
      (power iteration on the inverse operator — an upper-biased
      estimate converging from above, usually within a few % after the
      default iterations); the invariant subspace rotates by
      ``θ ≲ 4‖E‖/sep``.
    - ``p_fro``: Frobenius norm of the spectral projector
      ``√(m + ‖X‖²_F)``.
    - ``gap``: ``min |λ_sel − λ_unsel|`` — the naive spectral gap
      (``sep ≤ gap``, sometimes much smaller for non-normal T).
    - ``perturbed``: a shared/near-shared eigenvalue between the
      clusters forced an ``eps·‖T‖`` denominator floor in the Sylvester
      solve (the cluster split is ill-posed; ``sep`` ≈ 0 there).
    """

    s: jax.Array       # [B]
    sep: jax.Array     # [B]
    p_fro: jax.Array   # [B]
    gap: jax.Array     # [B]
    m: jax.Array       # [B] i32
    perturbed: jax.Array  # [B] bool


@functools.partial(jax.jit, static_argnames=("sep_iters",))
@f32_matmuls
def schur_cluster_cond_batched(
    T: jax.Array, Q: jax.Array, select: jax.Array, sep_iters: int = 5,
    key=None,
) -> ClusterCondition:
    """Condition numbers of the eigenvalue cluster picked by ``select``
    (a [B, n] mask over the diagonal positions of the REAL Schur form
    ``T``) — the LAPACK ``dtrsen`` job='B' quantities, batched.

    Pipeline: complex reorder (selected first), one masked-triangular
    Sylvester solve for ``s``/``p_fro``, and ``sep_iters`` inverse power
    iterations (two Sylvester solves each — forward and adjoint) for
    ``sep``.  Empty or full selections report ``s = 1`` and
    ``sep = gap = +inf``.
    """
    B, n, _ = T.shape
    dtype = jnp.result_type(T.dtype, jnp.float32)
    os = schur_reorder_batched(T.astype(dtype), Q.astype(dtype), select)
    t_re, t_im, m = os.t_re, os.t_im, os.m
    idx = jnp.arange(n)
    sel_row = (idx[None, :] < m[:, None]).astype(dtype)
    unsel_col = 1.0 - sel_row
    block = sel_row[:, :, None] * unsel_col[:, None, :]   # [B, n, n]

    def fro2(xr, xi):
        return jnp.sum((xr * xr + xi * xi) * block, axis=(1, 2))

    # s and ‖P‖_F from T11 X − X T22 = T12.
    c_re = t_re * block
    c_im = t_im * block
    X_re, X_im, pert = _trsyl_masked(t_re, t_im, m, c_re, c_im)
    xf2 = fro2(X_re, X_im)
    s = 1.0 / jnp.sqrt(1.0 + xf2)
    p_fro = jnp.sqrt(m.astype(dtype) + xf2)

    # sep via power iteration on S⁻ᴴS⁻¹ (Rayleigh quotient ‖S⁻¹u‖²).
    if key is None:
        key = jax.random.PRNGKey(0)
    u_re = jax.random.normal(key, (B, n, n), dtype) * block
    u_im = jax.random.normal(
        jax.random.fold_in(key, 1), (B, n, n), dtype) * block

    def step(_, carry):
        u_re, u_im, lam = carry
        nrm = jnp.sqrt(jnp.maximum(fro2(u_re, u_im), 1e-30))
        u_re = u_re / nrm[:, None, None]
        u_im = u_im / nrm[:, None, None]
        v_re, v_im, _ = _trsyl_masked(t_re, t_im, m, u_re, u_im)
        lam = fro2(v_re, v_im)            # ‖S⁻¹u‖² with ‖u‖=1
        w_re, w_im, _ = _trsyl_masked(
            t_re, t_im, m, v_re, v_im, adjoint=True
        )
        return w_re, w_im, lam

    _, _, lam = lax.fori_loop(
        0, sep_iters, step,
        (u_re, u_im, jnp.zeros((B,), dtype)),
    )
    empty = (m == 0) | (m == n)
    inf = jnp.asarray(jnp.inf, dtype)
    sep = jnp.where(empty, inf, 1.0 / jnp.sqrt(jnp.maximum(lam, 1e-30)))

    # Naive gap: min |λ_sel − λ_unsel|.
    w_re_d = jnp.diagonal(t_re, axis1=1, axis2=2)
    w_im_d = jnp.diagonal(t_im, axis1=1, axis2=2)
    dr = w_re_d[:, :, None] - w_re_d[:, None, :]
    di = w_im_d[:, :, None] - w_im_d[:, None, :]
    dist = jnp.sqrt(dr * dr + di * di)
    gap = jnp.min(
        jnp.where(block > 0, dist, inf), axis=(1, 2)
    )
    return ClusterCondition(
        jnp.where(empty, 1.0, s), sep, p_fro, gap, m, pert & ~empty
    )
