"""Batched ε-pseudospectra: ``σmin(A − zI)`` over a complex grid.

The pseudospectrum ``Λ_ε(A) = {z : σmin(A − zI) ≤ ε}`` is THE
diagnostic for non-normal matrices — eigenvalues alone say nothing
about transient growth, eigenvalue sensitivity, or how close a stable
matrix is to instability; this framework computes eigenvalue condition
numbers per eigenvalue (``ops.schur.eig_condition_batched``) and this
module maps the whole resolvent landscape.

Algorithm (Trefethen, *Computation of Pseudospectra*, Acta Numerica
1999): one real Schur decomposition per matrix (unitary similarity —
``balance=False`` — so ``σmin(A − zI) = σmin(T − zI)`` exactly),
``rsf2csf`` to a COMPLEX upper-triangular T (re/im pairs — no complex
device layouts), then per grid point inverse power iteration on
``(M ᴴM)⁻¹`` with ``M = T − zI``: each step is one complex triangular
back-substitution + one forward substitution, O(n²) per grid point
instead of the O(n³) of a dense SVD.  All grid points run as parallel
lanes — the substitution loop is a ``lax.scan`` over rows whose body
does ``[G]``-wide VPU work, so a 100×100 grid costs the same number of
steps as a single point.

No counterpart in the reference; extends the eigen family's honesty
tooling (condition numbers, convergence flags) to the resolvent.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.precision import f32_matmuls
from .ordschur import rsf2csf_batched
from .schur import real_schur_vectors

_HIGH = jax.lax.Precision.HIGHEST


class PseudospectraResult(NamedTuple):
    sigmin: jax.Array     # [B, G] σmin(A − z_g I) per grid point
    converged: jax.Array  # [B] Schur iteration converged (the power
    #                       iteration itself is self-correcting; near-
    #                       degenerate σ pairs bias it at most toward
    #                       the second-smallest σ, which bounds the
    #                       true value from above)
    ok: jax.Array         # [B] clean Schur (no forced deflations)


def _cdiv(br, bi, dr, di, dfloor):
    """Complex divide with the diagonal FLOORED at ``dfloor`` (LAPACK
    dlatrs-style): at a grid point on an eigenvalue the pivot is
    exactly zero and a plain guarded divide returns 0 — silently
    hiding the resolvent blow-up inverse iteration needs to see.
    Flooring keeps the direction and makes x explode to ~1/dfloor,
    which reports σmin ≈ eps·‖T − zI‖ — the attainable f32 answer."""
    mag = jnp.sqrt(dr * dr + di * di)
    small = mag < dfloor
    safe = jnp.maximum(mag, jnp.finfo(br.dtype).tiny)
    grow = jnp.where(small, dfloor / safe, 1.0)
    dr = jnp.where(small & (mag == 0), dfloor, dr * grow)
    di = jnp.where(small & (mag == 0), 0.0, di * grow)
    den = jnp.maximum(dr * dr + di * di, jnp.finfo(br.dtype).tiny)
    return (br * dr + bi * di) / den, (bi * dr - br * di) / den


def _dfloor(tr, ti, zr, zi):
    """Per-point pivot floor: eps · (‖T‖_max + |z|)."""
    tnorm = jnp.max(jnp.abs(tr) + jnp.abs(ti))
    return jnp.finfo(tr.dtype).eps * (tnorm + jnp.hypot(zr, zi))


def _solve_upper(tr, ti, zr, zi, br, bi):
    """Back-substitution ``(T − zI) x = b`` for complex upper-
    triangular T [n, n] against G lanes: z, b are [G], [G, n]."""
    n = tr.shape[0]
    cols = jnp.arange(n)
    dfloor = _dfloor(tr, ti, zr, zi)

    def step(x, i):
        xr, xi = x
        row_r = lax.dynamic_index_in_dim(tr, i, 0, keepdims=False)
        row_i = lax.dynamic_index_in_dim(ti, i, 0, keepdims=False)
        mask = (cols > i).astype(tr.dtype)
        sr = jnp.einsum("j,gj->g", row_r * mask, xr, precision=_HIGH) \
            - jnp.einsum("j,gj->g", row_i * mask, xi, precision=_HIGH)
        si = jnp.einsum("j,gj->g", row_r * mask, xi, precision=_HIGH) \
            + jnp.einsum("j,gj->g", row_i * mask, xr, precision=_HIGH)
        dr = row_r[i] - zr
        di = row_i[i] - zi
        vr, vi = _cdiv(br[:, i] - sr, bi[:, i] - si, dr, di, dfloor)
        return (xr.at[:, i].set(vr), xi.at[:, i].set(vi)), None

    (xr, xi), _ = lax.scan(
        step,
        (jnp.zeros_like(br), jnp.zeros_like(bi)),
        jnp.arange(n - 1, -1, -1),
    )
    return xr, xi


def _solve_lower_h(tr, ti, zr, zi, br, bi):
    """Forward substitution ``(T − zI)ᴴ y = b``: the adjoint is lower
    triangular with rows ``conj(T[:, i])`` and diagonal
    ``conj(T_ii − z)``."""
    n = tr.shape[0]
    rows = jnp.arange(n)
    dfloor = _dfloor(tr, ti, zr, zi)

    def step(y, i):
        yr, yi = y
        col_r = lax.dynamic_index_in_dim(tr, i, 1, keepdims=False)
        col_i = lax.dynamic_index_in_dim(ti, i, 1, keepdims=False)
        mask = (rows < i).astype(tr.dtype)
        # conj(T[j,i]) · y[j]
        sr = jnp.einsum("j,gj->g", col_r * mask, yr, precision=_HIGH) \
            + jnp.einsum("j,gj->g", col_i * mask, yi, precision=_HIGH)
        si = jnp.einsum("j,gj->g", col_r * mask, yi, precision=_HIGH) \
            - jnp.einsum("j,gj->g", col_i * mask, yr, precision=_HIGH)
        dr = col_r[i] - zr
        di = -(col_i[i] - zi)
        vr, vi = _cdiv(br[:, i] - sr, bi[:, i] - si, dr, di, dfloor)
        return (yr.at[:, i].set(vr), yi.at[:, i].set(vi)), None

    (yr, yi), _ = lax.scan(
        step,
        (jnp.zeros_like(br), jnp.zeros_like(bi)),
        jnp.arange(n),
    )
    return yr, yi


def _sigmin_one(tr, ti, zr, zi, iters):
    """σmin(T − zI) for one complex-triangular T against [G] points —
    power iteration on ``(MᴴM)⁻¹ = M⁻¹M⁻ᴴ``, λmax = σmin⁻²."""
    G = zr.shape[0]
    n = tr.shape[0]
    dtype = tr.dtype
    key = jax.random.PRNGKey(0)
    u0 = jax.random.normal(key, (2, G, n), dtype)
    nrm0 = jnp.sqrt(jnp.sum(u0[0] ** 2 + u0[1] ** 2, axis=1))
    u0 = u0 / jnp.maximum(nrm0, 1e-30)[None, :, None]

    def step(carry, _):
        ur, ui, _ = carry
        yr, yi = _solve_lower_h(tr, ti, zr, zi, ur, ui)
        wr, wi = _solve_upper(tr, ti, zr, zi, yr, yi)
        lam = jnp.sqrt(jnp.sum(wr * wr + wi * wi, axis=1))
        lam_s = jnp.maximum(lam, jnp.finfo(dtype).tiny)
        return (wr / lam_s[:, None], wi / lam_s[:, None], lam), None

    (_, _, lam), _ = lax.scan(
        step,
        (u0[0], u0[1], jnp.zeros((G,), dtype)),
        None,
        length=iters,
    )
    return 1.0 / jnp.sqrt(jnp.maximum(lam, jnp.finfo(dtype).tiny))


@functools.partial(jax.jit, static_argnames=("iters",))
@f32_matmuls
def _sigmin_core(t_re, t_im, z_re, z_im, iters):
    return jax.vmap(
        lambda tr, ti: _sigmin_one(tr, ti, z_re, z_im, iters)
    )(t_re, t_im)


def sigmin_points_batched(
    a: jax.Array,
    z_re: jax.Array,
    z_im: jax.Array,
    iters: int = 20,
) -> PseudospectraResult:
    """``σmin(A − z_g I)`` for a batch of real matrices ``[B, n, n]``
    at G complex points (``z_re``/``z_im`` are ``[G]``, shared across
    the batch).  One Schur decomposition per lane, then O(n²) per
    point.  NOT jittable as a whole (the Schur driver is host-chunked);
    the per-grid work is one jitted core."""
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    z_re = jnp.atleast_1d(jnp.asarray(z_re, f32))
    z_im = jnp.atleast_1d(jnp.asarray(z_im, f32))
    sv = real_schur_vectors(a, balance=False)
    cs = rsf2csf_batched(sv.T, sv.Q)
    sig = _sigmin_core(cs.t_re, cs.t_im, z_re, z_im, iters)
    return PseudospectraResult(sig, sv.converged, sv.clean)


def pseudospectrum_grid_batched(
    a: jax.Array,
    re_pts: jax.Array,
    im_pts: jax.Array,
    iters: int = 20,
) -> PseudospectraResult:
    """σmin over the tensor grid ``re_pts × im_pts``; ``sigmin`` comes
    back as ``[B, len(im_pts), len(re_pts)]`` ready for a contour plot
    (``contour(re, im, sigmin[b], levels=[eps])`` draws ∂Λ_ε)."""
    re_pts = jnp.atleast_1d(re_pts)
    im_pts = jnp.atleast_1d(im_pts)
    R, I = jnp.meshgrid(re_pts, im_pts)  # [len(im), len(re)]
    res = sigmin_points_batched(
        a, R.ravel(), I.ravel(), iters=iters
    )
    B = a.shape[0]
    return PseudospectraResult(
        res.sigmin.reshape(B, im_pts.shape[0], re_pts.shape[0]),
        res.converged,
        res.ok,
    )
