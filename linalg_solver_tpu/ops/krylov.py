"""Batched Krylov iterative solvers: CG, BiCGSTAB, GMRES(m), MINRES,
LSQR.

No counterpart in the reference (its solvers are exact/direct); these
extend the framework's solve family to the regime where direct
factorization is the wrong tool — very large, well-conditioned, or
repeatedly-solved systems — while staying TPU-first:

- Every iteration is batched GEMV work (``[B, n, n] × [B, n]`` — MXU
  contractions) + VPU vector updates; no data-dependent shapes.
- Fixed-trip ``lax.while_loop`` with per-lane ``done`` masks: converged
  lanes freeze (their updates are ``where``-ed out) so one slow lane
  doesn't perturb finished ones.
- Optional Jacobi (diagonal) preconditioning on the dense entry points
  — the only preconditioner that is free on device.

Every solver also has a MATRIX-FREE entry point (``cg_matvec`` /
``bicgstab_matvec`` / ``gmres_matvec``) taking an arbitrary batched
``matvec(v: [B, n]) -> [B, n]`` closure (and an optional ``precond``
closure) — the composition point for structured operators: FFT
Toeplitz/circulant products (``ops.toeplitz``), banded stencils,
factored preconditioners from ``ops.lu``/``ops.spd``.  The matvec
entry points are NOT jitted (the closure is the caller's trace); wrap
the call site in ``jax.jit``.

All solvers return per-lane ``converged`` flags and final relative
residual norms — the same honesty contract as the direct family
(``models.solver.solve_checked``).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST

MatVec = Callable[[jax.Array], jax.Array]


class KrylovResult(NamedTuple):
    x: jax.Array          # [B, n] solution iterate
    converged: jax.Array  # [B] final TRUE residual ≤ 4·tol (the
    #                       recurrence residual is driven to tol; the
    #                       4× margin absorbs the recurrence-vs-true
    #                       drift of f32 short recurrences)
    iters: jax.Array      # [] i32 — iterations executed (max over lanes)
    resnorm: jax.Array    # [B] final ‖b − Ax‖ / ‖b‖


def _mv_dense(a):
    return lambda v: jnp.einsum("bij,bj->bi", a, v, precision=_HIGH)


def _identity(v):
    return v


def _jacobi_precond(a):
    dinv = 1.0 / jnp.maximum(
        jnp.abs(jnp.diagonal(a, axis1=1, axis2=2)),
        jnp.finfo(a.dtype).tiny,
    )
    return lambda v: dinv * v


def _nrm(x):
    """Overflow/underflow-safe 2-norm along the last axis: f32 squares
    of ~1e-20 entries flush to zero (a nonzero b then 'converged' at
    x = 0 instantly), so scale by the max magnitude first."""
    m = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    ms = jnp.maximum(m, jnp.finfo(x.dtype).tiny)
    return m[..., 0] * jnp.sqrt(jnp.sum((x / ms) ** 2, axis=-1))


def _prep_b(b, tol):
    """RHS rescaled to unit max-norm per lane (plus the scale to undo
    on x).  The rescaling keeps every internal inner product (ρ, r·z,
    ‖r‖²) in f32 range even for ‖b‖ ~ 1e-20 / 1e+19 right sides — the
    solvers are exactly scale-equivariant in b, so this is free.
    (Pathologically scaled A is the caller's job — equilibrate or use
    ``jacobi=True`` / a ``precond``.)"""
    dtype = jnp.result_type(b.dtype, jnp.float32)
    b = b.astype(dtype)
    bscale = jnp.max(jnp.abs(b), axis=-1, keepdims=True)
    bscale = jnp.where(bscale > 0, bscale, 1.0)
    b = b / bscale
    bnorm = jnp.maximum(_nrm(b), jnp.finfo(dtype).tiny)
    if tol is None:
        # ~100 ulp of the accumulated GEMV roundoff; the attainable
        # floor for f32 Krylov on well-conditioned systems.
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    return b, bnorm, jnp.asarray(tol, dtype), bscale


# --------------------------------------------------------------------
# cores (matvec-based)
# --------------------------------------------------------------------


def cg_matvec(
    matvec: MatVec,
    b: jax.Array,
    tol: Optional[float] = None,
    max_iters: int = 0,
    precond: Optional[MatVec] = None,
) -> KrylovResult:
    """Conjugate gradients on SPD operators given only a batched
    ``matvec`` (and optional SPD ``precond``) — the matrix-free entry
    point.  ``max_iters=0`` picks ``2n``."""
    b, bnorm, tol, bscale = _prep_b(b, tol)
    B, n = b.shape
    if max_iters == 0:
        max_iters = 2 * n
    M = precond or _identity

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0, axis=-1)
    done0 = _nrm(r0) / bnorm <= tol

    def cond(st):
        _, _, _, _, _, done, k = st
        return (k < max_iters) & ~jnp.all(done)

    def body(st):
        x, r, z, p, rz, done, k = st
        ap = matvec(p)
        pap = jnp.sum(p * ap, axis=-1)
        alpha = rz / jnp.where(pap != 0, pap, 1.0)
        alpha = jnp.where(done | (pap == 0), 0.0, alpha)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * ap
        z = M(r)
        rz_new = jnp.sum(r * z, axis=-1)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        beta = jnp.where(done | (rz == 0), 0.0, beta)
        p = jnp.where(done[:, None], p, z + beta[:, None] * p)
        done = done | (_nrm(r) / bnorm <= tol)
        return x, r, z, p, rz_new, done, k + 1

    x, r, _, _, _, done, k = lax.while_loop(
        cond, body, (x0, r0, z0, p0, rz0, done0, jnp.zeros((), jnp.int32))
    )
    res = _nrm(b - matvec(x)) / bnorm
    return KrylovResult(x * bscale, res <= 4.0 * tol, k, res)


def bicgstab_matvec(
    matvec: MatVec,
    b: jax.Array,
    tol: Optional[float] = None,
    max_iters: int = 0,
    precond: Optional[MatVec] = None,
) -> KrylovResult:
    """BiCGSTAB on GENERAL square operators given only a batched
    ``matvec`` (two matvecs per step; ``precond`` applies on the
    right).  ``max_iters=0`` picks ``4n``.  Breakdown lanes (ρ ≈ 0)
    freeze and report ``converged=False`` unless already at tol."""
    b, bnorm, tol, bscale = _prep_b(b, tol)
    B, n = b.shape
    if max_iters == 0:
        max_iters = 4 * n
    M = precond or _identity

    x0 = jnp.zeros_like(b)
    r0 = b
    rhat = r0
    done0 = _nrm(r0) / bnorm <= tol
    ones = jnp.ones((B,), b.dtype)
    st0 = (
        x0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
        ones, ones, ones, done0, jnp.zeros((), jnp.int32),
    )

    def cond(st):
        return (st[-1] < max_iters) & ~jnp.all(st[-2])

    def body(st):
        x, r, p, v, rho, alpha, omega, done, k = st
        rho_new = jnp.sum(rhat * r, axis=-1)
        # serious breakdown: r has (numerically) lost all overlap with
        # the shadow residual — relative test, scale-invariant.
        eps = jnp.finfo(b.dtype).eps
        broke = jnp.abs(rho_new) <= (eps * _nrm(rhat)) * (eps * _nrm(r))
        beta = (rho_new / jnp.where(rho == 0, 1.0, rho)) * (
            alpha / jnp.where(omega == 0, 1.0, omega)
        )
        p = r + beta[:, None] * (p - omega[:, None] * v)
        phat = M(p)
        v = matvec(phat)
        rv = jnp.sum(rhat * v, axis=-1)
        alpha = rho_new / jnp.where(rv == 0, 1.0, rv)
        s = r - alpha[:, None] * v
        shat = M(s)
        t = matvec(shat)
        tt = jnp.sum(t * t, axis=-1)
        omega = jnp.sum(t * s, axis=-1) / jnp.where(tt == 0, 1.0, tt)
        x_new = x + alpha[:, None] * phat + omega[:, None] * shat
        r_new = s - omega[:, None] * t
        frozen = done | broke
        x = jnp.where(frozen[:, None], x, x_new)
        r = jnp.where(frozen[:, None], r, r_new)
        done = done | (~broke & (_nrm(r) / bnorm <= tol)) | broke
        return x, r, p, v, rho_new, alpha, omega, done, k + 1

    st = lax.while_loop(cond, body, st0)
    x, k = st[0], st[-1]
    res = _nrm(b - matvec(x)) / bnorm
    return KrylovResult(x * bscale, res <= 4.0 * tol, k, res)


def gmres_matvec(
    matvec: MatVec,
    b: jax.Array,
    tol: Optional[float] = None,
    restart: int = 32,
    max_restarts: int = 8,
    precond: Optional[MatVec] = None,
) -> KrylovResult:
    """Restarted GMRES(m) on GENERAL square operators given only a
    batched ``matvec`` (``precond`` applies on the right).

    Arnoldi with modified Gram–Schmidt over a fixed ``restart``-wide
    basis ``V [B, m+1, n]`` (static shapes — one matvec + m dot/axpy
    pairs per step), then the small ``(m+1) × m`` least-squares problem
    per lane via normal equations on host-sized matrices.  Converged
    lanes freeze across restarts.
    """
    b, bnorm, tol, bscale = _prep_b(b, tol)
    B, n = b.shape
    m = min(restart, n)
    eps_tiny = jnp.finfo(b.dtype).tiny
    M = precond or _identity

    def one_cycle(x):
        r = b - matvec(x)
        beta = _nrm(r)
        V = jnp.zeros((B, m + 1, n), b.dtype)
        V = V.at[:, 0].set(r / jnp.maximum(beta, eps_tiny)[:, None])
        H = jnp.zeros((B, m + 1, m), b.dtype)

        def arnoldi(j, carry):
            V, H = carry
            vj = lax.dynamic_index_in_dim(V, j, axis=1, keepdims=False)
            w = matvec(M(vj))
            # MGS against all m+1 slots; rows > j are still zero so
            # their projections vanish — static shapes, masked math.
            hcol = jnp.einsum(
                "bkn,bn->bk", V, w, precision=_HIGH
            )
            mask = (jnp.arange(m + 1) <= j)[None, :]
            hcol = jnp.where(mask, hcol, 0.0)
            w = w - jnp.einsum(
                "bk,bkn->bn", hcol, V, precision=_HIGH
            )
            hnorm = _nrm(w)
            hcol = hcol.at[:, j + 1].set(hnorm)
            H = lax.dynamic_update_slice_in_dim(
                H, hcol[:, :, None], j, axis=2
            )
            V = lax.dynamic_update_slice_in_dim(
                V,
                (w / jnp.maximum(hnorm, eps_tiny)[:, None])[:, None, :],
                j + 1,
                axis=1,
            )
            return V, H

        V, H = lax.fori_loop(0, m, arnoldi, (V, H))
        # min ‖β e₁ − H y‖ via the (m × m) normal equations — H has
        # full column rank unless the Krylov space degenerated, in
        # which case the ridge term keeps the solve finite and the
        # residual check catches it.
        g = jnp.zeros((B, m + 1), b.dtype).at[:, 0].set(beta)
        HtH = jnp.einsum("bkm,bkl->bml", H, H, precision=_HIGH)
        Htg = jnp.einsum("bkm,bk->bm", H, g, precision=_HIGH)
        ridge = 1e-7 * jnp.trace(HtH, axis1=1, axis2=2)
        y = jnp.linalg.solve(
            HtH + ridge[:, None, None] * jnp.eye(m, dtype=b.dtype),
            Htg[..., None],
        )[..., 0]
        dx = M(
            jnp.einsum("bm,bmn->bn", y, V[:, :m], precision=_HIGH)
        )
        return x + dx

    def cond(st):
        x, done, k = st
        return (k < max_restarts) & ~jnp.all(done)

    def body(st):
        x, done, k = st
        x_new = one_cycle(x)
        x = jnp.where(done[:, None], x, x_new)
        done = done | (_nrm(b - matvec(x)) / bnorm <= tol)
        return x, done, k + 1

    done0 = _nrm(b) / bnorm <= tol
    x, done, k = lax.while_loop(
        cond, body,
        (jnp.zeros_like(b), done0, jnp.zeros((), jnp.int32)),
    )
    res = _nrm(b - matvec(x)) / bnorm
    return KrylovResult(x * bscale, res <= 4.0 * tol, k * m, res)


def minres_matvec(
    matvec: MatVec,
    b: jax.Array,
    tol: Optional[float] = None,
    max_iters: int = 0,
) -> KrylovResult:
    """MINRES on SYMMETRIC (possibly INDEFINITE) operators — the regime
    where CG breaks down (pᵀAp can vanish) and BiCGSTAB wastes a second
    matvec.  One matvec per step: Lanczos three-term recurrence + two
    trailing Givens rotations (Paige–Saunders); the rotated residual
    ``|η|`` tracks ‖b − Ax‖ exactly in exact arithmetic, so no extra
    residual matvec inside the loop.  ``max_iters=0`` picks ``2n``."""
    b, bnorm, tol, bscale = _prep_b(b, tol)
    B, n = b.shape
    if max_iters == 0:
        max_iters = 2 * n
    tiny = jnp.finfo(b.dtype).tiny

    beta1 = _nrm(b)
    v0 = b / jnp.maximum(beta1, tiny)[:, None]
    ones = jnp.ones((B,), b.dtype)
    zeros = jnp.zeros((B,), b.dtype)
    st0 = (
        jnp.zeros_like(b),            # x
        jnp.zeros_like(b), v0,        # v_old, v
        beta1,                        # beta_j (‖·‖ of last Lanczos res)
        beta1,                        # eta (rotated residual norm ±)
        ones, ones, zeros, zeros,     # gamma0, gamma1, sigma0, sigma1
        jnp.zeros_like(b), jnp.zeros_like(b),   # w0, w1
        beta1 / bnorm <= tol,         # done
        jnp.zeros((), jnp.int32),
    )

    def cond(st):
        return (st[-1] < max_iters) & ~jnp.all(st[-2])

    def body(st):
        (x, v_old, v, beta, eta, g0, g1, s0, s1, w0, w1, done, k) = st
        av = matvec(v)
        alpha = jnp.sum(v * av, axis=-1)
        p = av - alpha[:, None] * v - beta[:, None] * v_old
        beta_new = _nrm(p)
        v_new = p / jnp.maximum(beta_new, tiny)[:, None]

        delta = g1 * alpha - g0 * s1 * beta
        rho1 = jnp.sqrt(delta * delta + beta_new * beta_new)
        rho2 = s1 * alpha + g0 * g1 * beta
        rho3 = s0 * beta
        rho1s = jnp.maximum(rho1, tiny)
        g_new = delta / rho1s
        s_new = beta_new / rho1s
        w_new = (v - rho3[:, None] * w0 - rho2[:, None] * w1) / rho1s[
            :, None
        ]
        x_new = x + (g_new * eta)[:, None] * w_new
        eta_new = -s_new * eta

        # degenerate rotation (rho1 ≈ 0: delta AND beta_new both ≈ 0):
        # the Krylov space is invariant and the update direction is
        # numerically undefined — freeze the lane BEFORE applying it.
        broke = rho1 <= (jnp.abs(alpha) + beta + beta_new) * jnp.finfo(
            b.dtype
        ).eps
        upd = ~(done | broke)
        x = jnp.where(upd[:, None], x_new, x)
        eta = jnp.where(upd, eta_new, eta)
        done = done | broke | (jnp.abs(eta) / bnorm <= tol)
        sel = upd[:, None]
        return (
            x,
            jnp.where(sel, v, v_old), jnp.where(sel, v_new, v),
            jnp.where(upd, beta_new, beta), eta,
            jnp.where(upd, g1, g0), jnp.where(upd, g_new, g1),
            jnp.where(upd, s1, s0), jnp.where(upd, s_new, s1),
            jnp.where(sel, w1, w0), jnp.where(sel, w_new, w1),
            done, k + 1,
        )

    st = lax.while_loop(cond, body, st0)
    x, k = st[0], st[-1]
    res = _nrm(b - matvec(x)) / bnorm
    return KrylovResult(x * bscale, res <= 4.0 * tol, k, res)


class LSQRResult(NamedTuple):
    x: jax.Array          # [B, n] least-squares iterate
    converged: jax.Array  # [B] ‖r‖/‖b‖ ≤ 4·tol (consistent systems) OR
    #                       ‖Aᵀr‖/(‖A‖·‖r‖) ≤ 4·tol (true LS optimum)
    iters: jax.Array      # [] i32
    resnorm: jax.Array    # [B] final ‖b − Ax‖ / ‖b‖
    atresnorm: jax.Array  # [B] final ‖Aᵀr‖ / (‖A‖·‖r‖) — LS optimality
    #                       (computed against the damped operator when
    #                       damp > 0)


def lsqr_matvec(
    matvec: MatVec,
    rmatvec: MatVec,
    b: jax.Array,
    n: int,
    tol: Optional[float] = None,
    max_iters: int = 0,
    damp: float = 0.0,
) -> LSQRResult:
    """LSQR (Paige–Saunders) on a RECTANGULAR operator: minimizes
    ``‖Ax − b‖² + damp²‖x‖²`` given ``matvec: [B,n]→[B,m]`` and its
    adjoint ``rmatvec: [B,m]→[B,n]`` — Golub–Kahan bidiagonalization
    with one rotation per step, analytically equivalent to CG on the
    normal equations but numerically far more reliable.  One matvec +
    one rmatvec per iteration.  ``max_iters=0`` picks ``2n``."""
    b, bnorm, tol, bscale = _prep_b(b, tol)
    B, m = b.shape
    if max_iters == 0:
        max_iters = 2 * n
    tiny = jnp.finfo(b.dtype).tiny
    dampv = jnp.asarray(damp, b.dtype)

    beta1 = _nrm(b)
    u0 = b / jnp.maximum(beta1, tiny)[:, None]
    atu = rmatvec(u0)
    alpha1 = _nrm(atu)
    v0 = atu / jnp.maximum(alpha1, tiny)[:, None]

    st0 = (
        jnp.zeros((B, n), b.dtype),   # x
        u0, v0, v0,                   # u, v, w
        alpha1, beta1,                # alpha, phibar (=‖r̄‖)
        alpha1,                       # rhobar
        jnp.sqrt(alpha1 * alpha1),    # anorm accumulator (‖B_k‖_F)
        alpha1 * beta1,               # arnorm ≈ ‖Aᵀr‖
        beta1 / bnorm <= tol,         # done
        jnp.zeros((), jnp.int32),
    )

    def cond(st):
        return (st[-1] < max_iters) & ~jnp.all(st[-2])

    def body(st):
        (x, u, v, w, alpha, phibar, rhobar, anorm, arnorm, done, k) = st
        # bidiagonalization step
        u_new = matvec(v) - alpha[:, None] * u
        beta = _nrm(u_new)
        u_new = u_new / jnp.maximum(beta, tiny)[:, None]
        v_new = rmatvec(u_new) - beta[:, None] * v
        alpha_new = _nrm(v_new)
        v_new = v_new / jnp.maximum(alpha_new, tiny)[:, None]

        # eliminate the damping row (rotation into rhobar)
        rhobar1 = jnp.sqrt(rhobar * rhobar + dampv * dampv)
        c1 = rhobar / jnp.maximum(rhobar1, tiny)
        phibar1 = c1 * phibar

        # trailing Givens rotation on the lower-bidiagonal column
        rho = jnp.sqrt(rhobar1 * rhobar1 + beta * beta)
        rhos = jnp.maximum(rho, tiny)
        c = rhobar1 / rhos
        s = beta / rhos
        theta = s * alpha_new
        rhobar_new = -c * alpha_new
        phi = c * phibar1
        phibar_new = s * phibar1

        x_new = x + (phi / rhos)[:, None] * w
        w_new = v_new - (theta / rhos)[:, None] * w

        anorm_new = jnp.sqrt(
            anorm * anorm + alpha_new * alpha_new + beta * beta
            + dampv * dampv
        )
        # phibar carries a sign (c1 = ±1 when damp = 0 flips it every
        # pass since rhobar < 0) — convergence quantities must be
        # magnitudes or the ≤ tests fire spuriously on negative values.
        arnorm_new = jnp.abs(phibar_new * alpha_new * c)

        upd = ~done
        sel = upd[:, None]
        x = jnp.where(sel, x_new, x)
        phibar = jnp.where(upd, phibar_new, phibar)
        arnorm = jnp.where(upd, arnorm_new, arnorm)
        done = done | (jnp.abs(phibar) / bnorm <= tol) | (
            arnorm
            <= tol * anorm_new * jnp.maximum(jnp.abs(phibar), tiny)
        )
        return (
            x,
            jnp.where(sel, u_new, u), jnp.where(sel, v_new, v),
            jnp.where(sel, w_new, w),
            jnp.where(upd, alpha_new, alpha), phibar,
            jnp.where(upd, rhobar_new, rhobar),
            jnp.where(upd, anorm_new, anorm), arnorm,
            done, k + 1,
        )

    st = lax.while_loop(cond, body, st0)
    x, anorm, k = st[0], st[7], st[-1]
    r = b - matvec(x)
    resnorm = _nrm(r) / bnorm
    # true LS optimality: ‖Aᵀr − damp²x‖ / (‖A‖·‖r̄‖) with
    # ‖r̄‖² = ‖r‖² + damp²‖x‖² (the damped problem's residual)
    atr = rmatvec(r) - (dampv * dampv) * x
    rbar = jnp.sqrt(_nrm(r) ** 2 + (dampv * _nrm(x)) ** 2)
    atres = _nrm(atr) / jnp.maximum(
        jnp.maximum(anorm, tiny) * jnp.maximum(rbar, tiny), tiny
    )
    conv = (resnorm <= 4.0 * tol) | (atres <= 4.0 * tol)
    return LSQRResult(x * bscale, conv, k, resnorm, atres)


# --------------------------------------------------------------------
# dense entry points
# --------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_iters", "jacobi"))
@f32_matmuls
def cg_batched(
    a: jax.Array,
    b: jax.Array,
    tol: Optional[float] = None,
    max_iters: int = 0,
    jacobi: bool = False,
) -> KrylovResult:
    """Conjugate gradients on a batched SPD system ``[B, n, n] x = b``.

    ``jacobi=True`` preconditions with ``diag(A)⁻¹`` (free on device;
    helps badly scaled rows).  ``max_iters=0`` picks ``2n`` — in exact
    arithmetic CG terminates in n steps; the margin covers f32 drift.
    """
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    return cg_matvec(
        _mv_dense(a), b, tol=tol, max_iters=max_iters,
        precond=_jacobi_precond(a) if jacobi else None,
    )


@functools.partial(jax.jit, static_argnames=("max_iters", "jacobi"))
@f32_matmuls
def bicgstab_batched(
    a: jax.Array,
    b: jax.Array,
    tol: Optional[float] = None,
    max_iters: int = 0,
    jacobi: bool = False,
) -> KrylovResult:
    """BiCGSTAB on a batched GENERAL square system (two GEMVs per
    step).  ``max_iters=0`` picks ``4n``.  Breakdown lanes (ρ ≈ 0)
    freeze and report ``converged=False`` unless already at tol."""
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    return bicgstab_matvec(
        _mv_dense(a), b, tol=tol, max_iters=max_iters,
        precond=_jacobi_precond(a) if jacobi else None,
    )


@functools.partial(
    jax.jit, static_argnames=("restart", "max_restarts", "jacobi")
)
@f32_matmuls
def gmres_batched(
    a: jax.Array,
    b: jax.Array,
    tol: Optional[float] = None,
    restart: int = 32,
    max_restarts: int = 8,
    jacobi: bool = False,
) -> KrylovResult:
    """Restarted GMRES(m) on a batched GENERAL square system (see
    :func:`gmres_matvec` for the algorithm and the matrix-free form)."""
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    return gmres_matvec(
        _mv_dense(a), b, tol=tol, restart=restart,
        max_restarts=max_restarts,
        precond=_jacobi_precond(a) if jacobi else None,
    )


@functools.partial(jax.jit, static_argnames=("max_iters", "jacobi"))
@f32_matmuls
def minres_batched(
    a: jax.Array,
    b: jax.Array,
    tol: Optional[float] = None,
    max_iters: int = 0,
    jacobi: bool = False,
) -> KrylovResult:
    """MINRES on a batched SYMMETRIC (possibly indefinite) system —
    saddle-point/KKT matrices, shifted systems ``A − σI``.  Input is
    symmetrized first.  ``jacobi=True`` preconditions by SYMMETRIC
    diagonal scaling ``D^{-1/2} A D^{-1/2}`` with ``D = |diag(A)|``
    (plain left-Jacobi would destroy the symmetry MINRES needs)."""
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    a = 0.5 * (a + jnp.swapaxes(a, 1, 2))
    b = b.astype(a.dtype)
    if jacobi:
        d = jnp.sqrt(
            jnp.maximum(
                jnp.abs(jnp.diagonal(a, axis1=1, axis2=2)),
                jnp.finfo(a.dtype).tiny,
            )
        )
        a_s = a / (d[:, :, None] * d[:, None, :])
        r = minres_matvec(_mv_dense(a_s), b / d, tol=tol,
                          max_iters=max_iters)
        # Report the TRUE residual of the ORIGINAL system (the scaled
        # recurrence residual is for D^{-1/2}AD^{-1/2}y = D^{-1/2}b and
        # can disagree with ||b - Ax||/||b|| for badly scaled rows) —
        # matching the cg/bicgstab honesty contract.
        x = r.x / d
        eff_tol = (
            100.0 * float(jnp.finfo(a.dtype).eps) if tol is None else tol
        )
        bnorm = jnp.maximum(_nrm(b), jnp.finfo(a.dtype).tiny)
        resnorm = _nrm(b - _mv_dense(a)(x)) / bnorm
        return KrylovResult(
            x, resnorm <= 4.0 * eff_tol, r.iters, resnorm
        )
    return minres_matvec(_mv_dense(a), b, tol=tol, max_iters=max_iters)


@functools.partial(jax.jit, static_argnames=("max_iters",))
@f32_matmuls
def lsqr_batched(
    a: jax.Array,
    b: jax.Array,
    tol: Optional[float] = None,
    max_iters: int = 0,
    damp: float = 0.0,
) -> LSQRResult:
    """LSQR on a batched RECTANGULAR system ``[B, m, n]``: the
    ITERATIVE counterpart of ``ops.lstsq.lstsq_batched`` — minimizes
    ``‖Ax − b‖² + damp²‖x‖²`` without forming ``AᵀA`` (condition κ,
    not κ², per iteration).  For m < n with ``damp=0`` this converges
    to the minimum-norm solution (x stays in range(Aᵀ) throughout)."""
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    n = a.shape[2]
    mv = lambda v: jnp.einsum("bij,bj->bi", a, v, precision=_HIGH)
    rmv = lambda u: jnp.einsum("bij,bi->bj", a, u, precision=_HIGH)
    return lsqr_matvec(
        mv, rmv, b, n, tol=tol, max_iters=max_iters, damp=damp
    )
