"""Batched matrix functions: expm/sqrtm/logm/powm (general + SPD).

No counterpart in the reference (exact scalar domain); these round out
the dense production surface.  TPU-first shapes:

- ``expm_batched`` — the scaling-and-squaring [13/13] Padé scheme
  (Higham 2005, the scipy/LAPACK standard): everything is batched
  GEMMs plus ONE batched solve; the data-dependent squaring count is
  handled with a per-lane scale ``2^{-s_b}`` and a fixed-trip squaring
  loop that re-squares only lanes with remaining steps (jit-static
  control flow, per-lane ``where``).
- ``sqrtm_batched`` — GENERAL principal square root via the coupled
  Denman–Beavers iteration with determinantal scaling: each step is
  two batched inverses + elementwise work (no QR/Schur), quadratically
  convergent for any matrix with no eigenvalues on the closed negative
  real axis.  The coupled form also yields ``A^{-1/2}`` for free.
- ``logm_batched`` — GENERAL principal logarithm via inverse scaling
  and squaring (Higham 2008 ch. 11): take per-lane square roots until
  ``‖A^{1/2^s} − I‖₁ ≤ θ``, evaluate the [7/7] Padé approximant of
  ``log(I + E)`` in Gauss–Legendre partial-fraction form (7 batched
  solves), and scale back by ``2^s`` per lane.
- ``powm_batched`` — general real power ``A^p = expm(p · logm A)``.
- ``cosm/sinm/tanm`` — ONE 2n expm of the skew embedding
  ``[[0, A], [−A, 0]]`` yields cos AND sin (Euler without complex
  arithmetic); ``coshm/sinhm/tanhm`` from one stacked-batch expm.
- ``funm_batched`` — arbitrary analytic ``f`` via the complex
  eigendecomposition ``V f(Λ) V⁻¹`` with an honest per-lane
  reconstruction residual (the κ(V) sensitivity made visible).
- ``sqrtm_spd_batched`` / ``logm_spd_batched`` / ``powm_spd_batched``
  — cheaper spectral forms for symmetric positive (semi-)definite
  input through one ``eigh`` (exactly orthogonal basis, so
  ``f(A) = V f(Λ) Vᵀ`` is backward stable); the general entry points
  above handle the non-normal case.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST

#: [13/13] Padé coefficients for exp (Higham 2005, Table 10.4 scheme).
_PADE13 = (
    64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
    1187353796428800.0, 129060195264000.0, 10559470521600.0,
    670442572800.0, 33522128640.0, 1323241920.0, 40840800.0,
    960960.0, 16380.0, 182.0, 1.0,
)

#: θ₁₃ — below this 1-norm the unscaled [13/13] approximant is at
#: double-precision accuracy (f32 is comfortably inside).
_THETA13 = 4.25

#: squaring-count cap.  NOTE the f32 accuracy wall: each squaring
#: doubles the relative error, so after s squarings the result carries
#: ~2^s·eps — beyond s ≈ 24 (‖A‖₁ ≳ θ·2²⁴ ≈ 7e7) the chain amplifies
#: roundoff to O(1) and typically overflows to inf/nan (self-signaling,
#: never silently wrong).  Large-norm exponentials need f64 (run on
#: CPU under jax.enable_x64 — the code is dtype-generic) or an
#: eigenbasis method for normal matrices.
_MAX_SQUARINGS = 64


def _mm(x, y):
    return jnp.einsum("bij,bjk->bik", x, y, precision=_HIGH)


@jax.jit
@f32_matmuls
def expm_batched(a: jax.Array) -> jax.Array:
    """Matrix exponential of a batched [B, n, n] real matrix.

    DIFFERENTIABLE: carries a custom VJP through the Fréchet
    derivative — the adjoint of ``E ↦ L(A, E)`` under the Frobenius
    pairing is ``G ↦ L(Aᵀ, G)`` (Higham 2008, Thm. 10.17 real case),
    computed by :func:`expm_frechet_batched` as one 2n×2n block
    exponential.  The primal's per-lane squaring ``while_loop`` is
    never reverse-differentiated."""
    return _expm_core(a)


@jax.custom_vjp
def _expm_core(a: jax.Array) -> jax.Array:
    return _expm_impl(a)


def _expm_fwd(a):
    return _expm_impl(a), a


def _expm_bwd(a, g):
    at = jnp.swapaxes(a, 1, 2)
    return (expm_frechet_batched(at, g).L.astype(a.dtype),)


_expm_core.defvjp(_expm_fwd, _expm_bwd)


@f32_matmuls
def _expm_impl(a: jax.Array) -> jax.Array:
    B, n, _ = a.shape
    dtype = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(dtype)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (B, n, n))

    # Per-lane squaring count s: ‖A/2^s‖₁ ≤ θ₁₃.
    norm1 = jnp.max(jnp.sum(jnp.abs(a), axis=1), axis=1)
    s = jnp.ceil(
        jnp.log2(jnp.maximum(norm1 / _THETA13, 1.0))
    ).astype(jnp.int32)
    s = jnp.minimum(s, _MAX_SQUARINGS)
    x = a * jnp.exp2(-s.astype(dtype))[:, None, None]

    b = _PADE13
    x2 = _mm(x, x)
    x4 = _mm(x2, x2)
    x6 = _mm(x2, x4)
    # U = X(b13·X6 + b11·X4 + b9·X2)·X6 + X(b7·X6 + b5·X4 + b3·X2 + b1·I)
    w1 = b[13] * x6 + b[11] * x4 + b[9] * x2
    w2 = b[7] * x6 + b[5] * x4 + b[3] * x2 + b[1] * eye
    U = _mm(x, _mm(x6, w1) + w2)
    # V = (b12·X6 + b10·X4 + b8·X2)·X6 + b6·X6 + b4·X4 + b2·X2 + b0·I
    z1 = b[12] * x6 + b[10] * x4 + b[8] * x2
    V = _mm(x6, z1) + b[6] * x6 + b[4] * x4 + b[2] * x2 + b[0] * eye
    # r = (V − U)⁻¹ (V + U)
    r = jnp.linalg.solve(V - U, V + U)

    # Undo the scaling: square lanes with remaining steps.  The trip
    # count is the per-batch max (dynamic — while_loop allows it), so
    # typical inputs pay only their own handful of GEMMs.
    s_max = jnp.max(s)

    def cond(st):
        k, _ = st
        return k < s_max

    def body(st):
        k, r = st
        r2 = _mm(r, r)
        return k + 1, jnp.where((k < s)[:, None, None], r2, r)

    _, r = lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), r))
    return r


class SqrtmResult(NamedTuple):
    """``Y ≈ A^{1/2}`` (principal), ``Yinv ≈ A^{-1/2}``, per-lane
    ``converged``, and the Newton steps executed."""

    Y: jax.Array
    Yinv: jax.Array
    converged: jax.Array
    iters: jax.Array


class LogmResult(NamedTuple):
    """``L ≈ log A`` (principal), per-lane ``converged``, and the
    per-lane inverse-scaling square-root counts ``roots``."""

    L: jax.Array
    converged: jax.Array
    roots: jax.Array


def _db_sqrt(a: jax.Array, max_iters: int):
    """Coupled Denman–Beavers iteration with determinantal scaling.

    Y ← (μY + (μZ)⁻¹)/2,  Z ← (μZ + (μY)⁻¹)/2,
    μ = |det Y · det Z|^{-1/(2n)}.

    Y → A^{1/2}, Z → A^{-1/2} quadratically for any A with no
    eigenvalues on the closed negative real axis.  Each step is two
    batched inverses + elementwise work — all MXU-friendly.  Converged
    lanes freeze (further steps only stir roundoff).
    """
    B, n, _ = a.shape
    dtype = a.dtype
    eps = float(jnp.finfo(dtype).eps)
    eye = jnp.eye(n, dtype=dtype)
    anorm = jnp.maximum(
        jnp.max(jnp.abs(a), axis=(1, 2)), jnp.finfo(dtype).tiny
    )

    def relchange(Y_new, Y):
        num = jnp.max(jnp.abs(Y_new - Y), axis=(1, 2))
        den = jnp.maximum(jnp.max(jnp.abs(Y_new), axis=(1, 2)), 1e-30)
        return num / den

    def cond(st):
        _, _, k, done = st
        return (k < max_iters) & ~jnp.all(done)

    def body(st):
        Y, Z, k, done = st
        sy, ly = jnp.linalg.slogdet(Y)
        sz, lz = jnp.linalg.slogdet(Z)
        mu = jnp.exp(-(ly + lz) / (2.0 * n))
        mu = jnp.where(jnp.isfinite(mu) & (mu > 0), mu, 1.0)
        mu = mu[:, None, None]
        Yinv = jnp.linalg.inv(mu * Y)
        Zinv = jnp.linalg.inv(mu * Z)
        Y_new = 0.5 * (mu * Y + Zinv)
        Z_new = 0.5 * (mu * Z + Yinv)
        done_new = done | (relchange(Y_new, Y) <= 100.0 * eps)
        Y = jnp.where(done[:, None, None], Y, Y_new)
        Z = jnp.where(done[:, None, None], Z, Z_new)
        return Y, Z, k + 1, done_new

    Y0 = a
    Z0 = jnp.broadcast_to(eye, (B, n, n))
    done0 = jnp.zeros((B,), bool)
    Y, Z, k, _ = lax.while_loop(
        cond, body, (Y0, Z0, jnp.zeros((), jnp.int32), done0)
    )
    resid = jnp.max(jnp.abs(_mm(Y, Y) - a), axis=(1, 2)) / anorm
    converged = resid <= 1e3 * n * eps
    return Y, Z, converged, k


@functools.partial(jax.jit, static_argnames=("max_iters",))
@f32_matmuls
def sqrtm_batched(a: jax.Array, max_iters: int = 50) -> SqrtmResult:
    """Principal square root of a GENERAL batched [B, n, n] real matrix
    with no eigenvalues on the closed negative real axis (the scipy
    ``sqrtm`` domain restricted to the principal branch; SPD callers
    should prefer :func:`sqrtm_spd_batched`).  The coupled iteration
    returns ``A^{-1/2}`` at no extra cost."""
    dtype = jnp.result_type(a.dtype, jnp.float32)
    Y, Z, conv, k = _db_sqrt(a.astype(dtype), max_iters)
    return SqrtmResult(Y, Z, conv, k)


#: [7/7] Padé of log(1+x) in Gauss–Legendre partial-fraction form:
#: log(I+E) ≈ Σ wᵢ E (I + tᵢ E)⁻¹ with (tᵢ, wᵢ) the m-point GL rule on
#: [0, 1].  θ = 0.25 keeps the [7/7] error below double-precision eps
#: (Higham 2008, Table 11.1: θ₇ ≈ 0.264).
_LOGM_THETA = 0.25
_LOGM_NODES, _LOGM_WEIGHTS = (
    lambda xw: ((xw[0] + 1.0) / 2.0, xw[1] / 2.0)
)(np.polynomial.legendre.leggauss(7))


@functools.partial(jax.jit, static_argnames=("max_roots", "max_iters"))
@f32_matmuls
def logm_batched(
    a: jax.Array, max_roots: int = 24, max_iters: int = 50
) -> LogmResult:
    """Principal logarithm of a GENERAL batched real matrix with no
    eigenvalues on the closed negative real axis, via inverse scaling
    and squaring: per-lane repeated Denman–Beavers square roots until
    ``‖A^{1/2^s} − I‖₁ ≤ θ``, a [7/7] Gauss–Legendre Padé evaluation
    (7 batched solves), then ``L = 2^s · log(A^{1/2^s})``.  SPD callers
    should prefer :func:`logm_spd_batched` (one eigh, no iteration)."""
    B, n, _ = a.shape
    dtype = jnp.result_type(a.dtype, jnp.float32)
    X0 = a.astype(dtype)
    eye = jnp.eye(n, dtype=dtype)

    def dist1(X):
        return jnp.max(jnp.sum(jnp.abs(X - eye), axis=1), axis=1)

    def cond(st):
        X, s, k, ok = st
        return (k < max_roots) & jnp.any(
            ok & (dist1(X) > _LOGM_THETA)
        )

    def body(st):
        X, s, k, ok = st
        active = ok & (dist1(X) > _LOGM_THETA)
        Y, _, conv, _ = _db_sqrt(X, max_iters)
        X = jnp.where(active[:, None, None], Y, X)
        ok = ok & (conv | ~active)
        return X, s + active.astype(jnp.int32), k + 1, ok

    ok0 = jnp.ones((B,), bool)
    X, s, _, ok = lax.while_loop(
        cond, body,
        (X0, jnp.zeros((B,), jnp.int32), jnp.zeros((), jnp.int32), ok0),
    )
    ok = ok & (dist1(X) <= _LOGM_THETA)

    E = X - eye
    L = jnp.zeros_like(E)
    for t, w in zip(_LOGM_NODES, _LOGM_WEIGHTS):
        L = L + dtype.type(w) * _mm(
            E, jnp.linalg.inv(eye + dtype.type(t) * E)
        )
    L = L * jnp.exp2(s.astype(dtype))[:, None, None]
    return LogmResult(L, ok, s)


@functools.partial(jax.jit, static_argnames=("max_roots", "max_iters"))
@f32_matmuls
def powm_batched(
    a: jax.Array, p: float, max_roots: int = 24, max_iters: int = 50
):
    """General real matrix power ``A^p = expm(p · log A)`` (principal
    branch; same domain as :func:`logm_batched`).  Returns ``(A^p,
    converged)``.  SPD callers should prefer :func:`powm_spd_batched`."""
    res = logm_batched(a, max_roots=max_roots, max_iters=max_iters)
    return expm_batched(p * res.L), res.converged


def _spd_spectral(a: jax.Array, f, floor: float):
    from .symmetric import eigh_batched

    res = eigh_batched(a)
    w = jnp.maximum(res.w, floor)
    fw = f(w)
    return jnp.einsum(
        "bik,bk,bjk->bij", res.V, fw, res.V, precision=_HIGH
    )


@jax.jit
@f32_matmuls
def sqrtm_spd_batched(a: jax.Array) -> jax.Array:
    """Principal square root of symmetric PSD batches (eigh spectral
    form; negative roundoff eigenvalues clamped to 0)."""
    return _spd_spectral(a, jnp.sqrt, 0.0)


@jax.jit
@f32_matmuls
def logm_spd_batched(a: jax.Array) -> jax.Array:
    """Matrix logarithm of symmetric POSITIVE DEFINITE batches."""
    tiny = float(jnp.finfo(jnp.float32).tiny)
    return _spd_spectral(a, jnp.log, tiny)


@functools.partial(jax.jit, static_argnames=("p",))
@f32_matmuls
def powm_spd_batched(a: jax.Array, p: float) -> jax.Array:
    """Real matrix power ``A^p`` of symmetric PSD batches (e.g. the
    inverse square root p = −1/2 used for whitening)."""
    floor = 0.0 if p >= 0 else float(jnp.finfo(jnp.float32).tiny)
    return _spd_spectral(a, lambda w: jnp.power(w, p), floor)


@jax.jit
@f32_matmuls
def cosm_sinm_batched(a: jax.Array):
    """Matrix cosine AND sine of a batched [B, n, n] real matrix from
    ONE matrix exponential: for the skew embedding
    ``M = [[0, A], [−A, 0]]`` (which is ``A ⊗ [[0,1],[−1,0]]``, so the
    blocks commute), ``expm(M) = [[cos A, sin A], [−sin A, cos A]]``
    exactly — Euler's formula without any complex arithmetic.  One
    2n×2n ``expm_batched`` call (8× the flops of one n expm) buys both
    functions with expm's backward stability; no eigendecomposition,
    no diagonalizability assumption.  Returns ``(cos A, sin A)``."""
    B, n, _ = a.shape
    dtype = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(dtype)
    z = jnp.zeros_like(a)
    top = jnp.concatenate([z, a], axis=2)
    bot = jnp.concatenate([-a, z], axis=2)
    E = expm_batched(jnp.concatenate([top, bot], axis=1))
    return E[:, :n, :n], E[:, :n, n:]


def cosm_batched(a: jax.Array) -> jax.Array:
    """Matrix cosine (see :func:`cosm_sinm_batched`)."""
    return cosm_sinm_batched(a)[0]


def sinm_batched(a: jax.Array) -> jax.Array:
    """Matrix sine (see :func:`cosm_sinm_batched`)."""
    return cosm_sinm_batched(a)[1]


@jax.jit
@f32_matmuls
def tanm_batched(a: jax.Array) -> jax.Array:
    """Matrix tangent ``cos(A)⁻¹ sin(A)`` (undefined when cos A is
    singular, i.e. A has an eigenvalue at an odd multiple of π/2 —
    the solve then returns inf/nan, self-signaling)."""
    c, s = cosm_sinm_batched(a)
    return jnp.linalg.solve(c, s)


@jax.jit
@f32_matmuls
def coshm_sinhm_batched(a: jax.Array):
    """Matrix cosh AND sinh: ``(expm(A) ± expm(−A)) / 2``, with the two
    exponentials computed in ONE batched ``expm`` call on the stacked
    ``[2B]`` batch (same MXU utilisation, half the dispatches).
    Returns ``(cosh A, sinh A)``."""
    dtype = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(dtype)
    E = expm_batched(jnp.concatenate([a, -a], axis=0))
    B = a.shape[0]
    ep, en = E[:B], E[B:]
    return 0.5 * (ep + en), 0.5 * (ep - en)


def coshm_batched(a: jax.Array) -> jax.Array:
    """Matrix hyperbolic cosine (see :func:`coshm_sinhm_batched`)."""
    return coshm_sinhm_batched(a)[0]


def sinhm_batched(a: jax.Array) -> jax.Array:
    """Matrix hyperbolic sine (see :func:`coshm_sinhm_batched`)."""
    return coshm_sinhm_batched(a)[1]


@jax.jit
@f32_matmuls
def tanhm_batched(a: jax.Array) -> jax.Array:
    """Matrix hyperbolic tangent ``cosh(A)⁻¹ sinh(A)``."""
    c, s = coshm_sinhm_batched(a)
    return jnp.linalg.solve(c, s)


class FunmResult(NamedTuple):
    """General matrix function ``f(A) = V f(Λ) V⁻¹``.

    ``F``        — the (real part of the) result; for real input and a
                   conjugate-symmetric ``f`` (``f(conj z) = conj f(z)``,
                   true of every real-analytic function) the exact
                   result is real and ``imag_max`` is pure roundoff.
    ``imag_max`` — per-lane max |Im f(A)| (diagnostic; large values
                   mean a non-conjugate-symmetric ``f``).
    ``resid``    — per-lane relative reconstruction error
                   ``‖V Λ V⁻¹ − A‖_max / ‖A‖_max``: the honest quality
                   measure of the diagonalization itself (it grows with
                   κ(V), i.e. near-defective A — exactly when the
                   eigenbasis method loses accuracy).
    ``ok``       — converged & all columns valid & ``resid`` at the
                   f32 floor."""

    F: jax.Array         # [B, n, n]
    imag_max: jax.Array  # [B]
    resid: jax.Array     # [B]
    ok: jax.Array        # [B]


def funm_batched(a: jax.Array, f) -> FunmResult:
    """Apply an arbitrary analytic scalar function to a batched GENERAL
    real matrix through the complex eigendecomposition:
    ``A = V Λ V⁻¹  ⇒  f(A) = V f(Λ) V⁻¹`` (non-normal counterpart of
    the reference's eigenvalue pipeline, `linalg.py:833-863`, applied
    to scalar functions instead of diagonalization reports).

    ``f`` receives a COMPLEX [B, n] eigenvalue array (elementwise jnp
    complex math is fine on TPU — only matmuls need the real kernels)
    and must be analytic on the spectrum.  Eigenbasis methods are only
    as good as κ(V): ``resid`` reports the lane-wise reconstruction
    error, and near-defective input should use the specialised routines
    (``expm/sqrtm/logm/powm_batched`` — Padé/Newton, no eigenbasis).

    Not jittable as-is (the eigensolver's host-chunked driver); wrap
    shapes you care about, or call inside your own pipeline stage.
    """
    from .complexlin import _cmatmul, inverse_complex_batched
    from .schur import eig_batched

    dtype = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(dtype)
    r = eig_batched(a)
    lam = jax.lax.complex(r.real, r.imag)
    fd = f(lam)
    fr = jnp.real(fd).astype(dtype)
    fi = jnp.imag(fd).astype(dtype)

    vinv_re, vinv_im = inverse_complex_batched(
        r.vectors_real, r.vectors_imag
    )
    # W = V·diag(f(λ)) — column scaling in complex arithmetic.
    w_re = r.vectors_real * fr[:, None, :] - r.vectors_imag * fi[:, None, :]
    w_im = r.vectors_real * fi[:, None, :] + r.vectors_imag * fr[:, None, :]
    F_re, F_im = _cmatmul(w_re, w_im, vinv_re, vinv_im)

    # Reconstruction diagnostic with the SAME V, V⁻¹: f = identity.
    z_re = r.vectors_real * r.real[:, None, :] \
        - r.vectors_imag * r.imag[:, None, :]
    z_im = r.vectors_real * r.imag[:, None, :] \
        + r.vectors_imag * r.real[:, None, :]
    A_re, A_im = _cmatmul(z_re, z_im, vinv_re, vinv_im)
    anorm = jnp.maximum(jnp.max(jnp.abs(a), axis=(1, 2)), 1e-30)
    resid = jnp.max(
        jnp.abs(A_re - a) + jnp.abs(A_im), axis=(1, 2)
    ) / anorm
    imag_max = jnp.max(jnp.abs(F_im), axis=(1, 2))
    n = a.shape[-1]
    eps = float(jnp.finfo(dtype).eps)
    ok = (
        r.converged
        & jnp.all(r.valid, axis=1)
        & (resid <= 1e3 * n * eps)
    )
    return FunmResult(F_re, imag_max, resid, ok)


class ExpmFrechetResult(NamedTuple):
    """``expm(A)`` and the Fréchet derivative ``L(A, E)`` (the
    directional derivative of ``expm`` at ``A`` along ``E``)."""

    expm: jax.Array  # [B, n, n]
    L: jax.Array     # [B, n, n]


@jax.jit
@f32_matmuls
def expm_frechet_batched(a: jax.Array, e: jax.Array) -> ExpmFrechetResult:
    """Fréchet derivative of the matrix exponential along ``E`` via the
    block-triangular embedding (Higham 2008, eq. (10.40) — the scipy
    ``expm_frechet`` identity):

        expm([[A, E], [0, A]]) = [[expm A,  L(A, E)], [0,  expm A]].

    ONE 2n×2n :func:`expm_batched` call (8× one expm's flops — all
    GEMMs) buys the exponential AND its derivative, with expm's
    backward stability and no eigendecomposition.  ``E`` is pre-scaled
    to ``‖A‖``-size inside the embedding (``L`` is linear in ``E``) so
    a large or tiny perturbation cannot distort the per-lane squaring
    counts.

    The derivative drives perturbation analysis (``expm(A + E) ≈
    expm(A) + L(A, E)``), condition estimation
    (:func:`expm_cond_batched`), and gradients of dynamics
    ``x' = A x`` with respect to ``A``.
    """
    B, n, _ = a.shape
    dtype = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(dtype)
    e = e.astype(dtype)
    anorm = jnp.max(jnp.abs(a), axis=(1, 2))
    enorm = jnp.max(jnp.abs(e), axis=(1, 2))
    # Scale E to ~‖A‖ (linearity: L(A, cE) = c·L(A, E)).  Zero-E lanes
    # keep c=1 (L is exactly 0 there anyway).
    c = jnp.where(
        (enorm > 0) & (anorm > 0), enorm / jnp.maximum(anorm, 1e-30), 1.0
    )
    c = jnp.maximum(c, jnp.finfo(dtype).tiny)
    es = e / c[:, None, None]
    z = jnp.zeros_like(a)
    top = jnp.concatenate([a, es], axis=2)
    bot = jnp.concatenate([z, a], axis=2)
    EM = expm_batched(jnp.concatenate([top, bot], axis=1))
    return ExpmFrechetResult(
        expm=EM[:, :n, :n], L=EM[:, :n, n:] * c[:, None, None]
    )


@functools.partial(jax.jit, static_argnames=("iters",))
@f32_matmuls
def expm_cond_batched(a: jax.Array, iters: int = 6, key=None):
    """Relative condition number of the matrix exponential in the
    Frobenius norm, ``κ_exp(A) = ‖L(A)‖_F · ‖A‖_F / ‖expm A‖_F``
    (the scipy ``expm_cond`` quantity).

    ``‖L(A)‖_F`` — the operator norm of ``E ↦ L(A, E)`` — is estimated
    by power iteration on ``L(Aᵀ, ·) ∘ L(A, ·)``: the Fréchet operator's
    adjoint under the Frobenius inner product is the Fréchet operator
    of ``Aᵀ`` (Higham 2008, Thm. 10.17, real case), so each iteration
    is two block-embedded exponentials.  A handful of iterations gives
    the usual 1-in-a-few power-iteration accuracy — condition numbers
    are order-of-magnitude quantities.

    Returns ``(kappa, opnorm)`` per lane.
    """
    B, n, _ = a.shape
    dtype = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    E = jax.random.normal(key, (B, n, n), dtype)

    def fro(x):
        return jnp.sqrt(jnp.sum(x * x, axis=(1, 2)))

    at = jnp.swapaxes(a, 1, 2)

    def step(_, carry):
        E, sig = carry
        E = E / jnp.maximum(fro(E), 1e-30)[:, None, None]
        W = expm_frechet_batched(a, E).L
        sig = fro(W)  # ‖L(A, E)‖_F with ‖E‖_F = 1: → ‖L(A)‖ from below
        E = expm_frechet_batched(at, W).L
        return E, sig

    _, opnorm = lax.fori_loop(
        0, iters, step, (E, jnp.zeros((B,), dtype))
    )
    ea = expm_batched(a)
    kappa = opnorm * fro(a) / jnp.maximum(fro(ea), 1e-30)
    return kappa, opnorm


class ExpmvResult(NamedTuple):
    """``x ≈ expm(t·A) v``.  ``segments`` is the per-lane scaling count
    actually used; ``ok=False`` marks lanes whose norm bound demanded
    more than ``max_segments`` (the result there is a truncated-time
    propagation — accurate for ``t · max_segments / segments_needed``)."""

    x: jax.Array         # [B, n]
    segments: jax.Array  # [B] i32
    ok: jax.Array        # [B] bool


def expm_multiply_matvec(
    matvec,
    v: jax.Array,
    norm_bound: jax.Array,
    t: float = 1.0,
    taylor_m: int = 12,
    max_segments: int = 4096,
) -> ExpmvResult:
    """Action ``expm(t·A) v`` WITHOUT forming ``expm`` (Al-Mohy–Higham
    2011 style scaling + truncated Taylor): split ``t`` into ``s``
    segments with ``‖t·A‖/s ≤ 1`` and apply the degree-``taylor_m``
    Taylor polynomial of each segment by ``taylor_m`` matvecs.

    O(s · taylor_m) matvecs total — for operators too large to densify
    (the dense counterpart is ``expm_batched @ v``).  ``norm_bound``
    ``[B]`` must upper-bound ``‖A‖`` per lane (any norm; looser bounds
    only cost extra segments, never accuracy).  With ``‖B‖ ≤ 1`` the
    degree-12 remainder is ≤ e/13! ≈ 4e-10 — below f32 resolution.
    Lanes finish at their own ``s`` and freeze (per-lane masking, one
    global while loop of the batch maximum).
    """
    dtype = jnp.result_type(v.dtype, jnp.float32)
    v = v.astype(dtype)
    B = v.shape[0]
    need = jnp.ceil(jnp.abs(t) * norm_bound).astype(jnp.int32)
    s = jnp.clip(need, 1, max_segments)
    ok = need <= max_segments
    h = t / s.astype(dtype)  # [B] per-lane segment step

    def taylor(w):
        def term_step(j, carry):
            term, acc = carry
            term = matvec(term) * (h / j.astype(dtype))[:, None]
            return term, acc + term

        _, acc = jax.lax.fori_loop(
            1, taylor_m + 1, term_step, (w, w)
        )
        return acc

    def cond(carry):
        _, seg = carry
        return jnp.any(seg < s)

    def body(carry):
        w, seg = carry
        active = (seg < s)[:, None]
        return jnp.where(active, taylor(w), w), seg + 1

    x, _ = jax.lax.while_loop(
        cond, body, (v, jnp.zeros((B,), jnp.int32))
    )
    return ExpmvResult(x=x.astype(v.dtype), segments=s, ok=ok)


@functools.partial(
    jax.jit, static_argnames=("t", "taylor_m", "max_segments")
)
@f32_matmuls
def expm_multiply_batched(
    a: jax.Array,
    v: jax.Array,
    t: float = 1.0,
    taylor_m: int = 12,
    max_segments: int = 4096,
) -> ExpmvResult:
    """Dense-matrix wrapper for ``expm_multiply_matvec``: exact batched
    1-norm, batched GEMV matvec.  Beats ``expm_batched`` whenever only
    the action on a few vectors is needed (O(s·m·n²) vs O(n³) with a
    large Padé constant)."""
    norm1 = jnp.max(jnp.sum(jnp.abs(a), axis=1), axis=1)  # [B]

    def matvec(w):
        return jnp.einsum("bij,bj->bi", a, w, precision=_HIGH)

    return expm_multiply_matvec(
        matvec, v, norm1, t=t, taylor_m=taylor_m,
        max_segments=max_segments,
    )
