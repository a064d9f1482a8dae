"""Batched least-squares / minimum-norm solves (full-rank rectangular).

The reference's solver family handles exact arithmetic only: an
inconsistent system is reported as ``NoSolution`` (reference
linalg.py:632-680,913-934) because over the rationals "closest
solution" is not defined.  A floating-point device framework needs the
numerical counterpart: for overdetermined full-column-rank systems the
least-squares minimizer, for underdetermined full-row-rank systems the
minimum-norm solution.  (Rank-deficient systems stay with
``dispatch.affine_solve_batched`` — padded solution SETS, the exact
path's semantics.)

TPU-first design: no sequential per-column Householder loop.  The
factorization is shifted CholeskyQR2 (two passes restore the single
pass's κ² conditioning loss; everything is batched GEMMs + batched
``cholesky`` + triangular solves, all MXU work), followed by
``ir_steps`` rounds of residual refinement through the SAME Q/R,
which tightens the remaining Gram-factorization bias on
ill-conditioned input (measured at a κ=1e3 tall system: relative
error 4.6e-6 → 2.6e-6, both already under the κ·eps forward bound;
working-precision refinement cannot cross that floor).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


class LstsqResult(NamedTuple):
    x: jax.Array         # [B, n] or [B, n, k] — minimizer / min-norm
    resid: jax.Array     # [B] or [B, k] ‖a@x − b‖₂ (0 when consistent)
    ok: jax.Array        # [B] Gram factorization succeeded (full rank
    #                      within the shift's resolution; False lanes
    #                      carry NaNs — route them to affine_solve)


def _chol_qr2_tall(a: jax.Array):
    """Shifted CholeskyQR2 of a tall [B, m, n] batch (m ≥ n):
    returns (Q [B, m, n] orthonormal, R [B, n, n] upper, ok [B])."""
    B, m, n = a.shape
    eps = float(jnp.finfo(a.dtype).eps)
    eye = jnp.eye(n, dtype=a.dtype)

    def one_pass(g, shift):
        gram = jnp.einsum("bji,bjk->bik", g, g, precision=_HIGH)
        if shift:
            scale = jnp.trace(gram, axis1=1, axis2=2)[:, None, None]
            gram = gram + shift * scale * eye[None]
        L = jnp.linalg.cholesky(gram)
        qt = jax.scipy.linalg.solve_triangular(
            L, jnp.swapaxes(g, -1, -2), lower=True
        )
        return jnp.swapaxes(qt, -1, -2), L

    # Column pre-scaling bounds the shifted pass's Gram condition.
    norms = jnp.sqrt(jnp.sum(a * a, axis=1))
    d = jnp.maximum(norms, 1e-30)
    a_s = a / d[:, None, :]
    Q, L1 = one_pass(a_s, 16.0 * max(m, n) * eps)
    Q, L2 = one_pass(Q, 0.0)
    ok = jnp.all(jnp.isfinite(Q), axis=(1, 2))
    # a = Q · R with R = L2ᵀ L1ᵀ · diag(d).
    R = jnp.einsum(
        "bji,bkj->bik", L2, L1, precision=_HIGH
    ) * d[:, None, :]
    return Q, R, ok


@functools.partial(jax.jit, static_argnames=("ir_steps",))
@f32_matmuls
def lstsq_batched(
    a: jax.Array, b: jax.Array, ir_steps: int = 1
) -> LstsqResult:
    """Least-squares / minimum-norm solve of a full-rank batch.

    ``a [B, m, n]``, ``b [B, m]`` or ``[B, m, k]``:

    - m ≥ n (overdetermined): x = argmin ‖a@x − b‖₂ via CholeskyQR2
      (x = R⁻¹Qᵀb) + ``ir_steps`` residual-refinement rounds.
    - m < n (underdetermined): the minimum-norm solution
      x = Qᵣ Rᵣ⁻ᵀ b from the same factorization applied to aᵀ = QᵣRᵣ
      (then x ∈ range(aᵀ), the normal-equations characterization of
      minimum norm), refined the same way.

    Square full-rank input degenerates to an ordinary solve (prefer
    ``dispatch.solve_batched`` — LU is cheaper).

    DIFFERENTIABLE: ``x`` carries a custom VJP with the exact
    full-rank adjoints (Golub–Pereyra), reusing the saved triangular
    Gram factor — least-squares: ``z = (AᵀA)⁻¹x̄``, ``b̄ = A z``,
    ``Ā = r zᵀ − (A z) xᵀ`` with ``r = b − A x``; minimum-norm:
    ``u = (AAᵀ)⁻¹A x̄``, ``b̄ = u``, ``Ā = w (x̄ − Aᵀu)ᵀ − u xᵀ`` with
    ``w = (AAᵀ)⁻¹ b``.  ``resid``/``ok`` are plain compositions of
    ``x`` and differentiate through it.
    """
    B, m, n = a.shape
    vector_input = b.ndim == 2
    b3 = b[:, :, None] if vector_input else b
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    b3 = b3.astype(f32)

    x = _lstsq_x(a, b3, ir_steps)
    final = b3 - jnp.einsum("bij,bjk->bik", a, x, precision=_HIGH)
    resid = jnp.sqrt(jnp.sum(final * final, axis=1))   # [B, k]
    ok = jnp.all(jnp.isfinite(x), axis=(1, 2))
    if vector_input:
        return LstsqResult(x[:, :, 0], resid[:, 0], ok)
    return LstsqResult(x, resid, ok)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lstsq_x(a, b3, ir_steps):
    x, _ = _lstsq_x_impl(a, b3, ir_steps)
    return x


def _lstsq_x_fwd(a, b3, ir_steps):
    x, R = _lstsq_x_impl(a, b3, ir_steps)
    return x, (a, b3, x, R)


def _gram_solve(R, rhs):
    """(RᵀR)⁻¹ rhs from the saved upper-triangular Gram factor."""
    y = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(R, 1, 2), rhs, lower=True
    )
    return jax.scipy.linalg.solve_triangular(R, y, lower=False)


def _lstsq_x_bwd(ir_steps, res, g):
    a, b3, x, R = res
    m, n = a.shape[-2], a.shape[-1]
    if m >= n:
        z = _gram_solve(R, g)                          # (AᵀA)⁻¹ x̄
        az = jnp.einsum("bij,bjk->bik", a, z, precision=_HIGH)
        r = b3 - jnp.einsum("bij,bjk->bik", a, x, precision=_HIGH)
        abar = (
            jnp.einsum("bik,bjk->bij", r, z, precision=_HIGH)
            - jnp.einsum("bik,bjk->bij", az, x, precision=_HIGH)
        )
        return abar.astype(a.dtype), az.astype(b3.dtype)
    ag = jnp.einsum("bij,bjk->bik", a, g, precision=_HIGH)   # A x̄
    u = _gram_solve(R, ag)                                   # (AAᵀ)⁻¹A x̄
    w = _gram_solve(R, b3)                                   # (AAᵀ)⁻¹ b
    atu = jnp.einsum("bji,bjk->bik", a, u, precision=_HIGH)  # Aᵀ u
    abar = (
        jnp.einsum("bik,bjk->bij", w, g - atu, precision=_HIGH)
        - jnp.einsum("bik,bjk->bij", u, x, precision=_HIGH)
    )
    return abar.astype(a.dtype), u.astype(b3.dtype)


_lstsq_x.defvjp(_lstsq_x_fwd, _lstsq_x_bwd)


def _lstsq_x_impl(a, b3, ir_steps):
    B, m, n = a.shape
    if m >= n:
        Q, R, ok = _chol_qr2_tall(a)

        def solve_ls(rhs):
            y = jnp.einsum("bji,bjk->bik", Q, rhs, precision=_HIGH)
            return jax.scipy.linalg.solve_triangular(
                R, y, lower=False
            )

        x = solve_ls(b3)
        for _ in range(ir_steps):
            r = b3 - jnp.einsum("bij,bjk->bik", a, x, precision=_HIGH)
            x = x + solve_ls(r)
    else:
        at = jnp.swapaxes(a, 1, 2)                     # [B, n, m]
        Q, R, ok = _chol_qr2_tall(at)                  # aᵀ = Q R

        def solve_mn(rhs):
            # a x = b with x = Q z:  (Rᵀ) z = b  (a Q = (QᵀaᵀQ)ᵀ... a Q = Rᵀ).
            z = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(R, 1, 2), rhs, lower=True
            )
            return jnp.einsum("bij,bjk->bik", Q, z, precision=_HIGH)

        x = solve_mn(b3)
        for _ in range(ir_steps):
            r = b3 - jnp.einsum("bij,bjk->bik", a, x, precision=_HIGH)
            x = x + solve_mn(r)

    return x, R


class QRResult(NamedTuple):
    """Thin QR ``a = Q @ R`` (Q [B, m, n] orthonormal columns,
    R [B, n, n] upper-triangular)."""

    Q: jax.Array
    R: jax.Array
    ok: jax.Array  # [B] factorization finite (full column rank within
    #                the shift's resolution)


def qr_batched(a: jax.Array) -> QRResult:
    """Thin QR of a batched [B, m, n] matrix with m ≥ n — shifted
    CholeskyQR2 (two Gram passes; all MXU work, no per-column
    Householder loop).  The explicitly-f32 replacement for
    ``jnp.linalg.qr``, which on TPU ignores the precision context
    (measured |QR−A| ≈ 7e-3 relative — see ops.eigen.householder_qr).

    DIFFERENTIABLE: custom VJP with the classical thin-QR adjoint for
    full-column-rank input: ``M = R R̄ᵀ − Q̄ᵀ Q``,
    ``Ā = (Q̄ + Q·copyltu(M)) R⁻ᵀ`` where ``copyltu`` mirrors the
    strict lower triangle onto the upper and keeps the diagonal."""
    B, m, n = a.shape
    if m < n:
        raise ValueError(
            f"qr_batched needs m >= n (thin QR); got {m}x{n}. "
            "Factor the transpose (a = (R^T)(Q^T)) for wide input."
        )
    return _qr_vjp(a)


@jax.custom_vjp
def _qr_vjp(a):
    return _qr_impl(a)


def _qr_fwd(a):
    r = _qr_impl(a)
    return r, (r.Q, r.R)


@f32_matmuls
def _qr_bwd(res, g):
    # f32_matmuls: solve_triangular's blocked matmuls would otherwise
    # run at the default TPU bf16 pass, making factorization gradients
    # ~1e-3 while primals are f32-exact (CLAUDE.md's documented trap).
    Q, R = res
    n = R.shape[-1]
    M = jnp.einsum("bij,bkj->bik", R, g.R, precision=_HIGH) - jnp.einsum(
        "bji,bjk->bik", g.Q, Q, precision=_HIGH
    )
    lo = jnp.tril(M, -1)
    copyltu = lo + jnp.swapaxes(lo, 1, 2) + M * jnp.eye(n, dtype=M.dtype)
    num = g.Q + jnp.einsum("bij,bjk->bik", Q, copyltu, precision=_HIGH)
    # Ā = num · R⁻ᵀ  ⇔  Āᵀ = R⁻¹ numᵀ (one triangular solve)
    abar_t = jax.scipy.linalg.solve_triangular(
        R, jnp.swapaxes(num, 1, 2), lower=False
    )
    return (jnp.swapaxes(abar_t, 1, 2),)


_qr_vjp.defvjp(_qr_fwd, _qr_bwd)


@jax.jit
@f32_matmuls
def _qr_impl(a: jax.Array) -> QRResult:
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    Q, R, ok = _chol_qr2_tall(a)
    return QRResult(Q, R, ok)


@jax.jit
@f32_matmuls
def complete_basis_batched(u: jax.Array) -> jax.Array:
    """Orthonormal complement of orthonormal columns ``u [B, m, k]``
    (k < m): returns ``[B, m, m-k]`` with ``[u | complement]`` an
    orthonormal basis of R^m.

    TPU-native construction — no Householder chain: project a fixed
    Gaussian block onto ``range(u)^⊥`` and orthonormalize with the
    shifted CholeskyQR2 pass (all MXU work); a second
    project+orthonormalize round pins both the orthogonality and the
    ``uᵀq = 0`` defect at the f32 floor.  The Gaussian block is full
    rank after projection with probability 1; a fixed seed keeps the
    result deterministic.  Serves ``linalg.svd(full_matrices=True)``
    (numpy pads U/V the same way up to sign)."""
    B, m, k = u.shape
    r = m - k
    f32 = jnp.result_type(u.dtype, jnp.float32)
    u = u.astype(f32)
    g = jax.random.normal(jax.random.PRNGKey(7), (m, r), f32)
    w = jnp.broadcast_to(g, (B, m, r))
    for _ in range(2):
        w = w - jnp.einsum(
            "bik,bkj->bij", u,
            jnp.einsum("bki,bkj->bij", u, w, precision=_HIGH),
            precision=_HIGH,
        )
        w, _, _ = _chol_qr2_tall(w)
    return w
