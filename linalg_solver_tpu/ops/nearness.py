"""Matrix nearness problems: nearest SPD, nearest correlation,
nearest orthogonal.

The "repair this matrix" family — covariance estimates assembled from
incomplete/async data are routinely indefinite, and downstream
Cholesky/whitening then fails.  All three solvers are batched MXU
work:

- ``nearest_psd_batched``: Higham (1988) — the Frobenius-nearest PSD
  matrix to A is ``(B + H)/2`` with ``B = sym(A)`` and ``H`` the polar
  factor of B, i.e. clip B's eigenvalues at 0.  One ``eigh`` per lane.
- ``nearest_correlation_batched``: Higham (2002) — alternating
  projections with Dykstra's correction between the PSD cone and the
  unit-diagonal affine set; linearly convergent, per-lane frozen
  convergence flags.  One ``eigh`` per iteration.
- ``nearest_orthogonal_batched``: the polar factor (QDWH,
  ``ops.svd.polar_batched``) IS the nearest orthogonal matrix in any
  unitarily-invariant norm.

No counterpart in the reference (exact-arithmetic input is never
"slightly indefinite"); this is the device framework's honesty story
applied to INPUT repair rather than output flags.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.precision import f32_matmuls
from .svd import polar_batched

_HIGH = jax.lax.Precision.HIGHEST


class NearestPSDResult(NamedTuple):
    x: jax.Array         # [B, n, n] nearest PSD (symmetric, λ ≥ shift)
    distance: jax.Array  # [B] ‖A − X‖_F (includes the asymmetric part)


@functools.partial(jax.jit, static_argnames=())
@f32_matmuls
def nearest_psd_batched(
    a: jax.Array, shift: float = 0.0
) -> NearestPSDResult:
    """Frobenius-nearest positive-SEMIdefinite matrix (Higham 1988);
    ``shift > 0`` clips eigenvalues at ``shift·max|λ|`` instead of 0,
    returning a safely positive-DEFINITE repair for downstream
    Cholesky (the floor scales by spectral MAGNITUDE, so even a
    negative-semidefinite input repairs to a definite matrix rather
    than the exactly-singular zero matrix)."""
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    sym = 0.5 * (a + jnp.swapaxes(a, 1, 2))
    w, V = jnp.linalg.eigh(sym)
    floor = shift * jnp.maximum(
        jnp.max(jnp.abs(w), axis=1, keepdims=True),
        jnp.finfo(f32).tiny,
    )
    wc = jnp.maximum(w, floor)
    x = jnp.einsum("bik,bk,bjk->bij", V, wc, V, precision=_HIGH)
    x = 0.5 * (x + jnp.swapaxes(x, 1, 2))
    d = jnp.sqrt(jnp.sum((a - x) ** 2, axis=(1, 2)))
    return NearestPSDResult(x, d)


class NearestCorrResult(NamedTuple):
    x: jax.Array          # [B, n, n] unit-diagonal PSD
    converged: jax.Array  # [B] projection gap ≤ tol before max_iters
    iters: jax.Array      # [] i32
    distance: jax.Array   # [B] ‖A − X‖_F


def _proj_psd(y):
    w, V = jnp.linalg.eigh(0.5 * (y + jnp.swapaxes(y, 1, 2)))
    wc = jnp.maximum(w, 0.0)
    x = jnp.einsum("bik,bk,bjk->bij", V, wc, V, precision=_HIGH)
    return 0.5 * (x + jnp.swapaxes(x, 1, 2))


@functools.partial(jax.jit, static_argnames=("max_iters",))
@f32_matmuls
def nearest_correlation_batched(
    a: jax.Array,
    tol: float = 1e-6,
    max_iters: int = 100,
) -> NearestCorrResult:
    """Frobenius-nearest CORRELATION matrix (symmetric PSD, unit
    diagonal) — Higham's (2002) alternating projections between the
    PSD cone and the unit-diagonal set, with Dykstra's correction on
    the cone projection (plain alternating projections converge to the
    wrong point for intersecting CONVEX-cone/affine pairs).  Converged
    lanes freeze."""
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    B, n, _ = a.shape
    y0 = 0.5 * (a + jnp.swapaxes(a, 1, 2))
    eye = jnp.eye(n, dtype=f32)
    scale = jnp.maximum(
        jnp.sqrt(jnp.sum(y0 * y0, axis=(1, 2))), 1e-30
    )

    def cond(st):
        _, _, done, k = st
        return (k < max_iters) & ~jnp.all(done)

    def body(st):
        y, ds, done, k = st
        r = y - ds
        xp = _proj_psd(r)
        ds_new = xp - r
        # project onto unit diagonal
        y_new = xp - (jnp.diagonal(xp, axis1=1, axis2=2) - 1.0)[
            :, :, None
        ] * eye
        gap = jnp.sqrt(jnp.sum((y_new - y) ** 2, axis=(1, 2))) / scale
        sel = done[:, None, None]
        y = jnp.where(sel, y, y_new)
        ds = jnp.where(sel, ds, ds_new)
        done = done | (gap <= tol)
        return y, ds, done, k + 1

    y, _, done, k = lax.while_loop(
        cond,
        body,
        (
            y0,
            jnp.zeros_like(y0),
            jnp.zeros((B,), bool),
            jnp.zeros((), jnp.int32),
        ),
    )
    # final PSD polish + exact unit diagonal (the iteration alternates,
    # so the last iterate is unit-diagonal but may be eps-indefinite)
    x = _proj_psd(y)
    dinv = 1.0 / jnp.sqrt(
        jnp.maximum(jnp.diagonal(x, axis1=1, axis2=2), 1e-12)
    )
    x = x * dinv[:, :, None] * dinv[:, None, :]
    d = jnp.sqrt(jnp.sum((a - x) ** 2, axis=(1, 2)))
    return NearestCorrResult(x, done, k, d)


def nearest_orthogonal_batched(a: jax.Array):
    """Nearest orthogonal matrix (any unitarily-invariant norm): the
    polar factor of A.  Returns ``(q, distance, ok)``."""
    res = polar_batched(a)
    d = jnp.sqrt(
        jnp.sum((a.astype(res.up.dtype) - res.up) ** 2, axis=(1, 2))
    )
    return res.up, d, res.ok
