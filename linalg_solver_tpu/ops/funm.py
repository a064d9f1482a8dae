"""Batched matrix functions: expm (general), sqrtm/logm/powm (SPD).

No counterpart in the reference (exact scalar domain); these round out
the dense production surface.  TPU-first shapes:

- ``expm_batched`` — the scaling-and-squaring [13/13] Padé scheme
  (Higham 2005, the scipy/LAPACK standard): everything is batched
  GEMMs plus ONE batched solve; the data-dependent squaring count is
  handled with a per-lane scale ``2^{-s_b}`` and a fixed-trip squaring
  loop that re-squares only lanes with remaining steps (jit-static
  control flow, per-lane ``where``).
- ``sqrtm_spd_batched`` / ``logm_spd_batched`` / ``powm_spd_batched``
  — spectral functions of symmetric positive (semi-)definite input
  through one ``eigh`` (exactly orthogonal basis, so
  ``f(A) = V f(Λ) Vᵀ`` is backward stable); the general non-normal
  sqrtm/logm (quasi-triangular Parlett recurrences) are out of scope.
"""

from __future__ import annotations

import functools

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
    """Matrix exponential of a batched [B, n, n] real matrix."""
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
