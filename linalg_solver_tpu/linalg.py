"""``numpy.linalg``-shaped namespace backed by this framework's kernels.

Drop-in convenience for users arriving from ``numpy.linalg`` /
``jnp.linalg``: the familiar call signatures, arbitrary leading batch
dimensions (including none), complex eigenvalue outputs — routed
through the tuned batched ops (``ops.dispatch`` blocked/Pallas LU for
solve/inv/det, the Schur stack for eig, QDWH for SVD, CholeskyQR2 for
QR/lstsq).

    from linalg_solver_tpu import linalg as tla
    x = tla.solve(a, b)          # any leading batch dims
    w, v = tla.eig(a)            # complex, like numpy

Differences from ``numpy.linalg`` (deliberate, device-honest):

- Never raises ``LinAlgError`` under ``jit``: singular/unconverged
  lanes produce inf/nan results (XLA semantics).  Callers needing
  per-lane honesty flags should use the underlying ``ops.*`` results
  (``converged`` / ``valid`` / ``ok`` fields) — this shim trades the
  flags away for signature compatibility.
- ``svd`` computes the thin decomposition (``full_matrices=False``
  only — the TPU-native layout; full U/V zero-pads no information).
- Everything computes in float32 on TPU (float64 inputs work on CPU
  under ``jax.enable_x64``; the Schur path refuses f64 on TPU rather
  than return emulation-corrupted results).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops import dispatch as _dispatch
from .ops import lstsq as _lstsq
from .ops import spd as _spd
from .ops import svd as _svd
from .ops import symmetric as _symmetric
from .ops import schur as _schur

norm = jnp.linalg.norm  # pure elementwise/reduction — XLA's is ideal


def _batched(a, core_ndim=2):
    """Flatten leading dims to one batch axis; return (arr, unflatten)."""
    a = jnp.asarray(a)
    lead = a.shape[: a.ndim - core_ndim]
    core = a.shape[a.ndim - core_ndim:]
    flat = a.reshape((-1,) + core)
    def unflatten(x, core_out_ndim=None):
        return x.reshape(lead + x.shape[1:])
    return flat, unflatten, lead


def solve(a, b):
    """``numpy.linalg.solve`` semantics: matrix or stacked-vector RHS,
    any matching leading batch dims."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    af, unf, lead = _batched(a)
    vector_rhs = b.ndim == a.ndim - 1
    if vector_rhs:
        bf = b.reshape((-1,) + b.shape[b.ndim - 1:])
        x = _dispatch.solve_batched(af, bf)
        return unf(x)
    bf = b.reshape((-1,) + b.shape[b.ndim - 2:])
    x = _solve_matrix_rhs(af, bf)
    return unf(x)


def _solve_matrix_rhs(af, bf):
    # One factorization, k solves.
    k = bf.shape[-1]
    if k == 1:
        return _dispatch.solve_batched(af, bf[..., 0])[..., None]
    from .ops import lu_blocked as _lub

    n = af.shape[-1]
    nb = next((w for w in (64, 48, 32, 16, 8) if n % w == 0), None)
    if nb is not None and n >= 16:
        return _lub.blocked_solve_batched(af, bf, nb=nb)
    from .ops import lu as _lu

    res = _lu.lu_factor_batched(af)
    return jax.vmap(
        lambda c: _lu.lu_solve_batched(res, c), in_axes=2, out_axes=2
    )(bf)


def inv(a):
    af, unf, _ = _batched(a)
    return unf(_dispatch.inverse_batched(af))


def det(a):
    af, unf, _ = _batched(a)
    return unf(_dispatch.det_batched(af))


def slogdet(a):
    """(sign, log|det|) from the LU diagonal — stays finite where
    ``det`` itself would overflow."""
    from .ops import lu as _lu

    af, unf, _ = _batched(a)
    res = _lu.lu_factor_batched(af)
    d = jnp.diagonal(res.lu, axis1=-2, axis2=-1)
    sign = jnp.prod(jnp.sign(d), axis=-1) * res.sign
    logabs = jnp.sum(jnp.log(jnp.abs(d)), axis=-1)
    return unf(sign), unf(logabs)


def matrix_rank(a, tol=None):
    af, unf, _ = _batched(a)
    return unf(_svd.rank_svd_batched(af, tol=tol))


def eig(a):
    """Complex eigenvalues and right eigenvectors (numpy layout:
    ``w [..., n]``, ``v [..., n, n]`` with ``v[..., :, i]`` the i-th
    eigenvector)."""
    af, unf, _ = _batched(a)
    r = _schur.eig_batched(af)
    w = r.real + 1j * r.imag
    v = r.vectors_real + 1j * r.vectors_imag
    return unf(w), unf(v)


def eigvals(a):
    af, unf, _ = _batched(a)
    r = _schur.eigvals_schur(af)
    return unf(r.real + 1j * r.imag)


def eigh(a):
    """Ascending eigenvalues + orthonormal eigenvectors of symmetric
    input (numpy order)."""
    af, unf, _ = _batched(a)
    r = _symmetric.eigh_batched(af)
    return unf(r.w), unf(r.V)


def eigvalsh(a):
    af, unf, _ = _batched(a)
    return unf(_symmetric.eigh_batched(af).w)


def svd(a, full_matrices=False, compute_uv=True):
    """Thin SVD (``full_matrices=True`` is not provided — the padded
    orthogonal complements carry no information and cost extra HBM)."""
    if full_matrices:
        raise NotImplementedError(
            "linalg_solver_tpu.linalg.svd computes the thin SVD only; "
            "pass full_matrices=False"
        )
    af, unf, _ = _batched(a)
    r = _svd.svd_batched(af)
    if not compute_uv:
        return unf(r.s)
    # numpy returns V^H (rows are right singular vectors)
    return unf(r.U), unf(r.s), unf(jnp.swapaxes(r.V, -1, -2))


def qr(a):
    """Thin QR (mode='reduced')."""
    af, unf, _ = _batched(a)
    r = _lstsq.qr_batched(af)
    return unf(r.Q), unf(r.R)


def cholesky(a):
    af, unf, _ = _batched(a)
    return unf(_spd.cholesky_batched(af).L)


def lstsq(a, b):
    """Least-squares solution (returns only ``x``, the part numpy
    callers overwhelmingly use; residuals/rank/singular values come
    from ``ops.lstsq`` / ``ops.svd`` directly)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    af, unf, _ = _batched(a)
    vector_rhs = b.ndim == a.ndim - 1
    bf = b.reshape((-1,) + b.shape[b.ndim - (1 if vector_rhs else 2):])
    if vector_rhs:
        return unf(_lstsq.lstsq_batched(af, bf).x)
    x = jax.vmap(
        lambda c: _lstsq.lstsq_batched(af, c).x, in_axes=2, out_axes=2
    )(bf)
    return unf(x)


def pinv(a, rcond=None):
    af, unf, _ = _batched(a)
    return unf(_svd.pinv_batched(af, rcond=rcond))


def cond(a, p=None):
    """Spectral condition number (p=2, the numpy default)."""
    if p not in (None, 2):
        raise NotImplementedError(
            "cond: only the spectral norm (p=2 / default) is provided; "
            "ops.cond.cond1_est_batched estimates p=1 from one LU"
        )
    af, unf, _ = _batched(a)
    return unf(_svd.cond2_batched(af))


def matrix_power(a, n: int):
    """Integer matrix power by binary squaring (negative n inverts
    first)."""
    af, unf, _ = _batched(a)
    if n < 0:
        af = _dispatch.inverse_batched(af)
        n = -n
    size = af.shape[-1]
    out = jnp.broadcast_to(
        jnp.eye(size, dtype=af.dtype), af.shape
    )
    base = af
    while n > 0:  # static Python loop — n is a Python int
        if n & 1:
            out = jnp.einsum(
                "bij,bjk->bik", out, base,
                precision=jax.lax.Precision.HIGHEST,
            )
        n >>= 1
        if n:
            base = jnp.einsum(
                "bij,bjk->bik", base, base,
                precision=jax.lax.Precision.HIGHEST,
            )
    return unf(out)
