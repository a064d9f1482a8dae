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
- ``svd(full_matrices=True)`` pads with an orthonormal complement
  whose span (not entries) matches numpy's — complement bases are
  unique only up to rotation.
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
    any matching leading batch dims.  Complex input runs through the
    real-embedding solver (``ops.complexlin``)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    af, unf, lead = _batched(a)
    vector_rhs = b.ndim == a.ndim - 1
    if jnp.iscomplexobj(af) or jnp.iscomplexobj(b):
        from .ops import complexlin as _cx

        af = af.astype(jnp.complex64) if not jnp.iscomplexobj(af) else af
        n = af.shape[-1]
        if vector_rhs:
            bf = b.reshape((-1,) + b.shape[b.ndim - 1:])
            xr, xi = _cx.solve_complex_batched(
                jnp.real(af), jnp.imag(af), jnp.real(bf), jnp.imag(bf)
            )
            return unf(xr + 1j * xi)
        bf = b.reshape((-1,) + b.shape[b.ndim - 2:])
        # embedded matrix RHS: [Re b; Im b] stacked rows
        M = _cx._embed(jnp.real(af), jnp.imag(af))
        rhs = jnp.concatenate([jnp.real(bf), jnp.imag(bf)], axis=1)
        x = _solve_matrix_rhs(M, rhs)
        return unf(x[:, :n, :] + 1j * x[:, n:, :])
    if vector_rhs:
        bf = b.reshape((-1,) + b.shape[b.ndim - 1:])
        x = _dispatch.solve_batched(af, bf)
        return unf(x)
    bf = b.reshape((-1,) + b.shape[b.ndim - 2:])
    x = _solve_matrix_rhs(af, bf)
    return unf(x)


@jax.custom_vjp
def _solve_matrix_rhs(af, bf):
    # One factorization, k solves.  Custom VJP (one transposed-system
    # matrix solve): the blocked/vmapped-LU bodies below hold fori_loop
    # state XLA would otherwise have to checkpoint per iteration.
    return _solve_matrix_rhs_impl(af, bf)


def _solve_matrix_rhs_fwd(af, bf):
    x = _solve_matrix_rhs_impl(af, bf)
    return x, (af, x)


def _solve_matrix_rhs_bwd(res, g):
    af, x = res
    at = jnp.swapaxes(af, -1, -2)
    gy = _solve_matrix_rhs_impl(at, g)
    abar = -jnp.einsum(
        "...ik,...jk->...ij", gy, x, precision=jax.lax.Precision.HIGHEST
    )
    return abar.astype(af.dtype), gy.astype(x.dtype)


_solve_matrix_rhs.defvjp(_solve_matrix_rhs_fwd, _solve_matrix_rhs_bwd)


def _solve_matrix_rhs_impl(af, bf):
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
    if jnp.iscomplexobj(af):
        from .ops import complexlin as _cx

        ir, ii = _cx.inverse_complex_batched(jnp.real(af), jnp.imag(af))
        return unf(ir + 1j * ii)
    return unf(_dispatch.inverse_batched(af))


def det(a):
    af, unf, _ = _batched(a)
    if jnp.iscomplexobj(af):
        from .ops import complexlin as _cx

        dr, di = _cx.det_complex_batched(jnp.real(af), jnp.imag(af))
        return unf(dr + 1j * di)
    return unf(_dispatch.det_batched(af))


def slogdet(a):
    """(sign, log|det|) from the LU diagonal — stays finite where
    ``det`` itself would overflow."""
    from .ops import lu as _lu

    af, unf, _ = _batched(a)
    if jnp.iscomplexobj(af):
        from .ops import complexlin as _cx

        sr, si, la = _cx.slogdet_complex_batched(
            jnp.real(af), jnp.imag(af)
        )
        return unf(sr + 1j * si), unf(la)
    sign, logabs = _slogdet_core(af)
    return unf(sign), unf(logabs)


@jax.custom_vjp
def _slogdet_core(af):
    return _slogdet_impl(af)


def _slogdet_impl(af):
    from .ops import lu as _lu

    res = _lu.lu_factor_batched(af)
    d = jnp.diagonal(res.lu, axis1=-2, axis2=-1)
    sign = jnp.prod(jnp.sign(d), axis=-1) * res.sign
    logabs = jnp.sum(jnp.log(jnp.abs(d)), axis=-1)
    return sign, logabs


def _slogdet_fwd(af):
    out = _slogdet_impl(af)
    return out, af


def _slogdet_bwd(af, g):
    # d log|det A| = tr(A⁻¹ dA); sign is locally constant.
    _, g_logabs = g
    inv_t = jnp.swapaxes(_dispatch.inverse_batched(af), -1, -2)
    return (g_logabs[..., None, None] * inv_t,)


_slogdet_core.defvjp(_slogdet_fwd, _slogdet_bwd)


def matrix_rank(a, tol=None):
    af, unf, _ = _batched(a)
    if jnp.iscomplexobj(af):
        from .ops import complexlin as _cx

        s = _cx.svd_complex_batched(jnp.real(af), jnp.imag(af)).s
        m, n = af.shape[-2:]
        cut = (tol if tol is not None
               else max(m, n) * float(jnp.finfo(s.dtype).eps)
               * jnp.max(s, axis=1, keepdims=True))
        return unf(jnp.sum(s > cut, axis=1))
    return unf(_svd.rank_svd_batched(af, tol=tol))


def eig(a):
    """Complex eigenvalues and right eigenvectors (numpy layout:
    ``w [..., n]``, ``v [..., n, n]`` with ``v[..., :, i]`` the i-th
    eigenvector).  COMPLEX input is supported (routed through the
    real-embedding eigensolver, ``ops.complexlin``)."""
    a = jnp.asarray(a)
    af, unf, _ = _batched(a)
    if jnp.iscomplexobj(af):
        from .ops import complexlin as _cx

        r = _cx.eig_complex_batched(jnp.real(af), jnp.imag(af))
        w = r.real + 1j * r.imag
        v = r.v_re + 1j * r.v_im
        return unf(w), unf(v)
    r = _schur.eig_batched(af)
    w = r.real + 1j * r.imag
    v = r.vectors_real + 1j * r.vectors_imag
    return unf(w), unf(v)


def eigvals(a):
    a = jnp.asarray(a)
    if jnp.iscomplexobj(a):
        return eig(a)[0]
    af, unf, _ = _batched(a)
    r = _schur.eigvals_schur(af)
    return unf(r.real + 1j * r.imag)


def eigh(a):
    """Ascending eigenvalues + orthonormal eigenvectors of symmetric
    (or complex HERMITIAN) input (numpy order)."""
    a = jnp.asarray(a)
    af, unf, _ = _batched(a)
    if jnp.iscomplexobj(af):
        from .ops import complexlin as _cx

        r = _cx.eigh_complex_batched(jnp.real(af), jnp.imag(af))
        return unf(r.w), unf(r.v_re + 1j * r.v_im)
    r = _symmetric.eigh_batched(af)
    return unf(r.w), unf(r.V)


def eigvalsh(a):
    a = jnp.asarray(a)
    if jnp.iscomplexobj(a):
        return eigh(a)[0]
    af, unf, _ = _batched(a)
    return unf(_symmetric.eigh_batched(af).w)


def svd(a, full_matrices=False, compute_uv=True):
    """SVD.  ``full_matrices=True`` pads the short factor with an
    orthonormal complement (CholeskyQR2 on a projected Gaussian block
    — ``ops.lstsq.complete_basis_batched``); the padded columns span
    the left/right null space, like numpy's (complement bases are
    unique only up to rotation, so they match numpy's span, not its
    entries)."""
    af, unf, _ = _batched(a)
    m, n = af.shape[-2], af.shape[-1]
    if jnp.iscomplexobj(af):
        from .ops import complexlin as _cx

        rc = _cx.svd_complex_batched(jnp.real(af), jnp.imag(af))
        if not compute_uv:
            return unf(rc.s)
        u_re, u_im = rc.u_re, rc.u_im
        v_re, v_im = rc.v_re, rc.v_im
        if full_matrices and m > n:
            c_re, c_im = _cx.complete_basis_complex_batched(u_re, u_im)
            u_re = jnp.concatenate([u_re, c_re], axis=-1)
            u_im = jnp.concatenate([u_im, c_im], axis=-1)
        if full_matrices and n > m:
            c_re, c_im = _cx.complete_basis_complex_batched(v_re, v_im)
            v_re = jnp.concatenate([v_re, c_re], axis=-1)
            v_im = jnp.concatenate([v_im, c_im], axis=-1)
        vh = jnp.swapaxes(v_re, -1, -2) - 1j * jnp.swapaxes(v_im, -1, -2)
        return unf(u_re + 1j * u_im), unf(rc.s), unf(vh)
    r = _svd.svd_batched(af)
    if not compute_uv:
        return unf(r.s)
    U, V = r.U, r.V
    if full_matrices and m > n:
        U = jnp.concatenate(
            [U, _lstsq.complete_basis_batched(U)], axis=-1
        )
    if full_matrices and n > m:
        V = jnp.concatenate(
            [V, _lstsq.complete_basis_batched(V)], axis=-1
        )
    # numpy returns V^H (rows are right singular vectors)
    return unf(U), unf(r.s), unf(jnp.swapaxes(V, -1, -2))


def qr(a):
    """Thin QR (mode='reduced')."""
    af, unf, _ = _batched(a)
    if jnp.iscomplexobj(af):
        from .ops import complexlin as _cx

        rc = _cx.qr_complex_batched(jnp.real(af), jnp.imag(af))
        return unf(rc.q_re + 1j * rc.q_im), unf(rc.r_re + 1j * rc.r_im)
    r = _lstsq.qr_batched(af)
    return unf(r.Q), unf(r.R)


def cholesky(a):
    af, unf, _ = _batched(a)
    if jnp.iscomplexobj(af):
        from .ops import complexlin as _cx

        rc = _cx.chol_complex_batched(jnp.real(af), jnp.imag(af))
        return unf(rc.l_re + 1j * rc.l_im)
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
    if jnp.iscomplexobj(af) or jnp.iscomplexobj(bf):
        from .ops import complexlin as _cx

        af = af.astype(jnp.complex64)
        bf = bf.astype(jnp.complex64)
        if vector_rhs:
            xr, xi, _ok = _cx.lstsq_complex_batched(
                jnp.real(af), jnp.imag(af), jnp.real(bf), jnp.imag(bf)
            )
            return unf(xr + 1j * xi)
        pr, pi, _ok = _cx.pinv_complex_batched(
            jnp.real(af), jnp.imag(af)
        )
        P = pr + 1j * pi
        return unf(jnp.einsum("bij,bjk->bik", P, bf,
                              precision=jax.lax.Precision.HIGHEST))
    if vector_rhs:
        return unf(_lstsq.lstsq_batched(af, bf).x)
    x = jax.vmap(
        lambda c: _lstsq.lstsq_batched(af, c).x, in_axes=2, out_axes=2
    )(bf)
    return unf(x)


def pinv(a, rcond=None):
    af, unf, _ = _batched(a)
    if jnp.iscomplexobj(af):
        from .ops import complexlin as _cx

        pr, pi, _ok = _cx.pinv_complex_batched(
            jnp.real(af), jnp.imag(af), rcond=rcond
        )
        return unf(pr + 1j * pi)
    return unf(_svd.pinv_batched(af, rcond=rcond))


def _held_norm(af, p):
    """Batched matrix norm for ``cond``: p ∈ {1, -1, inf, -inf, 'fro'}
    on ``[B, m, n]`` (complex ok — jnp.abs gives the modulus)."""
    mag = jnp.abs(af)
    if p == "fro":
        return jnp.sqrt(jnp.sum(mag * mag, axis=(-2, -1)))
    col = jnp.sum(mag, axis=-2)
    row = jnp.sum(mag, axis=-1)
    return {
        1: jnp.max(col, axis=-1),
        -1: jnp.min(col, axis=-1),
        jnp.inf: jnp.max(row, axis=-1),
        -jnp.inf: jnp.min(row, axis=-1),
    }[p]


def cond(a, p=None):
    """Condition number in any numpy-supported norm: p ∈ {None, 2, -2}
    from singular values; p ∈ {1, -1, inf, -inf, 'fro'} as
    ‖A‖·‖A⁻¹‖ (square input; one inverse through the tuned LU —
    numpy computes the same product).  For a cheap p=1 ESTIMATE
    without the full inverse see ``ops.cond.cond1_est_batched``."""
    import numpy as _np

    af, unf, _ = _batched(a)
    is_c = jnp.iscomplexobj(af)
    if p in (None, 2, -2):
        if is_c:
            from .ops import complexlin as _cx

            s = _cx.svd_complex_batched(jnp.real(af), jnp.imag(af)).s
        else:
            s = _svd.svd_batched(af).s
        if p == -2:
            return unf(s[:, -1] / jnp.maximum(s[:, 0], 1e-37))
        return unf(s[:, 0] / jnp.maximum(s[:, -1], 1e-37))
    if p not in (1, -1, "fro") and not (
        isinstance(p, float) and _np.isinf(p)
    ):
        raise ValueError(f"cond: unsupported norm order {p!r}")
    if af.shape[-1] != af.shape[-2]:
        raise ValueError("cond: p≠±2 requires square input (numpy too)")
    if is_c:
        from .ops import complexlin as _cx

        ir, ii = _cx.inverse_complex_batched(jnp.real(af), jnp.imag(af))
        inv_a = ir + 1j * ii
    else:
        inv_a = _dispatch.inverse_batched(af)
    key = "fro" if p == "fro" else (
        jnp.inf if (isinstance(p, float) and p > 0)
        else (-jnp.inf if isinstance(p, float) else p)
    )
    return unf(_held_norm(af, key) * _held_norm(inv_a, key))


def matrix_power(a, n: int):
    """Integer matrix power by binary squaring (negative n inverts
    first)."""
    af, unf, _ = _batched(a)
    if n < 0:
        if jnp.iscomplexobj(af):
            from .ops import complexlin as _cx

            ir, ii = _cx.inverse_complex_batched(
                jnp.real(af), jnp.imag(af)
            )
            af = ir + 1j * ii
        else:
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


# ---------------------------------------------------------------------------
# numpy 2.0 linalg additions + convenience wrappers
# ---------------------------------------------------------------------------

def svdvals(a):
    """Singular values only (numpy 2.0 ``linalg.svdvals``)."""
    return svd(a, compute_uv=False)


def matrix_transpose(a):
    return jnp.swapaxes(jnp.asarray(a), -1, -2)


def matrix_norm(a, ord="fro"):
    """Matrix norms over the trailing two axes (numpy 2.0 API).
    ``ord=2`` (spectral) routes through the QDWH SVD; the elementwise
    / row-column norms are pure reductions."""
    a = jnp.asarray(a)
    if ord == "fro":
        return jnp.sqrt(jnp.sum(jnp.abs(a) ** 2, axis=(-2, -1)))
    if ord == "nuc":
        s = svd(a, compute_uv=False)
        return jnp.sum(s, axis=-1)
    if ord == 2:
        s = svd(a, compute_uv=False)
        return s[..., 0]
    if ord == -2:
        s = svd(a, compute_uv=False)
        return s[..., -1]
    if ord == 1:
        return jnp.max(jnp.sum(jnp.abs(a), axis=-2), axis=-1)
    if ord == -1:
        return jnp.min(jnp.sum(jnp.abs(a), axis=-2), axis=-1)
    if ord == jnp.inf or ord == float("inf"):
        return jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)
    if ord == -jnp.inf or ord == float("-inf"):
        return jnp.min(jnp.sum(jnp.abs(a), axis=-1), axis=-1)
    raise ValueError(f"matrix_norm: unsupported ord {ord!r}")


def vector_norm(x, ord=2, axis=None, keepdims=False):
    return jnp.linalg.norm(
        jnp.asarray(x), ord=ord, axis=axis, keepdims=keepdims
    )


def vecdot(x1, x2, axis=-1):
    """Conjugating vector dot product over ``axis`` (numpy 2.0)."""
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    return jnp.sum(jnp.conj(x1) * x2, axis=axis)


def outer(x1, x2):
    return jnp.outer(jnp.asarray(x1), jnp.asarray(x2))


def cross(x1, x2, axis=-1):
    return jnp.cross(jnp.asarray(x1), jnp.asarray(x2), axis=axis)


def diagonal(x, offset=0):
    return jnp.diagonal(jnp.asarray(x), offset=offset, axis1=-2, axis2=-1)


def trace(x, offset=0, dtype=None):
    t = jnp.trace(jnp.asarray(x), offset=offset, axis1=-2, axis2=-1)
    return t.astype(dtype) if dtype is not None else t


def matmul(x1, x2):
    return jnp.matmul(
        jnp.asarray(x1), jnp.asarray(x2),
        precision=jax.lax.Precision.HIGHEST,
    )


def tensordot(x1, x2, axes=2):
    return jnp.tensordot(
        jnp.asarray(x1), jnp.asarray(x2), axes=axes,
        precision=jax.lax.Precision.HIGHEST,
    )


def multi_dot(arrays):
    """Chained matrix product with the classic O(k³) dynamic-program
    parenthesization (numpy semantics: 1-D endpoints treated as
    row/column vectors and squeezed from the result).  The DP runs on
    host over static shapes; the device executes only the chosen
    GEMMs."""
    arrays = [jnp.asarray(a) for a in arrays]
    if len(arrays) == 0:
        raise ValueError("multi_dot: need at least one array")
    if len(arrays) == 1:
        return arrays[0]
    head_vec = arrays[0].ndim == 1
    tail_vec = arrays[-1].ndim == 1
    mats = list(arrays)
    if head_vec:
        mats[0] = mats[0][None, :]
    if tail_vec:
        mats[-1] = mats[-1][:, None]
    if any(m.ndim != 2 for m in mats):
        raise ValueError("multi_dot: interior arrays must be 2-D")
    dims = [m.shape[0] for m in mats] + [mats[-1].shape[1]]
    k = len(mats)
    INF = float("inf")
    cost = [[0.0] * k for _ in range(k)]
    split = [[0] * k for _ in range(k)]
    for ln in range(2, k + 1):
        for i in range(k - ln + 1):
            j = i + ln - 1
            cost[i][j] = INF
            for s in range(i, j):
                c = (cost[i][s] + cost[s + 1][j]
                     + dims[i] * dims[s + 1] * dims[j + 1])
                if c < cost[i][j]:
                    cost[i][j] = c
                    split[i][j] = s

    def build(i, j):
        if i == j:
            return mats[i]
        s = split[i][j]
        return matmul(build(i, s), build(s + 1, j))

    out = build(0, k - 1)
    if head_vec:
        out = out[0]
    if tail_vec:
        out = out[..., 0]
    return out


def tensorsolve(a, b, axes=None):
    """``numpy.linalg.tensorsolve``: solve ``a x = b`` where ``a`` is
    reshaped to square over the trailing ``x`` dimensions."""
    import numpy as _np

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if axes is not None:
        allaxes = list(range(a.ndim))
        for ax in axes:
            allaxes.remove(ax)
            allaxes.append(ax)
        a = jnp.transpose(a, allaxes)
    rest = a.shape[b.ndim:]
    prod = int(_np.prod(rest)) if rest else 1
    if int(_np.prod(a.shape[: b.ndim])) != prod:
        raise ValueError("tensorsolve: a is not square over x-dims")
    A2 = a.reshape(prod, prod)
    b2 = b.reshape(prod)
    x = solve(A2, b2)
    return x.reshape(rest)


def tensorinv(a, ind=2):
    """``numpy.linalg.tensorinv``: inverse under tensordot over the
    first ``ind`` axes."""
    import numpy as _np

    a = jnp.asarray(a)
    if ind <= 0:
        raise ValueError("tensorinv: ind must be positive")
    inv_shape = a.shape[ind:] + a.shape[:ind]
    prod = int(_np.prod(a.shape[:ind]))
    if int(_np.prod(a.shape[ind:])) != prod:
        raise ValueError("tensorinv: a is not square over ind split")
    ia = inv(a.reshape(prod, prod))
    return ia.reshape(inv_shape)
