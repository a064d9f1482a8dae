"""Randomized low-rank factorization (Halko–Martinsson–Tropp).

For matrices whose spectrum decays, the full SVD wastes O(mn·min(m,n))
work on directions that carry no signal; the randomized range finder
gets a near-optimal rank-k approximation from k+p GEMM-projected
samples — the large-scale production workhorse (PCA, spectral
embeddings, preconditioner compression).  Everything here is GEMMs +
a rank-revealing eigh-of-Gram orthonormalization (a masked cousin of
``ops.orth._chol_qr`` — the sampled basis is EXACTLY deficient
whenever k+p exceeds the true rank, where plain CholeskyQR NaNs) and
the small-core QDWH SVD, so it runs at MXU throughput and batches over
the leading axis:

    Y = (A Aᵀ)^q · A · Ω     (Ω gaussian [n, k+p]; q power iterations
                              sharpen decaying spectra)
    Q = orth(Y)              (rank-revealing eigh orthonormalization)
    B = Qᵀ A                 ([k+p, n] small core)
    B = Ũ Σ Vᵀ  ⇒  A ≈ (QŨ)[:, :k] Σ[:k] V[:, :k]ᵀ

Accuracy: E‖A − QQᵀA‖ ≤ (1 + k/(p−1))·σ_{k+1} + tail terms — near the
best rank-k error whenever σ_{k+1} is small; the ``resid_est`` field
reports a sampled estimate of the actual truncation error.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls

_HIGH = jax.lax.Precision.HIGHEST


class RandomizedSVD(NamedTuple):
    U: jax.Array          # [B, m, k]
    s: jax.Array          # [B, k] descending
    V: jax.Array          # [B, n, k]
    resid_est: jax.Array  # [B] sampled ‖A − U diag(s) Vᵀ‖₂ estimate
    ok: jax.Array         # [B]
    #: [B, k] — True where the component carries signal; requesting
    #: k beyond the input's numerical rank yields trailing False
    #: columns (their U/V columns are zero, s ~ 0), not garbage.
    valid: jax.Array = None


def _orth_rank_revealing(Y: jax.Array):
    """Orthonormal basis of range(Y), robust to RANK-DEFICIENT Y (the
    normal situation here: a rank-r matrix sampled with k+p > r probes
    makes Y exactly deficient, where plain CholeskyQR NaNs).

    eigh of the Gram matrix, keep directions above the Gram roundoff
    floor (zero columns elsewhere), then one Cholesky refinement pass
    with the dropped columns' Gram diagonal patched to 1 so the factor
    stays finite."""
    B, m, ell = Y.shape
    dtype = Y.dtype
    eps = float(jnp.finfo(dtype).eps)
    eye = jnp.eye(ell, dtype=dtype)
    gram = jnp.einsum("bji,bjk->bik", Y, Y, precision=_HIGH)
    w, P = jnp.linalg.eigh(gram)
    wmax = jnp.maximum(w[:, -1:], jnp.finfo(dtype).tiny)
    # Gram eigenvalues below ~eps*wmax are eigh roundoff (they can even
    # come back negative); anything above is signal.  The floor decides
    # the method's resolvable dynamic range: sigma down to
    # ~sqrt(4*eps)*sigma_max (~7e-4 at f32) is kept — the honest limit
    # of any Gram-based orthonormalization.  (8*ell*eps here dropped
    # directions 100x above the noise floor: sigma=4e-3*sigma_max
    # columns came back zero with ok=True.)
    valid = w > (4.0 * eps) * wmax                       # [B, ell]
    scale = jnp.where(
        valid, 1.0 / jnp.sqrt(jnp.maximum(w, 1e-30)), 0.0
    )
    Q = jnp.einsum(
        "bij,bjk->bik", Y, P * scale[:, None, :], precision=_HIGH
    )
    validf = valid.astype(dtype)
    g2 = jnp.einsum("bji,bjk->bik", Q, Q, precision=_HIGH)
    g2 = (
        g2 * validf[:, :, None] * validf[:, None, :]
        + (1.0 - validf)[:, None, :] * eye[None]
    )
    L = jnp.linalg.cholesky(g2)
    Q = jnp.swapaxes(
        jax.scipy.linalg.solve_triangular(
            L, jnp.swapaxes(Q, 1, 2), lower=True
        ),
        1, 2,
    ) * validf[:, None, :]
    ok = jnp.all(jnp.isfinite(Q), axis=(1, 2))
    return Q, ok


@functools.partial(
    jax.jit, static_argnames=("k", "oversample", "power_iters")
)
@f32_matmuls
def randomized_svd_batched(
    a: jax.Array,
    k: int,
    key: jax.Array = None,
    oversample: int = 8,
    power_iters: int = 2,
) -> RandomizedSVD:
    """Rank-k randomized SVD of a batched [B, m, n] matrix."""
    from .svd import svd_batched

    B, m, n = a.shape
    ell = min(k + oversample, min(m, n))
    if k > min(m, n):
        raise ValueError(f"k={k} exceeds min(m, n)={min(m, n)}")
    if key is None:
        key = jax.random.PRNGKey(0)
    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)

    omega = jax.random.normal(key, (B, n, ell), f32)
    Y = jnp.einsum("bij,bjk->bik", a, omega, precision=_HIGH)
    ok = jnp.ones((B,), bool)
    for _ in range(power_iters):
        # Orthonormalize between applications — powers of A squash the
        # sample basis onto the top singular direction otherwise.
        Q, okq = _orth_rank_revealing(Y)
        ok = ok & okq
        Z = jnp.einsum("bji,bjk->bik", a, Q, precision=_HIGH)
        Qz, okz = _orth_rank_revealing(Z)
        ok = ok & okz
        Y = jnp.einsum("bij,bjk->bik", a, Qz, precision=_HIGH)
    Q, okq = _orth_rank_revealing(Y)
    ok = ok & okq

    Bcore = jnp.einsum("bji,bjk->bik", Q, a, precision=_HIGH)
    core = svd_batched(Bcore)                     # [B, ell, n] thin
    U = jnp.einsum(
        "bij,bjk->bik", Q, core.U[:, :, :k], precision=_HIGH
    )
    s = core.s[:, :k]
    V = core.V[:, :, :k]

    # Sampled spectral-norm estimate of the truncation error: a few
    # random probes of (A − U diag(s) Vᵀ).
    kprob = jax.random.split(key)[1]
    w = jax.random.normal(kprob, (B, n, 4), f32)
    w = w / jnp.maximum(
        jnp.sqrt(jnp.sum(w * w, axis=1, keepdims=True)), 1e-30
    )
    Aw = jnp.einsum("bij,bjk->bik", a, w, precision=_HIGH)
    low = jnp.einsum(
        "bij,bj,bkj,bkl->bil", U, s, V, w, precision=_HIGH
    )
    resid = jnp.sqrt(jnp.max(jnp.sum((Aw - low) ** 2, axis=1), axis=1))
    eps = float(jnp.finfo(f32).eps)
    # rank floor scales with the sample width (the source of spurious
    # tiny values), not the matrix dimensions — see distributed twin.
    valid = s > (ell * eps) * jnp.maximum(s[:, :1], 1e-30)
    return RandomizedSVD(U, s, V, resid, ok & core.ok, valid)


class InterpolativeDecomposition(NamedTuple):
    """Column ID ``A ≈ A[:, cols] @ X``: the k most informative ACTUAL
    columns (indices in greedy selection order) plus the interpolation
    coefficients.  ``resid_fro`` is the exact relative Frobenius error
    of the reconstruction."""

    cols: jax.Array       # [B, k] i32
    X: jax.Array          # [B, k, n]
    resid_fro: jax.Array  # [B]
    ok: jax.Array         # [B]


class CURDecomposition(NamedTuple):
    """``A ≈ C @ U @ R`` from actual columns and rows of A (the
    interpretable low-rank factorization).  ``C = A[:, cols]``,
    ``R = A[rows, :]``, U [B, k, k]."""

    cols: jax.Array       # [B, k] i32
    rows: jax.Array       # [B, k] i32
    C: jax.Array          # [B, m, k]
    U: jax.Array          # [B, k, k]
    R: jax.Array          # [B, k, n]
    resid_fro: jax.Array  # [B]
    ok: jax.Array         # [B]


def _select_columns_gram(a: jax.Array, k: int):
    """Greedy column selection = diagonal-pivoted Cholesky on the Gram
    matrix AᵀA (identical pivot order to column-pivoted QR on A, at
    pure-GEMM cost)."""
    from .spd import pivoted_cholesky_batched

    gram = jnp.einsum("bmi,bmj->bij", a, a, precision=_HIGH)
    pc = pivoted_cholesky_batched(gram, max_rank=k)
    return pc.piv, pc.ok


def _gather_cols(a: jax.Array, cols: jax.Array):
    """[B, m, k] actual columns via one-hot GEMM (TPU-friendly)."""
    n = a.shape[2]
    oh = (cols[:, :, None] == jnp.arange(n)[None, None, :]).astype(
        a.dtype
    )                                                   # [B, k, n]
    return jnp.einsum("bmn,bkn->bmk", a, oh, precision=_HIGH)


@functools.partial(jax.jit, static_argnames=("k",))
@f32_matmuls
def interpolative_batched(
    a: jax.Array, k: int
) -> InterpolativeDecomposition:
    """Rank-k column interpolative decomposition of ``[B, m, n]``
    batches: pick k actual columns by Gram pivoted Cholesky, then
    interpolate the rest by least squares (CholeskyQR2 + refinement).
    All stages are batched GEMMs."""
    from .lstsq import lstsq_batched

    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    cols, ok = _select_columns_gram(a, k)
    C = _gather_cols(a, cols)
    ls = lstsq_batched(C, a)
    X = ls.x                                            # [B, k, n]
    rec = jnp.einsum("bmk,bkn->bmn", C, X, precision=_HIGH)
    err = jnp.sqrt(jnp.sum((a - rec) ** 2, axis=(1, 2)))
    nrm = jnp.maximum(jnp.sqrt(jnp.sum(a * a, axis=(1, 2))), 1e-30)
    return InterpolativeDecomposition(
        cols, X, err / nrm, ok & ls.ok
    )


@functools.partial(jax.jit, static_argnames=("k",))
@f32_matmuls
def cur_batched(a: jax.Array, k: int) -> CURDecomposition:
    """Rank-k CUR decomposition: columns by Gram pivoted Cholesky of
    AᵀA, rows of AAᵀ, and the core ``U = C⁺ A R⁺`` from two
    least-squares solves — a low-rank factorization whose factors are
    ROWS AND COLUMNS OF A ITSELF (interpretable, sparsity/sign
    preserving, unlike the SVD's dense singular vectors)."""
    from .lstsq import lstsq_batched

    f32 = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(f32)
    cols, okc = _select_columns_gram(a, k)
    at = jnp.swapaxes(a, 1, 2)
    rows, okr = _select_columns_gram(at, k)
    C = _gather_cols(a, cols)                           # [B, m, k]
    R = jnp.swapaxes(_gather_cols(at, rows), 1, 2)      # [B, k, n]
    # U = C⁺ A R⁺: first Y = C⁺ A  [B, k, n], then U from R via the
    # transposed system (Rᵀ Uᵀ = Yᵀ, minimum-norm).
    ls1 = lstsq_batched(C, a)
    Y = ls1.x
    ls2 = lstsq_batched(jnp.swapaxes(R, 1, 2), jnp.swapaxes(Y, 1, 2))
    U = jnp.swapaxes(ls2.x, 1, 2)                       # [B, k, k]
    rec = jnp.einsum(
        "bmk,bkj,bjn->bmn", C, U, R, precision=_HIGH
    )
    err = jnp.sqrt(jnp.sum((a - rec) ** 2, axis=(1, 2)))
    nrm = jnp.maximum(jnp.sqrt(jnp.sum(a * a, axis=(1, 2))), 1e-30)
    return CURDecomposition(
        cols, rows, C, U, R, err / nrm, okc & okr & ls1.ok & ls2.ok
    )
