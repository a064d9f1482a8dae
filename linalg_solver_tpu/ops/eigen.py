"""Batched eigen stack on device.

Numeric counterpart of the exact path's eigen machinery
(reference linalg.py:424-480,758-863), redesigned TPU-first:

- **Characteristic polynomial** via Faddeev–LeVerrier — n batched matmuls
  (ideal MXU work), no elimination, no symbolic scalars
  (replaces det(A - λI) over Polynomial entries).
- **Eigenvalues** via shifted QR iteration (Wilkinson shift) on the full
  matrix, with a final pass extracting complex-conjugate pairs from
  residual 2×2 blocks; symmetric inputs can use ``jnp.linalg.eigh``.
- **Eigenspaces** = nullspace of (A - λI), reusing the Gauss–Jordan engine.
- **Multiplicities**: algebraic by tolerance-clustering of the eigenvalue
  array (pairwise-distance counting, vectorized); geometric =
  n − rank(A − λI); full Weyr characteristic from rank((A − λI)^k) —
  batched matrix powers, again MXU work — which determines the Jordan
  block structure.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls
from jax import lax

_HIGH = jax.lax.Precision.HIGHEST

from .rref import rref
from .solve import BatchedAffineSubspace, inverse, nullspace, rank, solve


# ---------------------------------------------------------------------------
# Characteristic polynomial (Faddeev–LeVerrier)
# ---------------------------------------------------------------------------

@jax.jit
@f32_matmuls
def charpoly(a: jax.Array) -> jax.Array:
    """Coefficients of ``p(λ) = det(λI − A)`` (monic), highest degree first:
    ``[1, c_{n-1}, ..., c_0]``.

    Faddeev–LeVerrier:  M₁ = I;  cₖ = −tr(A·Mₖ)/k;  Mₖ₊₁ = A·Mₖ + cₖ·I.
    """
    n = a.shape[-1]
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    eye = jnp.eye(n, dtype=a.dtype)

    def step(M, k):
        AM = a @ M
        c = -jnp.trace(AM) / k
        return AM + c * eye, c

    _, coeffs = lax.scan(step, eye, jnp.arange(1, n + 1, dtype=a.dtype))
    return jnp.concatenate([jnp.ones((1,), a.dtype), coeffs])


def charpoly_batched(a: jax.Array) -> jax.Array:
    return jax.vmap(charpoly)(a)


@jax.jit
def charpoly_det_lambda(a: jax.Array) -> jax.Array:
    """``det(A − λI)`` coefficients (the exact path's sign convention,
    reference linalg.py:441): ``(−1)^n · p(λ)``, highest degree first."""
    n = a.shape[-1]
    return charpoly(a) * ((-1) ** n)


# ---------------------------------------------------------------------------
# Eigenvalues: shifted QR iteration
# ---------------------------------------------------------------------------

class EigvalsResult(NamedTuple):
    real: jax.Array  # [..., n]
    imag: jax.Array  # [..., n]


def householder_qr(a: jax.Array):
    """Full-precision QR of a square matrix via Householder reflections.

    ``jnp.linalg.qr`` on TPU runs its internal products at reduced matmul
    precision (measured |QR−A| ≈ 7e-3 relative) and ignores the precision
    context — useless inside an iterative eigensolver.  This version uses
    only VPU elementwise ops and explicitly-f32 matvecs.
    """
    n = a.shape[0]
    idx = jnp.arange(n)

    def body(k, carry):
        R, Qt = carry
        x = R[:, k]
        mask = (idx >= k).astype(R.dtype)
        xm = x * mask
        xk = R[k, k]
        alpha = -jnp.sign(jnp.where(xk == 0, 1.0, xk)) * jnp.sqrt(
            jnp.sum(xm * xm)
        )
        v = xm - alpha * (idx == k).astype(R.dtype)
        vnorm2 = jnp.sum(v * v)
        beta = jnp.where(vnorm2 > 0, 2.0 / vnorm2, 0.0)
        vR = jax.lax.dot_general(
            v, R, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        R = R - beta * v[:, None] * vR[None, :]
        vQ = jax.lax.dot_general(
            v, Qt, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        Qt = Qt - beta * v[:, None] * vQ[None, :]
        return R, Qt

    R, Qt = lax.fori_loop(
        0, n, body, (a, jnp.eye(n, dtype=a.dtype))
    )
    return Qt.T, R


@functools.partial(jax.jit, static_argnames=("iters",))
def eigvals_qr(a: jax.Array, iters: int = 100) -> EigvalsResult:
    """Eigenvalues of a real ``[n, n]`` matrix via Wilkinson-shifted QR.

    Converges to (quasi-)upper-triangular form; real eigenvalues read off
    the diagonal, complex-conjugate pairs recovered from remaining 2×2
    diagonal blocks.  No deflation — fixed iteration count keeps the loop
    jittable; ``iters≈100`` is ample for the small/medium n this targets.
    """
    n = a.shape[0]
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))

    if n == 1:
        return EigvalsResult(a[0], jnp.zeros((1,), a.dtype))

    eye = jnp.eye(n, dtype=a.dtype)

    def body(_, A):
        # Wilkinson shift from the trailing 2x2 block.  (This loop runs
        # under float32 matmul precision: the TPU's default bf16 matmul
        # mantissa stalls the iteration at O(1e-2) errors.)
        t = A[n - 2, n - 2] + A[n - 1, n - 1]
        d = A[n - 2, n - 2] * A[n - 1, n - 1] - A[n - 2, n - 1] * A[n - 1, n - 2]
        disc = t * t / 4 - d
        sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0))
        mu1 = t / 2 + sqrt_disc
        mu2 = t / 2 - sqrt_disc
        # Pick the root closer to the bottom-right entry; fall back to a
        # real shift of t/2 when the block has complex eigenvalues.
        corner = A[n - 1, n - 1]
        mu = jnp.where(
            jnp.abs(mu1 - corner) < jnp.abs(mu2 - corner), mu1, mu2
        )
        mu = jnp.where(disc >= 0, mu, t / 2)
        Q, R = householder_qr(A - mu * eye)
        RQ = jax.lax.dot_general(
            R, Q, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return RQ + mu * eye

    A = lax.fori_loop(0, iters, body, a)

    # Classify 2x2 diagonal blocks: positions where the subdiagonal has not
    # converged to zero hold complex pairs.
    diag = jnp.diagonal(A)
    sub = jnp.concatenate([jnp.diagonal(A, -1), jnp.zeros((1,), A.dtype)])
    scale = jnp.abs(diag) + jnp.abs(jnp.roll(diag, -1)) + 1e-30
    eps = jnp.asarray(100, A.dtype) * jnp.finfo(A.dtype).eps
    live_sub = jnp.abs(sub) > eps * scale  # [n], True at i => block (i, i+1)

    # For a block starting at i: eigenvalues of [[a,b],[c,d]].
    up = jnp.concatenate([jnp.diagonal(A, 1), jnp.zeros((1,), A.dtype)])
    nxt = jnp.roll(diag, -1)
    tr2 = diag + nxt
    det2 = diag * nxt - up * sub
    disc2 = tr2 * tr2 / 4 - det2
    re_pair = tr2 / 2
    im_pair = jnp.sqrt(jnp.maximum(-disc2, 0))
    sq = jnp.sqrt(jnp.maximum(disc2, 0))

    # is_second[i] = the block starts at i-1 (i is its second element).
    is_second = jnp.concatenate(
        [jnp.zeros((1,), bool), live_sub[:-1]]
    )
    is_first = live_sub & ~is_second

    real = jnp.where(is_first, re_pair, diag)
    real = jnp.where(is_second, jnp.roll(re_pair, 1), real)
    # Real 2x2 block (disc2 >= 0) that never decoupled: split into the two
    # real roots; complex block: conjugate pair.
    real = jnp.where(is_first & (disc2 >= 0), re_pair + sq, real)
    real = jnp.where(
        is_second & (jnp.roll(disc2, 1) >= 0),
        jnp.roll(re_pair - sq, 1),
        real,
    )
    imag = jnp.where(is_first & (disc2 < 0), im_pair, 0)
    imag = jnp.where(
        is_second & (jnp.roll(disc2, 1) < 0), -jnp.roll(im_pair, 1), imag
    )
    return EigvalsResult(real, imag)


def eigvals_qr_batched(a: jax.Array, iters: int = 100) -> EigvalsResult:
    return jax.vmap(functools.partial(eigvals_qr, iters=iters))(a)


# ---------------------------------------------------------------------------
# Multiplicities & eigenspaces
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def algebraic_multiplicities(
    real: jax.Array, imag: jax.Array, tol: float = 1e-3
) -> jax.Array:
    """For each eigenvalue slot i, the count of eigenvalues within ``tol``
    (itself included) — i.e. the algebraic multiplicity of its cluster."""
    dr = real[:, None] - real[None, :]
    di = imag[:, None] - imag[None, :]
    close = dr * dr + di * di <= tol * tol
    return close.sum(axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def eigenspace(
    a: jax.Array, eigenvalue: jax.Array, tol: float = 1e-4
) -> BatchedAffineSubspace:
    """Nullspace of ``A − λI`` (reference linalg.py:758-770, on device)."""
    n = a.shape[0]
    shifted = a - eigenvalue * jnp.eye(n, dtype=a.dtype)
    return nullspace(shifted, tol=tol, pivot_rule="partial")


def eigenspace_batched(a, eigenvalue, tol: float = 1e-4):
    return jax.vmap(functools.partial(eigenspace, tol=tol))(a, eigenvalue)


@functools.partial(jax.jit, static_argnames=())
def geometric_multiplicity(
    a: jax.Array, eigenvalue: jax.Array, tol: Optional[float] = None
) -> jax.Array:
    """n − rank(A − λI)."""
    n = a.shape[0]
    shifted = a - eigenvalue * jnp.eye(n, dtype=a.dtype)
    return n - rank(shifted, tol=tol)


@functools.partial(jax.jit, static_argnames=("k_max",))
@f32_matmuls
def weyr_characteristic(
    a: jax.Array, eigenvalue: jax.Array, k_max: int,
    tol: Optional[float] = None,
) -> jax.Array:
    """``w_k = rank((A − λI)^{k-1}) − rank((A − λI)^k)`` for k = 1..k_max.

    ``w_1`` is the geometric multiplicity (number of Jordan blocks for λ);
    ``w_k − w_{k+1}`` is the number of blocks of size exactly k; ``Σ w_k``
    (over the full range) is the algebraic multiplicity.  Matrix powers are
    batched matmuls — pure MXU work.
    """
    n = a.shape[0]
    shifted = a - eigenvalue * jnp.eye(n, dtype=a.dtype)

    def step(P, _):
        P_next = P @ shifted
        return P_next, rank(P_next, tol=tol)

    _, ranks = lax.scan(
        step, jnp.eye(n, dtype=shifted.dtype), None, length=k_max
    )
    prev = jnp.concatenate([jnp.array([n], ranks.dtype), ranks[:-1]])
    return (prev - ranks).astype(jnp.int32)


def weyr_characteristic_batched(a, eigenvalue, k_max: int,
                                tol: Optional[float] = None):
    return jax.vmap(
        functools.partial(weyr_characteristic, k_max=k_max, tol=tol)
    )(a, eigenvalue)


# ---------------------------------------------------------------------------
# Diagonalization
# ---------------------------------------------------------------------------

class DiagonalizationDevResult(NamedTuple):
    """Device diagonalization ``A = P · diag(eigenvalues) · P⁻¹``."""

    eigenvalues: jax.Array   # [..., n] real parts (sorted descending)
    eig_imag: jax.Array      # [..., n] imaginary parts
    alg_mult: jax.Array      # [..., n] per-slot algebraic multiplicities
    P: jax.Array             # [..., n, n] eigenvector columns
    P_inv: jax.Array         # [..., n, n]
    D: jax.Array             # [..., n, n]
    success: jax.Array       # [...] bool


@functools.partial(jax.jit, static_argnames=("iters",))
@f32_matmuls
def diagonalize(
    a: jax.Array,
    iters: int = 100,
    tol: float = 1e-4,
    space_tol: float = 1e-3,
    eigvals: Optional[EigvalsResult] = None,
) -> DiagonalizationDevResult:
    """Batched numeric diagonalization over the reals.

    For each eigenvalue cluster (radius ``tol``) the eigenvalue is refined
    to the cluster mean — this recovers exact multiple eigenvalues whose QR
    estimates split by O(√eps), so a genuinely defective matrix shows up as
    a rank-deficient eigenspace instead of two spurious simple eigenvalues.
    The eigenspace basis is then the Gauss–Jordan nullspace of A − λI with
    pivot tolerance ``space_tol``; success iff the collected basis has full
    count (and all eigenvalues are real).

    Mirrors the exact path's diagonalize (reference linalg.py:833-863) with
    padded/masked shapes instead of Python control flow.
    """
    n = a.shape[0]
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    ev = eigvals_qr(a, iters=iters) if eigvals is None else eigvals
    order = jnp.argsort(-ev.real)
    lam = ev.real[order]
    lam_im = ev.imag[order]
    all_real = (jnp.abs(lam_im) <= tol).all()
    alg = algebraic_multiplicities(lam, lam_im, tol=tol)

    # Refine each eigenvalue to its cluster mean.
    dr = lam[:, None] - lam[None, :]
    di = lam_im[:, None] - lam_im[None, :]
    close = (dr * dr + di * di <= tol * tol).astype(a.dtype)
    lam_refined = (close @ lam) / close.sum(axis=1)

    # For each eigenvalue slot, that λ's nullspace generators (padded).
    spaces = jax.vmap(lambda l: eigenspace(a, l, tol=space_tol))(lam_refined)
    # spaces.generators: [n, n, n]; gen_mask: [n, n]

    # A slot is "primary" if it is the first slot of its cluster.
    first_of_cluster = jnp.ones((n,), bool)
    same_as_prev = jnp.abs(lam - jnp.roll(lam, 1)) <= tol
    first_of_cluster = first_of_cluster.at[1:].set(~same_as_prev[1:])

    # Collect eigenvector columns: for primary slot s with geometric
    # multiplicity g_s, take its first g_s valid generator columns.
    # Build P by scanning slots and appending valid columns.
    def collect(carry, slot):
        P, count = carry
        gens, mask = slot  # [n, n], [n]  (mask: valid generator columns)

        def put_col(carry2, j):
            P2, cnt = carry2
            valid = mask[j]
            col = gens[:, j]
            norm = jnp.sqrt((col * col).sum())
            col = col / jnp.where(norm > 0, norm, 1)
            P2 = jnp.where(
                valid,
                lax.dynamic_update_slice(
                    P2, col[:, None], (0, jnp.minimum(cnt, n - 1))
                ),
                P2,
            )
            return (P2, cnt + valid.astype(jnp.int32)), None

        (P, count), _ = lax.scan(put_col, (P, count), jnp.arange(n))
        return (P, count), None

    # Mask out non-primary slots so each cluster contributes once.
    masked_gen_mask = spaces.gen_mask & first_of_cluster[:, None]
    (P, count), _ = lax.scan(
        collect,
        (jnp.zeros((n, n), a.dtype), jnp.int32(0)),
        (spaces.generators, masked_gen_mask),
    )

    success = (count == n) & all_real
    inv_res = inverse(jnp.where(success, P, jnp.eye(n, dtype=a.dtype)),
                      tol=1e-30, pivot_rule="partial")
    P_inv = inv_res.inverse
    success = success & inv_res.is_invertible
    D = P_inv @ a @ P
    return DiagonalizationDevResult(
        lam, lam_im, alg, P, P_inv, D, success
    )


def diagonalize_batched(a, iters: int = 100, tol: float = 1e-4,
                        space_tol: float = 1e-3):
    return jax.vmap(
        functools.partial(
            diagonalize, iters=iters, tol=tol, space_tol=space_tol
        )
    )(a)


# ---------------------------------------------------------------------------
# Batched spectral decomposition (distinct-eigenvalue compaction)
# ---------------------------------------------------------------------------

class SpectralDecomposition(NamedTuple):
    """Batched eigen-analysis: per-slot eigenvalues (sorted by descending
    real part) with algebraic/geometric multiplicities, plus the
    diagonalization ``A = P D P⁻¹`` where it exists."""

    eigenvalues: jax.Array   # [B, n] real parts
    eig_imag: jax.Array      # [B, n]
    alg_mult: jax.Array      # [B, n]
    geom_mult: jax.Array     # [B, n]
    P: jax.Array             # [B, n, n]
    P_inv: jax.Array         # [B, n, n]
    D: jax.Array             # [B, n, n]
    success: jax.Array       # [B]


@functools.partial(
    jax.jit, static_argnames=("max_distinct", "interpret")
)
@f32_matmuls
def spectral_decompose_batched(
    a: jax.Array,
    ev_real: jax.Array,
    ev_imag: jax.Array,
    tol: float = 1e-3,
    space_tol: Optional[float] = None,
    max_distinct: Optional[int] = None,
    success_tol: Optional[float] = None,
    interpret: bool = False,
) -> SpectralDecomposition:
    """Multiplicities + diagonalization for a batch, given precomputed
    eigenvalues — the TPU-shaped replacement for vmapping the per-slot
    path (reference ``diagonalize``, linalg.py:833-863).

    The per-slot formulation computes ``rank(A − λI)`` and a nullspace
    for EVERY eigenvalue slot — O(B·n) dense eliminations, O(B·n⁴) work
    — although a spectrum has at most ``n`` (and a generated batch
    typically ~3) DISTINCT eigenvalues.  This version clusters the
    eigenvalues (radius ``tol``, refined to cluster means), compacts the
    distinct values to ``K = max_distinct`` slots (default ``n`` —
    exact), and runs ONE batched Gauss–Jordan nullspace over the
    ``[B·K]`` shifted matrices through the VMEM kernel
    (``solve_affine_gj_batched``, big-VMEM budget: n up to ~400).  Both
    the geometric multiplicities and the eigenvector basis come from
    that single pass.  Eigenvector columns are collected into ``P`` by a
    scan over the K distinct slots with one-hot column compaction —
    batched MXU work instead of per-column dynamic updates.

    Clusters beyond ``max_distinct`` (when set below the true distinct
    count) get no eigenspace: their ``geom_mult`` reads 0 and
    ``success`` is False — set it only for workloads with a known bound
    (e.g. generated spectra).

    ``space_tol`` (the nullspace rank threshold, relative to ``max|A|``)
    defaults to ``max(tol/10, 10·n·eps)`` — deliberately TIGHTER than
    the clustering radius ``tol``: the shift is the CLUSTER MEAN, whose
    error shrinks ~√multiplicity below the per-eigenvalue error, and the
    eigenvector contamination scales with space_tol/gap (at
    space_tol=tol=1e-2 on multiplicity-85 spectra the contaminated P
    fails its f32 P·P⁻¹ validation; one decade tighter restores it).
    """
    from .solve import solve_affine_gj_batched, solve_affine_gj_supported

    B, n, _ = a.shape
    dtype = jnp.result_type(a.dtype, jnp.float32)
    a = a.astype(dtype)
    K = n if max_distinct is None else min(max_distinct, n)
    if space_tol is None:
        space_tol = jnp.maximum(
            jnp.asarray(tol, dtype) / 10.0,
            10 * n * jnp.finfo(dtype).eps,
        )

    # --- sort slots by descending real part.
    order = jnp.argsort(-ev_real, axis=1)
    lam = jnp.take_along_axis(ev_real.astype(dtype), order, axis=1)
    lam_im = jnp.take_along_axis(ev_imag.astype(dtype), order, axis=1)
    all_real = (jnp.abs(lam_im) <= tol).all(axis=1)

    # --- cluster: algebraic multiplicities + refined cluster means.
    dr = lam[:, :, None] - lam[:, None, :]
    di = lam_im[:, :, None] - lam_im[:, None, :]
    close = dr * dr + di * di <= tol * tol
    alg = close.sum(axis=2).astype(jnp.int32)
    closef = close.astype(dtype)
    lam_ref = jnp.einsum("bst,bt->bs", closef, lam) / closef.sum(axis=2)

    # --- distinct compaction: cluster index per slot, first-of-cluster.
    same_prev = (
        (jnp.abs(lam - jnp.roll(lam, 1, axis=1)) <= tol)
        & (jnp.abs(lam_im - jnp.roll(lam_im, 1, axis=1)) <= tol)
    )
    first = jnp.ones((B, n), bool).at[:, 1:].set(~same_prev[:, 1:])
    pos = jnp.cumsum(first, axis=1) - 1              # [B, n] cluster idx
    kidx = jnp.arange(K)
    dist_oh = (
        first[:, :, None] & (pos[:, :, None] == kidx[None, None, :])
    ).astype(dtype)                                   # [B, n, K]
    dvals = jnp.einsum("bsk,bs->bk", dist_oh, lam_ref)
    dmask = dist_oh.sum(axis=1) > 0.5                 # [B, K]

    # --- one nullspace per distinct eigenvalue, chunked over the batch
    # so the [chunk·K, n, n] shifted stack stays bounded.  TWO passes:
    # the tight (space_tol) pass is preferred — less eigenvector
    # contamination (~rank_tol/gap) — but the eigensolver's cluster-mean
    # error varies by lane, so any fixed tolerance sometimes undershoots
    # a dimension.  Clusters whose tight-pass nullity falls short of
    # their (known) algebraic multiplicity fall back per-cluster to the
    # loose pass at the clustering radius; genuinely defective clusters
    # report geom < alg under BOTH tolerances, so the fallback does not
    # mask defectiveness.
    eye = jnp.eye(n, dtype=dtype)
    amag = jnp.maximum(jnp.max(jnp.abs(a), axis=(1, 2)), 1.0)   # [B]
    rank_tol = space_tol * amag
    rank_tol_loose = jnp.asarray(tol, dtype) * amag
    csize = (
        (pos[:, :, None] == kidx[None, None, :]).sum(axis=1)
    ).astype(jnp.int32)                               # [B, K] cluster sizes
    bchunk = max(1, (1 << 26) // max(K * n * n, 1))
    from . import pallas as _pallas_pkg

    use_kernel = solve_affine_gj_supported(n, n) and (
        interpret or _pallas_pkg.is_supported()
    )
    tidx = jnp.arange(n)

    P = jnp.zeros((B, n, n), dtype)
    count = jnp.zeros((B,), jnp.int32)
    dims_all = jnp.zeros((B, K), jnp.int32)

    def collect_k(carry, inputs):
        """Append one distinct slot's orthonormal basis columns to P at
        the running column offset (one-hot shift, MXU matmul)."""
        P_c, cnt = carry
        Q, g = inputs                              # [bc, n, n], [bc]
        c_oh = (
            (tidx[None, :, None] + cnt[:, None, None]
             == tidx[None, None, :])
            & (tidx[None, :, None] < g[:, None, None])
        ).astype(dtype)                            # [bc, t, c]
        P_c = P_c + jnp.einsum("bit,btc->bic", Q, c_oh)
        return (P_c, cnt + g), None

    for b0 in range(0, B, bchunk):
        bc = min(bchunk, B - b0)
        a_c = lax.slice_in_dim(a, b0, b0 + bc, axis=0)
        vals_c = lax.slice_in_dim(dvals, b0, b0 + bc, axis=0)
        mask_c = lax.slice_in_dim(dmask, b0, b0 + bc, axis=0)
        shifted = (
            jnp.repeat(a_c, K, axis=0)
            - vals_c.reshape(bc * K)[:, None, None] * eye
        )                                          # [bc·K, n, n]
        zeros_rhs = jnp.zeros((bc * K, n), dtype)

        def null_pass(tol_b):
            tol_v = jnp.repeat(tol_b, K)
            if use_kernel:
                sub = solve_affine_gj_batched(
                    shifted, zeros_rhs, tol=tol_v, interpret=interpret
                )
            elif n >= 256:
                # Beyond the VMEM kernel tile: blocked rank-revealing
                # Gauss–Jordan (panel + MXU trailing updates).
                from .rref_blocked import solve_affine_blocked_batched

                sub = solve_affine_blocked_batched(
                    shifted, zeros_rhs, tol=tol_v
                )
            else:
                sub = jax.vmap(
                    lambda m, t: solve(m, jnp.zeros((n,), dtype), tol=t,
                                       pivot_rule="partial")
                )(shifted, tol_v)
            gens = sub.generators.reshape(bc, K, n, n)
            gmask = sub.gen_mask.reshape(bc, K, n) & mask_c[:, :, None]
            return gens, gmask

        gens_t, gmask_t = null_pass(
            lax.slice_in_dim(rank_tol, b0, b0 + bc, axis=0)
        )
        gens_l, gmask_l = null_pass(
            lax.slice_in_dim(rank_tol_loose, b0, b0 + bc, axis=0)
        )
        alg_c = lax.slice_in_dim(csize, b0, b0 + bc, axis=0)  # [bc, K]
        use_t = gmask_t.sum(axis=2) >= alg_c                  # [bc, K]
        gens = jnp.where(use_t[:, :, None, None], gens_t, gens_l)
        gmask = jnp.where(use_t[:, :, None], gmask_t, gmask_l)
        dims_all = lax.dynamic_update_slice_in_dim(
            dims_all,
            (gmask.sum(axis=2)).astype(jnp.int32), b0, axis=0,
        )
        # Orthonormalize EVERY cluster basis in one [bc·K] batch
        # (CholeskyQR2, ops/orth.py).  This matters twice: raw RREF
        # generators give κ(P) high enough that the f32 P·P⁻¹ validation
        # fails at multiplicity ~85, and batching the cholesky/solves
        # over bc·K beats running them K-sequentially inside the scan.
        from .orth import orthonormal_columns

        Qall, gall = orthonormal_columns(
            gens.reshape(bc * K, n, n), gmask.reshape(bc * K, n)
        )
        Qall = Qall.reshape(bc, K, n, n)
        gall = gall.reshape(bc, K)
        (P_c, cnt_c), _ = lax.scan(
            collect_k,
            (jnp.zeros((bc, n, n), dtype), jnp.zeros((bc,), jnp.int32)),
            (jnp.moveaxis(Qall, 1, 0), jnp.moveaxis(gall, 1, 0)),
        )
        P = lax.dynamic_update_slice_in_dim(P, P_c, b0, axis=0)
        count = lax.dynamic_update_slice_in_dim(count, cnt_c, b0, axis=0)

    # --- per-slot geometric multiplicities: geom[b, s] = dim of the
    # slot's cluster.
    pos_oh = (pos[:, :, None] == kidx[None, None, :]).astype(dtype)
    geom = jnp.einsum(
        "bsk,bk->bs", pos_oh, dims_all.astype(dtype)
    ).astype(jnp.int32)

    success = all_real & (count == n)

    # --- P_inv via the fast batched inverse; validate by residual.
    from . import dispatch

    P_safe = jnp.where(success[:, None, None], P, eye[None])
    P_inv = dispatch.inverse_batched(P_safe, backend="auto")
    resid = jnp.max(
        jnp.abs(P_safe @ P_inv - eye[None]), axis=(1, 2)
    )
    # The validation gate catches a (near-)singular P, not roundoff: the
    # eigenvector contamination is O(tol·‖A‖/gap) by construction (the
    # shifts carry the eigensolver's error), so the P·P⁻¹ residual
    # legitimately reaches a small multiple of the requested tol.
    if success_tol is None:
        success_tol = jnp.maximum(
            jnp.asarray(1e-2, dtype), 3.0 * jnp.asarray(tol, dtype)
        )
    success = success & jnp.isfinite(resid) & (resid < success_tol)
    D = P_inv @ a @ P_safe
    return SpectralDecomposition(
        lam, lam_im, alg, geom, P_safe, P_inv, D, success
    )
