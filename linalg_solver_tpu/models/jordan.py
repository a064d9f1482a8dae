"""Jordan-structure analysis of large matrix batches (BASELINE config 5).

For each candidate eigenvalue λ, the Weyr characteristic
``w_k = rank((A−λI)^{k−1}) − rank((A−λI)^k)`` determines the complete
Jordan block structure:

- ``w_1``            = geometric multiplicity (number of Jordan blocks),
- ``Σ_k w_k``        = algebraic multiplicity,
- ``w_k − w_{k+1}``  = number of blocks of size exactly k.

Matrix powers are batched MXU matmuls; ranks come from either

- ``method="svd"`` — singular values (robust, the default), or
- ``method="gj"``  — Gauss–Jordan pivot counting with column skipping
  (exact column-deficiency handling; cheaper than SVD for small N).

(A plain LU-diagonal count is NOT rank-revealing once a zero pivot
appears mid-factorization — partial pivoting has no column exchange — so
it is deliberately not offered.)

This is the device-scale counterpart of the exact path's
``eigenvalues_with_geometric_multiplicities`` on Jordan-form input
(reference linalg.py:808-818 over random_matrix.py:144-167 matrices).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.precision import f32_matmuls
from jax import lax

from ..ops.solve import rank_batched as _gj_rank_batched


class JordanReport(NamedTuple):
    weyr: jax.Array        # [B, E, k_max] Weyr characteristic per eigenvalue
    alg_mult: jax.Array    # [B, E]
    geom_mult: jax.Array   # [B, E]
    block_counts: jax.Array  # [B, E, k_max] number of Jordan blocks of size k


def _rank_gj(mats: jax.Array, coeff: float) -> jax.Array:
    """Batched numerical rank via Gauss–Jordan pivot counting (handles
    column deficiency by skipping, unlike LU-diagonal counting)."""
    n = mats.shape[-1]
    tol = coeff * (n ** 0.5) * jnp.max(jnp.abs(mats), axis=(1, 2))
    return jax.vmap(
        lambda m, t: _gj_rank_batched(m[None], tol=t)[0]
    )(mats, tol)


def _rank_svd(mats: jax.Array, coeff: float) -> jax.Array:
    s = jnp.linalg.svd(mats, compute_uv=False)
    tol = coeff * s[..., 0]  # relative to the spectral norm
    return jnp.sum(s > tol[:, None], axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k_max", "method"))
@f32_matmuls
def jordan_analysis(
    a: jax.Array,
    eigenvalues: jax.Array,
    k_max: int = 4,
    method: str = "svd",
    rel_tol: Optional[float] = None,
) -> JordanReport:
    """Weyr/Jordan structure of ``a[B, n, n]`` at each candidate eigenvalue
    (``eigenvalues: [E]`` shared across the batch, or ``[B, E]``).

    ``rel_tol`` is the rank threshold relative to each power's spectral
    norm; the default ``100·n·eps`` absorbs the f32 formation error of
    similarity-transformed inputs while staying far below genuine
    singular values (which are O(1) relative for Jordan-structured
    input)."""
    B, n, _ = a.shape
    a = a.astype(jnp.result_type(a.dtype, jnp.float32))
    if eigenvalues.ndim == 1:
        eigenvalues = jnp.broadcast_to(
            eigenvalues[None, :], (B, eigenvalues.shape[0])
        )
    E = eigenvalues.shape[1]
    if method not in ("svd", "gj"):
        raise ValueError(f"unknown rank method: {method!r}")
    if rel_tol is None:
        rel_tol = 100 * n * float(jnp.finfo(jnp.float32).eps)
    rank_fn = _rank_gj if method == "gj" else _rank_svd

    eye = jnp.eye(n, dtype=a.dtype)

    def per_eig(lam):  # lam: [B]
        shifted = a - lam[:, None, None] * eye

        def power_step(P, _):
            P_next = P @ shifted
            # The threshold is computed per power inside rank_fn: exact
            # zeros of (A-λI)^k carry float residues that scale with the
            # power's own magnitude.
            return P_next, rank_fn(P_next, rel_tol)

        _, ranks = lax.scan(
            power_step,
            jnp.broadcast_to(eye, (B, n, n)),
            None,
            length=k_max,
        )                                   # [k_max, B]
        ranks = jnp.moveaxis(ranks, 0, 1)   # [B, k_max]
        prev = jnp.concatenate(
            [jnp.full((B, 1), n, ranks.dtype), ranks[:, :-1]], axis=1
        )
        return (prev - ranks).astype(jnp.int32)  # Weyr [B, k_max]

    weyr = jax.vmap(per_eig, in_axes=1, out_axes=1)(eigenvalues)
    # weyr: [B, E, k_max]
    alg = weyr.sum(axis=-1)
    geom = weyr[:, :, 0]
    nxt = jnp.concatenate(
        [weyr[:, :, 1:], jnp.zeros((B, E, 1), weyr.dtype)], axis=-1
    )
    block_counts = weyr - nxt
    return JordanReport(weyr, alg, geom, block_counts)
