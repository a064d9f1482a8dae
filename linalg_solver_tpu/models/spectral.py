"""Spectral pipeline: batched eigen-analysis of matrix families.

Composes the device eigen stack into one jitted report per batch:
eigenvalues (QR iteration), algebraic multiplicities (tolerance
clustering), geometric multiplicities (rank deficiency of A − λI), and
diagonalization — the device realization of the reference's
``eigenvalues_with_geometric_multiplicities`` / ``diagonalize`` flow
(reference linalg.py:808-863), including the Jordan-spectra workload
(BASELINE config 5: alg/geom multiplicity extraction).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.eigen import (
    algebraic_multiplicities,
    diagonalize,
    eigvals_qr,
    geometric_multiplicity,
)


class SpectralReport(NamedTuple):
    eig_real: jax.Array       # [B, n]
    eig_imag: jax.Array       # [B, n]
    alg_mult: jax.Array       # [B, n] algebraic multiplicity per slot
    geom_mult: jax.Array      # [B, n] geometric multiplicity per slot
    diagonalizable: jax.Array  # [B] bool
    P: jax.Array              # [B, n, n]
    P_inv: jax.Array          # [B, n, n]
    D: jax.Array              # [B, n, n]


@functools.partial(jax.jit, static_argnames=("iters",))
def spectral_pipeline(
    a: jax.Array, iters: int = 100, tol: float = 1e-3
) -> SpectralReport:
    """Full spectral report for a batch ``[B, n, n]``."""

    def single(mat):
        ev = eigvals_qr(mat, iters=iters)
        order = jnp.argsort(-ev.real)
        lam, lam_im = ev.real[order], ev.imag[order]
        alg = algebraic_multiplicities(lam, lam_im, tol=tol)
        # Rank tolerance must absorb the eigensolver's λ error (≫ machine
        # eps): use the cluster tolerance scaled by the matrix magnitude.
        rank_tol = tol * jnp.maximum(jnp.max(jnp.abs(mat)), 1.0)
        geom = jax.vmap(
            lambda l: geometric_multiplicity(mat, l, tol=rank_tol)
        )(lam)
        # Reuse the QR iteration's eigenvalues for the diagonalization —
        # the iteration is the dominant cost of the pipeline.
        diag = diagonalize(mat, iters=iters, tol=tol, eigvals=ev)
        return lam, lam_im, alg, geom, diag

    with jax.default_matmul_precision("float32"):
        lam, lam_im, alg, geom, diag = jax.vmap(single)(a)
    return SpectralReport(
        lam, lam_im, alg, geom,
        diag.success, diag.P, diag.P_inv, diag.D,
    )
