"""Spectral pipeline: batched eigen-analysis of matrix families.

Composes the device eigen stack into one report per batch: eigenvalues,
algebraic multiplicities (tolerance clustering), geometric
multiplicities (rank deficiency of A − λI), and diagonalization — the
device realization of the reference's
``eigenvalues_with_geometric_multiplicities`` / ``diagonalize`` flow
(reference linalg.py:808-863), including the Jordan-spectra workload
(BASELINE config 5: alg/geom multiplicity extraction).

Eigenvalues come from the Francis double-shift real-Schur solver
(``ops.schur``) by default — deflating, convergence-flagged, and an
order of magnitude cheaper per matrix than the legacy unreduced QR
iteration, whose chunked host driver is why the pipeline entry point is
a host function wrapping one jitted core.  ``method="qr"`` keeps the
fully-jittable legacy path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.eigen import (
    EigvalsResult,
    algebraic_multiplicities,
    diagonalize,
    eigvals_qr,
    geometric_multiplicity,
)
from ..ops.schur import eigvals_schur


class SpectralReport(NamedTuple):
    eig_real: jax.Array       # [B, n]
    eig_imag: jax.Array       # [B, n]
    alg_mult: jax.Array       # [B, n] algebraic multiplicity per slot
    geom_mult: jax.Array      # [B, n] geometric multiplicity per slot
    diagonalizable: jax.Array  # [B] bool
    P: jax.Array              # [B, n, n]
    P_inv: jax.Array          # [B, n, n]
    D: jax.Array              # [B, n, n]


@functools.partial(jax.jit, static_argnames=())
def _spectral_core(
    a: jax.Array, ev_real: jax.Array, ev_imag: jax.Array, tol: float
) -> SpectralReport:
    """Multiplicities + diagonalization given precomputed eigenvalues."""

    def single(mat, ev_r, ev_i):
        ev = EigvalsResult(ev_r, ev_i)
        order = jnp.argsort(-ev.real)
        lam, lam_im = ev.real[order], ev.imag[order]
        alg = algebraic_multiplicities(lam, lam_im, tol=tol)
        # Rank tolerance must absorb the eigensolver's λ error (≫ machine
        # eps): use the cluster tolerance scaled by the matrix magnitude.
        rank_tol = tol * jnp.maximum(jnp.max(jnp.abs(mat)), 1.0)
        geom = jax.vmap(
            lambda l: geometric_multiplicity(mat, l, tol=rank_tol)
        )(lam)
        diag = diagonalize(mat, tol=tol, eigvals=ev)
        return lam, lam_im, alg, geom, diag

    with jax.default_matmul_precision("float32"):
        lam, lam_im, alg, geom, diag = jax.vmap(single)(
            a, ev_real, ev_imag
        )
    return SpectralReport(
        lam, lam_im, alg, geom,
        diag.success, diag.P, diag.P_inv, diag.D,
    )


def spectral_pipeline(
    a: jax.Array, iters: int = 100, tol: float = 1e-3,
    method: str = "schur",
) -> SpectralReport:
    """Full spectral report for a batch ``[B, n, n]``.

    ``method="schur"`` (default): Francis-QR eigenvalues via the chunked
    host driver, then one jitted core for multiplicities/diagonalize.
    ``method="qr"``: the legacy fully-jitted unreduced QR iteration
    (``iters`` applies only here).
    """
    if method == "schur":
        ev = eigvals_schur(a)
        return _spectral_core(a, ev.real, ev.imag, tol)
    return _spectral_pipeline_qr(a, iters=iters, tol=tol)


@functools.partial(jax.jit, static_argnames=("iters",))
def _spectral_pipeline_qr(
    a: jax.Array, iters: int = 100, tol: float = 1e-3
) -> SpectralReport:
    def single(mat):
        ev = eigvals_qr(mat, iters=iters)
        return ev.real, ev.imag

    with jax.default_matmul_precision("float32"):
        evr, evi = jax.vmap(single)(a)
    return _spectral_core(a, evr, evi, tol)
