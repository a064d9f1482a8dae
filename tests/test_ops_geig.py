"""Generalized eigenproblems vs scipy."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.geig import (
    eig_generalized_batched,
    eigh_generalized_batched,
)


def spd(B, n, seed=0):
    rng = np.random.RandomState(seed)
    G = rng.randn(B, n, n).astype(np.float32)
    return np.einsum("bik,bjk->bij", G, G) + 0.5 * np.eye(
        n, dtype=np.float32
    )


class TestEighGeneralized:
    def test_matches_scipy(self):
        from scipy.linalg import eigh

        B, n = 3, 12
        rng = np.random.RandomState(1)
        A = rng.randn(B, n, n).astype(np.float32)
        A = A + np.swapaxes(A, 1, 2)
        Bm = spd(B, n, seed=2)
        res = eigh_generalized_batched(jnp.asarray(A), jnp.asarray(Bm))
        assert bool(np.asarray(res.ok).all())
        w = np.asarray(res.w)
        V = np.asarray(res.V)
        for i in range(B):
            want = eigh(
                A[i].astype(np.float64), Bm[i].astype(np.float64),
                eigvals_only=True,
            )
            scale = max(np.abs(want).max(), 1.0)
            assert np.abs(w[i] - want).max() / scale < 1e-4
            # residual + B-orthonormality
            R = A[i] @ V[i] - Bm[i] @ V[i] * w[i][None, :]
            assert np.abs(R).max() < 1e-2
            np.testing.assert_allclose(
                V[i].T @ Bm[i] @ V[i], np.eye(n), atol=1e-3
            )

    def test_non_spd_b_flagged(self):
        rng = np.random.RandomState(3)
        A = rng.randn(2, 6, 6).astype(np.float32)
        A = A + np.swapaxes(A, 1, 2)
        Bm = spd(2, 6, seed=4)
        Bm[1] -= 20.0 * np.eye(6, dtype=np.float32)
        ok = np.asarray(
            eigh_generalized_batched(jnp.asarray(A), jnp.asarray(Bm)).ok
        )
        assert bool(ok[0]) and not bool(ok[1])


class TestEigGeneralized:
    def test_matches_scipy_eig(self):
        from scipy.linalg import eig

        B, n = 2, 10
        rng = np.random.RandomState(5)
        A = rng.randn(B, n, n).astype(np.float32)
        Bm = (
            rng.randn(B, n, n) + 4.0 * np.sqrt(n) * np.eye(n)
        ).astype(np.float32)
        res = eig_generalized_batched(jnp.asarray(A), jnp.asarray(Bm))
        assert bool(np.asarray(res.ok).all())
        got = np.asarray(res.real) + 1j * np.asarray(res.imag)
        for i in range(B):
            want = eig(
                A[i].astype(np.float64), Bm[i].astype(np.float64),
                right=False,
            )
            # nearest-neighbor spectrum match (CLAUDE.md rule)
            for g in got[i]:
                j = np.argmin(np.abs(want - g))
                assert abs(want[j] - g) < 1e-3, (g, want)
                want = np.delete(want, j)

    def test_pencil_residual(self):
        """A v = λ B v residual for the computed eigenpairs."""
        rng = np.random.RandomState(6)
        n = 8
        A = rng.randn(1, n, n).astype(np.float32)
        Bm = (
            rng.randn(1, n, n) + 4.0 * np.sqrt(n) * np.eye(n)
        ).astype(np.float32)
        res = eig_generalized_batched(jnp.asarray(A), jnp.asarray(Bm))
        lam = np.asarray(res.real)[0] + 1j * np.asarray(res.imag)[0]
        V = (
            np.asarray(res.vectors_real)[0]
            + 1j * np.asarray(res.vectors_imag)[0]
        )
        valid = np.asarray(res.valid)[0]
        for j in range(n):
            if not valid[j]:
                continue
            r = A[0] @ V[:, j] - lam[j] * (Bm[0] @ V[:, j])
            assert np.abs(r).max() < 1e-2, (j, np.abs(r).max())
        assert float(np.asarray(res.rcond_b)[0]) > 1e-4
