"""Sturm-bisection tridiagonal eigensolver vs scipy/LAPACK oracles."""

import numpy as np
import scipy.linalg

import jax.numpy as jnp

from linalg_solver_tpu.ops.sturm import (
    eigh_tridiagonal_batched,
    sturm_count_batched,
    tridiag_eigenvectors_batched,
)


def _trid(B, n, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.randn(B, n).astype(np.float32),
        rng.randn(B, n - 1).astype(np.float32),
    )


class TestSturmCount:
    def test_counts_match_spectrum(self):
        d, e = _trid(2, 24, seed=1)
        pts = np.array([[-3.0, -1.0, 0.0, 1.5, 3.0]] * 2, np.float32)
        cnt = np.asarray(
            sturm_count_batched(
                jnp.asarray(d), jnp.asarray(e), jnp.asarray(pts)
            )
        )
        for b in range(2):
            w = scipy.linalg.eigh_tridiagonal(
                d[b].astype(np.float64), e[b].astype(np.float64),
                eigvals_only=True,
            )
            for g, x in enumerate(pts[b]):
                assert cnt[b, g] == int((w < x).sum())

    def test_split_chain_zero_offdiag(self):
        """e contains exact zeros (split blocks): counts stay exact."""
        d = np.array([[1.0, 5.0, 2.0, 7.0]], np.float32)
        e = np.array([[0.0, 3.0, 0.0]], np.float32)
        pts = np.array([[0.0, 3.0, 10.0]], np.float32)
        cnt = np.asarray(
            sturm_count_batched(
                jnp.asarray(d), jnp.asarray(e), jnp.asarray(pts)
            )
        )
        w = scipy.linalg.eigh_tridiagonal(
            d[0].astype(np.float64), e[0].astype(np.float64),
            eigvals_only=True,
        )
        for g, x in enumerate(pts[0]):
            assert cnt[0, g] == int((w < x).sum())


class TestEigenvalues:
    def test_matches_scipy(self):
        d, e = _trid(3, 32, seed=2)
        res = eigh_tridiagonal_batched(jnp.asarray(d), jnp.asarray(e))
        assert bool(np.asarray(res.converged).all())
        for b in range(3):
            want = scipy.linalg.eigh_tridiagonal(
                d[b].astype(np.float64), e[b].astype(np.float64),
                eigvals_only=True,
            )
            got = np.asarray(res.w[b], np.float64)
            scale = np.abs(want).max()
            assert np.abs(got - want).max() / scale < 1e-5

    def test_toeplitz_tridiagonal_closed_form(self):
        """2/−1 Laplacian: eigenvalues are 2 − 2cos(kπ/(n+1))."""
        n = 48
        d = np.full((1, n), 2.0, np.float32)
        e = np.full((1, n - 1), -1.0, np.float32)
        res = eigh_tridiagonal_batched(jnp.asarray(d), jnp.asarray(e))
        want = 2.0 - 2.0 * np.cos(
            np.pi * np.arange(1, n + 1) / (n + 1)
        )
        got = np.asarray(res.w[0], np.float64)
        assert np.abs(got - np.sort(want)).max() < 1e-5

    def test_multiplicities(self):
        """Split chain with repeated eigenvalues: bisection returns
        each with its multiplicity."""
        d = np.array([[2.0, 2.0, 2.0, 5.0]], np.float32)
        e = np.zeros((1, 3), np.float32)
        res = eigh_tridiagonal_batched(jnp.asarray(d), jnp.asarray(e))
        np.testing.assert_allclose(
            np.asarray(res.w[0]), [2.0, 2.0, 2.0, 5.0], atol=1e-5
        )


class TestEigenvectors:
    def test_twisted_factorization_residuals(self):
        d, e = _trid(3, 32, seed=3)
        res = eigh_tridiagonal_batched(jnp.asarray(d), jnp.asarray(e))
        v = tridiag_eigenvectors_batched(
            jnp.asarray(d), jnp.asarray(e), res.w
        )
        assert bool(np.asarray(v.ok).all())
        assert float(np.asarray(v.resid).max()) < 1e-5

    def test_matches_scipy_vectors(self):
        d, e = _trid(1, 16, seed=4)
        res = eigh_tridiagonal_batched(jnp.asarray(d), jnp.asarray(e))
        v = tridiag_eigenvectors_batched(
            jnp.asarray(d), jnp.asarray(e), res.w
        )
        w64, V64 = scipy.linalg.eigh_tridiagonal(
            d[0].astype(np.float64), e[0].astype(np.float64)
        )
        V = np.asarray(v.V[0], np.float64)
        for j in range(16):
            c = abs(V[:, j] @ V64[:, j])  # |cos| of the angle
            assert c > 1.0 - 1e-6, j

    def test_orthogonality_separated_spectrum(self):
        d, e = _trid(2, 24, seed=5)
        res = eigh_tridiagonal_batched(jnp.asarray(d), jnp.asarray(e))
        v = tridiag_eigenvectors_batched(
            jnp.asarray(d), jnp.asarray(e), res.w
        )
        for b in range(2):
            V = np.asarray(v.V[b], np.float64)
            assert np.abs(V.T @ V - np.eye(24)).max() < 1e-4

    def test_lanczos_composition(self):
        """The intended pipeline: dense SPD → Lanczos-style tridiagonal
        (via scipy hessenberg) → Sturm eigenvalues match the dense
        spectrum."""
        rng = np.random.RandomState(6)
        n = 20
        M = rng.randn(n, n)
        A = M @ M.T + n * np.eye(n)
        H, Q = scipy.linalg.hessenberg(A, calc_q=True)
        d = np.diag(H).astype(np.float32)[None]
        e = np.diag(H, -1).astype(np.float32)[None]
        res = eigh_tridiagonal_batched(jnp.asarray(d), jnp.asarray(e))
        want = np.linalg.eigvalsh(A)
        got = np.asarray(res.w[0], np.float64)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


class TestTrivialSize:
    def test_n1_eigenvectors(self):
        """n=1 must not crash on the empty off-diagonal (ADVICE r1)."""
        d = jnp.asarray([[3.5], [-2.0]], jnp.float32)
        e = jnp.zeros((2, 0), jnp.float32)
        res = tridiag_eigenvectors_batched(d, e, d)
        np.testing.assert_allclose(
            np.asarray(res.V), np.ones((2, 1, 1)), atol=0
        )
        assert np.asarray(res.resid).max() == 0.0
        assert bool(np.asarray(res.ok).all())

    def test_n1_full_solver(self):
        d = jnp.asarray([[4.25]], jnp.float32)
        e = jnp.zeros((1, 0), jnp.float32)
        res = eigh_tridiagonal_batched(d, e)
        np.testing.assert_allclose(
            np.asarray(res.w), [[4.25]], atol=1e-5
        )
