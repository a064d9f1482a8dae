"""LOBPCG extreme eigenpairs vs numpy eigh oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.lobpcg import lobpcg_batched


def spd_with_spectrum(B, n, w, seed=0):
    rng = np.random.RandomState(seed)
    Q, _ = np.linalg.qr(rng.randn(B, n, n))
    return np.einsum("bik,k,bjk->bij", Q, w, Q), Q


class TestLOBPCG:
    def test_smallest_matches_eigh(self):
        n, k = 48, 4
        w = np.linspace(1.0, 100.0, n)
        A, _ = spd_with_spectrum(3, n, w, seed=1)
        res = lobpcg_batched(jnp.asarray(A, jnp.float32), k, tol=1e-5)
        assert bool(np.asarray(res.converged).all())
        got = np.asarray(res.w)
        np.testing.assert_allclose(
            got, np.broadcast_to(w[:k], got.shape), rtol=1e-4
        )
        # eigenvector residuals (tol is relative to ‖A‖_inf)
        V = np.asarray(res.V, np.float64)
        for b in range(3):
            R = A[b] @ V[b] - V[b] * got[b][None, :]
            anorm = np.abs(A[b]).sum(axis=1).max()
            assert np.linalg.norm(R, axis=0).max() < 4e-5 * anorm

    def test_largest_matches_eigh(self):
        n, k = 40, 3
        w = np.linspace(0.5, 80.0, n)
        A, _ = spd_with_spectrum(2, n, w, seed=2)
        res = lobpcg_batched(
            jnp.asarray(A, jnp.float32), k, largest=True, tol=1e-5
        )
        assert bool(np.asarray(res.converged).all())
        got = np.asarray(res.w)
        np.testing.assert_allclose(
            got, np.broadcast_to(w[-k:], got.shape), rtol=1e-4
        )

    def test_clustered_extreme_eigenvalues(self):
        """Nearly-multiple smallest eigenvalues — the blocked (k>1)
        iteration must resolve the whole cluster."""
        n, k = 36, 3
        w = np.concatenate([[1.0, 1.0 + 1e-3, 1.0 + 2e-3],
                            np.linspace(5.0, 50.0, n - 3)])
        A, _ = spd_with_spectrum(2, n, w, seed=3)
        res = lobpcg_batched(jnp.asarray(A, jnp.float32), k, tol=1e-5)
        got = np.sort(np.asarray(res.w), axis=1)
        np.testing.assert_allclose(
            got, np.broadcast_to(w[:k], got.shape), atol=1e-3
        )

    def test_orthonormal_vectors(self):
        n, k = 32, 4
        w = np.linspace(2.0, 60.0, n)
        A, _ = spd_with_spectrum(2, n, w, seed=4)
        res = lobpcg_batched(jnp.asarray(A, jnp.float32), k, tol=1e-5)
        V = np.asarray(res.V, np.float64)
        for b in range(2):
            np.testing.assert_allclose(
                V[b].T @ V[b], np.eye(k), atol=1e-4
            )

    def test_scale_invariance(self):
        """Regression: an absolute column-degeneracy threshold replaced
        every residual column with random noise for small-‖A‖ input
        (A scaled by 1e-7 never converged; eigenvalue error 0.33)."""
        n, k = 48, 4
        w = np.linspace(1.0, 100.0, n)
        A, _ = spd_with_spectrum(2, n, w, seed=7)
        for scale in (1e-7, 1e5):
            res = lobpcg_batched(
                jnp.asarray(scale * A, jnp.float32), k, tol=1e-5
            )
            assert bool(np.asarray(res.converged).all()), scale
            got = np.asarray(res.w)
            np.testing.assert_allclose(
                got, np.broadcast_to(scale * w[:k], got.shape),
                rtol=2e-4,
            )

    def test_needs_3k_leq_n(self):
        A = np.eye(8, dtype=np.float32)[None]
        with pytest.raises(ValueError):
            lobpcg_batched(jnp.asarray(A), 3)

    def test_mixed_difficulty_lanes_freeze(self):
        """One easy (big gap) and one harder (small gap) lane: both
        converge, per-lane flags honest."""
        n, k = 40, 2
        w_easy = np.concatenate([[1.0, 2.0], np.linspace(50, 99, n - 2)])
        w_hard = np.concatenate([[1.0, 1.05], np.linspace(1.2, 99, n - 2)])
        A = np.stack([
            spd_with_spectrum(1, n, w_easy, seed=5)[0][0],
            spd_with_spectrum(1, n, w_hard, seed=6)[0][0],
        ])
        res = lobpcg_batched(
            jnp.asarray(A, jnp.float32), k, tol=1e-4, max_iters=400
        )
        got = np.asarray(res.w)
        np.testing.assert_allclose(got[0], w_easy[:k], rtol=1e-3)
        np.testing.assert_allclose(got[1], w_hard[:k], rtol=1e-3)
