"""Matrix nearness solvers vs f64 oracles and optimality properties."""

import numpy as np

import jax.numpy as jnp

from linalg_solver_tpu.ops.nearness import (
    nearest_correlation_batched,
    nearest_orthogonal_batched,
    nearest_psd_batched,
)


class TestNearestPSD:
    def test_psd_and_optimal(self):
        rng = np.random.RandomState(0)
        n = 10
        A = rng.randn(2, n, n).astype(np.float32)  # indefinite, asym
        res = nearest_psd_batched(jnp.asarray(A))
        X = np.asarray(res.x, np.float64)
        for i in range(2):
            w = np.linalg.eigvalsh(X[i])
            assert w.min() > -1e-5
            # Higham's closed form in f64
            S = (A[i].astype(np.float64) + A[i].astype(np.float64).T) / 2
            we, V = np.linalg.eigh(S)
            want = V @ np.diag(np.maximum(we, 0)) @ V.T
            np.testing.assert_allclose(X[i], want, atol=1e-4)
            np.testing.assert_allclose(
                float(res.distance[i]),
                np.linalg.norm(A[i].astype(np.float64) - want),
                rtol=1e-3,
            )

    def test_psd_input_is_fixed_point(self):
        rng = np.random.RandomState(1)
        M = rng.randn(1, 8, 8)
        A = (M @ np.swapaxes(M, 1, 2)).astype(np.float32)
        res = nearest_psd_batched(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(res.x), A, atol=1e-3)
        assert float(res.distance[0]) < 1e-3

    def test_shift_gives_definite(self):
        A = np.diag([-1.0, 0.0, 5.0]).astype(np.float32)[None]
        res = nearest_psd_batched(jnp.asarray(A), shift=1e-3)
        w = np.linalg.eigvalsh(np.asarray(res.x[0], np.float64))
        assert w.min() >= 5e-4 * 5.0  # clipped at shift·λmax


class TestNearestCorrelation:
    def test_higham_2002_example(self):
        """Higham's 3×3 example (the motivating finance case): the
        known nearest correlation matrix to [[1,1,0],[1,1,1],[0,1,1]]
        has off-diagonals ≈ (0.7607, 0.1573, 0.7607)."""
        A = np.array(
            [[1.0, 1.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 1.0]],
            np.float32,
        )[None]
        res = nearest_correlation_batched(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        X = np.asarray(res.x[0], np.float64)
        np.testing.assert_allclose(np.diag(X), 1.0, atol=1e-5)
        assert np.linalg.eigvalsh(X).min() > -1e-6
        np.testing.assert_allclose(X[0, 1], 0.7607, atol=2e-3)
        np.testing.assert_allclose(X[0, 2], 0.1573, atol=2e-3)
        np.testing.assert_allclose(X[1, 2], 0.7607, atol=2e-3)

    def test_feasible_and_no_better_neighbor(self):
        """Output is a correlation matrix and locally optimal: random
        feasible perturbations never get closer to A."""
        rng = np.random.RandomState(2)
        n = 6
        M = rng.randn(2, n, n)
        A = (M + np.swapaxes(M, 1, 2)).astype(np.float32)
        res = nearest_correlation_batched(jnp.asarray(A))
        X = np.asarray(res.x, np.float64)
        for i in range(2):
            assert np.abs(np.diag(X[i]) - 1).max() < 1e-5
            assert np.linalg.eigvalsh(X[i]).min() > -1e-6
            d0 = np.linalg.norm(A[i].astype(np.float64) - X[i])
            for t in range(20):
                # random correlation matrix = normalized Gram
                G = rng.randn(n, n + 2)
                C = G @ G.T
                dd = np.sqrt(np.diag(C))
                C = C / np.outer(dd, dd)
                assert np.linalg.norm(
                    A[i].astype(np.float64) - C
                ) >= d0 - 1e-4

    def test_correlation_input_is_fixed_point(self):
        rng = np.random.RandomState(3)
        G = rng.randn(1, 8, 12)
        C = np.einsum("bij,bkj->bik", G, G)
        d = np.sqrt(np.einsum("bii->bi", C))
        C = (C / (d[:, :, None] * d[:, None, :])).astype(np.float32)
        res = nearest_correlation_batched(jnp.asarray(C))
        np.testing.assert_allclose(np.asarray(res.x), C, atol=1e-4)
        assert float(res.distance[0]) < 1e-3


class TestNearestOrthogonal:
    def test_polar_factor_optimality(self):
        rng = np.random.RandomState(4)
        A = (rng.randn(2, 7, 7) + 2 * np.eye(7)).astype(np.float32)
        q, d, ok = nearest_orthogonal_batched(jnp.asarray(A))
        assert bool(np.asarray(ok).all())
        q = np.asarray(q, np.float64)
        for i in range(2):
            np.testing.assert_allclose(
                q[i].T @ q[i], np.eye(7), atol=1e-5
            )
            # f64 oracle: U Vᵀ from the SVD
            U, _, Vt = np.linalg.svd(A[i].astype(np.float64))
            np.testing.assert_allclose(q[i], U @ Vt, atol=1e-4)


class TestNegativeSemidefiniteShift:
    def test_shift_repairs_nsd_input_to_definite(self):
        """A negative-semidefinite input with shift>0 must repair to a
        strictly positive-definite matrix, not the zero matrix
        (the floor scales by max|λ|, not signed λmax — ADVICE r1)."""
        rng = np.random.RandomState(7)
        Q, _ = np.linalg.qr(rng.randn(2, 8, 8))
        w = -np.linspace(1.0, 5.0, 8)
        A = np.einsum("bik,k,bjk->bij", Q, w, Q).astype(np.float32)
        res = nearest_psd_batched(jnp.asarray(A), shift=1e-4)
        wmin = np.linalg.eigvalsh(np.asarray(res.x, np.float64)).min()
        assert wmin >= 1e-4 * 5.0 * 0.5  # floor = shift·max|λ| ≈ 5e-4
        # Cholesky must succeed
        np.linalg.cholesky(np.asarray(res.x, np.float64))
