"""SPD Cholesky fast path + PCR tridiagonal solver vs oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.spd import (
    cholesky_batched,
    cholesky_inverse_batched,
    cholesky_solve_batched,
    logdet_spd_batched,
)
from linalg_solver_tpu.ops.tridiag import tridiag_solve_batched


def spd(B, n, seed=0):
    rng = np.random.RandomState(seed)
    G = rng.randn(B, n, n).astype(np.float32)
    return np.einsum("bik,bjk->bij", G, G) + 0.5 * np.eye(
        n, dtype=np.float32
    )


class TestCholesky:
    def test_solve_matches_numpy(self):
        A = spd(3, 12, seed=1)
        b = np.random.RandomState(2).randn(3, 12).astype(np.float32)
        x, ok = cholesky_solve_batched(jnp.asarray(A), jnp.asarray(b))
        assert bool(np.asarray(ok).all())
        for i in range(3):
            want = np.linalg.solve(A[i].astype(np.float64), b[i])
            np.testing.assert_allclose(
                np.asarray(x)[i], want, atol=1e-3
            )

    def test_inverse_and_logdet(self):
        A = spd(2, 10, seed=3)
        inv, ok = cholesky_inverse_batched(jnp.asarray(A))
        ld, ok2 = logdet_spd_batched(jnp.asarray(A))
        assert bool(np.asarray(ok).all() and np.asarray(ok2).all())
        for i in range(2):
            np.testing.assert_allclose(
                A[i] @ np.asarray(inv)[i], np.eye(10), atol=1e-3
            )
            want = np.linalg.slogdet(A[i].astype(np.float64))[1]
            np.testing.assert_allclose(
                float(np.asarray(ld)[i]), want, rtol=1e-4
            )

    def test_non_spd_flagged(self):
        A = spd(2, 8, seed=4)
        A[1] -= 10.0 * np.eye(8, dtype=np.float32)  # indefinite
        res = cholesky_batched(jnp.asarray(A))
        ok = np.asarray(res.ok)
        assert bool(ok[0]) and not bool(ok[1])
        _, ok_s = cholesky_solve_batched(
            jnp.asarray(A), jnp.zeros((2, 8), np.float32)
        )
        assert not bool(np.asarray(ok_s)[1])


def tridiag_dense(dl, d, du):
    n = d.shape[0]
    M = np.diag(d)
    M += np.diag(dl[1:], -1)
    M += np.diag(du[:-1], 1)
    return M


class TestTridiagPCR:
    @pytest.mark.parametrize("n", [2, 5, 16, 33, 128])
    def test_matches_dense_solve(self, n):
        rng = np.random.RandomState(n)
        B = 3
        dl = rng.randn(B, n).astype(np.float32)
        du = rng.randn(B, n).astype(np.float32)
        d = (
            np.abs(dl) + np.abs(du) + 1.0
            + rng.rand(B, n)
        ).astype(np.float32)  # diagonally dominant
        b = rng.randn(B, n).astype(np.float32)
        res = tridiag_solve_batched(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
            jnp.asarray(b),
        )
        assert bool(np.asarray(res.ok).all())
        for i in range(B):
            M = tridiag_dense(
                dl[i].astype(np.float64), d[i].astype(np.float64),
                du[i].astype(np.float64),
            )
            want = np.linalg.solve(M, b[i])
            np.testing.assert_allclose(
                np.asarray(res.x)[i], want, atol=1e-4
            )

    def test_block_rhs(self):
        rng = np.random.RandomState(9)
        B, n, k = 2, 20, 3
        dl = rng.randn(B, n).astype(np.float32)
        du = rng.randn(B, n).astype(np.float32)
        d = (np.abs(dl) + np.abs(du) + 1.5).astype(np.float32)
        b = rng.randn(B, n, k).astype(np.float32)
        res = tridiag_solve_batched(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
            jnp.asarray(b),
        )
        assert np.asarray(res.x).shape == (B, n, k)
        for i in range(B):
            M = tridiag_dense(
                dl[i].astype(np.float64), d[i].astype(np.float64),
                du[i].astype(np.float64),
            )
            np.testing.assert_allclose(
                np.asarray(res.x)[i], np.linalg.solve(M, b[i]),
                atol=1e-4,
            )

    def test_laplacian_spline_shape(self):
        """The classic second-difference operator (SPD tridiagonal)."""
        n = 64
        dl = np.full((1, n), -1.0, np.float32)
        du = np.full((1, n), -1.0, np.float32)
        d = np.full((1, n), 2.0, np.float32)
        b = np.zeros((1, n), np.float32)
        b[0, n // 2] = 1.0
        res = tridiag_solve_batched(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
            jnp.asarray(b),
        )
        M = tridiag_dense(dl[0], d[0].astype(np.float64), du[0])
        want = np.linalg.solve(M, b[0])
        np.testing.assert_allclose(
            np.asarray(res.x)[0], want, atol=1e-3
        )

    def test_singular_flagged(self):
        dl = np.zeros((1, 4), np.float32)
        du = np.zeros((1, 4), np.float32)
        d = np.array([[1.0, 0.0, 1.0, 1.0]], np.float32)
        b = np.ones((1, 4), np.float32)
        res = tridiag_solve_batched(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
            jnp.asarray(b),
        )
        assert not bool(np.asarray(res.ok)[0])


class TestPivotedCholesky:
    def _batch(self, seed=0):
        rng = np.random.RandomState(seed)
        n = 32
        G = rng.randn(n, n)
        A0 = G @ G.T / n + np.eye(n)          # full rank
        W = rng.randn(n, 10)
        A1 = W @ W.T                          # exact rank 10
        Q, _ = np.linalg.qr(rng.randn(n, n))
        lam = 2.0 ** (-np.arange(n) / 2.0)
        A2 = Q @ np.diag(lam) @ Q.T           # decaying spectrum
        return np.stack([A0, A1, A2]).astype(np.float32)

    def test_rank_detection_and_reconstruction(self):
        from linalg_solver_tpu.ops.spd import pivoted_cholesky_batched

        A = self._batch()
        res = pivoted_cholesky_batched(jnp.asarray(A))
        assert bool(np.asarray(res.ok).all())
        rank = np.asarray(res.rank)
        assert rank[0] == 32 and rank[1] == 10
        L = np.asarray(res.L, np.float64)
        for b in range(3):
            err = np.abs(L[b] @ L[b].T - A[b]).max()
            assert err < 1e-4 * max(np.abs(A[b]).max(), 1.0), (b, err)

    def test_matches_lapack_pstrf_rank(self):
        from scipy.linalg.lapack import spstrf
        from linalg_solver_tpu.ops.spd import pivoted_cholesky_batched

        A = self._batch(seed=1)
        res = pivoted_cholesky_batched(jnp.asarray(A))
        _, _, rank, _ = spstrf(A[1], lower=1)
        assert int(np.asarray(res.rank)[1]) == rank

    def test_early_stop_trace_bound(self):
        """max_rank=k: reported resid_diag equals the true trace of
        the remainder (the Nyström error bound)."""
        from linalg_solver_tpu.ops.spd import pivoted_cholesky_batched

        A = self._batch(seed=2)
        res = pivoted_cholesky_batched(jnp.asarray(A), max_rank=5)
        L = np.asarray(res.L, np.float64)
        for b in range(3):
            tr = np.trace(A[b] - L[b] @ L[b].T)
            np.testing.assert_allclose(
                float(np.asarray(res.resid_diag)[b]), tr,
                rtol=1e-3, atol=1e-4,
            )
        # greedy diagonal pivoting decays the trace fastest on the
        # decaying-spectrum lane
        assert float(np.asarray(res.resid_diag)[2]) < 1.0

    def test_indefinite_flagged(self):
        from linalg_solver_tpu.ops.spd import pivoted_cholesky_batched

        rng = np.random.RandomState(3)
        n = 16
        A = np.diag(np.concatenate([np.ones(8), -0.5 * np.ones(8)]))
        A = A + 0.01 * rng.randn(n, n)
        A = ((A + A.T) / 2)[None].astype(np.float32)
        res = pivoted_cholesky_batched(jnp.asarray(A))
        assert not bool(np.asarray(res.ok).all())
