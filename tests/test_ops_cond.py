"""Condition estimation: transpose solve + Hager κ₁ vs numpy oracle."""

import numpy as np

import jax.numpy as jnp

from linalg_solver_tpu.ops.cond import (
    cond1_est_batched,
    lu_solve_transposed,
    lu_solve_transposed_batched,
    rcond_batched,
)
from linalg_solver_tpu.ops.lu import lu_factor, lu_factor_batched


def cond1(a):
    a = a.astype(np.float64)
    return np.linalg.norm(a, 1) * np.linalg.norm(np.linalg.inv(a), 1)


class TestTransposeSolve:
    def test_matches_numpy(self):
        rng = np.random.RandomState(7)
        A = rng.randn(12, 12).astype(np.float32) + 4 * np.eye(
            12, dtype=np.float32
        )
        b = rng.randn(12).astype(np.float32)
        res = lu_factor(jnp.asarray(A))
        x = np.asarray(lu_solve_transposed(res, jnp.asarray(b)))
        want = np.linalg.solve(A.T.astype(np.float64), b)
        np.testing.assert_allclose(x, want, atol=1e-4)

    def test_block_rhs_batched(self):
        rng = np.random.RandomState(8)
        A = rng.randn(3, 10, 10).astype(np.float32) + 4 * np.eye(
            10, dtype=np.float32
        )
        Bm = rng.randn(3, 10, 2).astype(np.float32)
        res = lu_factor_batched(jnp.asarray(A))
        x = np.asarray(
            lu_solve_transposed_batched(res, jnp.asarray(Bm))
        )
        for i in range(3):
            # lane 1 draws κ≈700 — scale the tolerance accordingly
            want = np.linalg.solve(A[i].T.astype(np.float64), Bm[i])
            np.testing.assert_allclose(x[i], want, atol=1e-3)


class TestCondEstimate:
    def test_lower_bound_and_tight_on_random(self):
        """Hager's estimate is a lower bound on κ₁, in practice within
        a small factor (usually exact for random matrices)."""
        rng = np.random.RandomState(9)
        A = rng.randn(6, 24, 24).astype(np.float32) + 3 * np.eye(
            24, dtype=np.float32
        )
        est = np.asarray(cond1_est_batched(jnp.asarray(A)))
        for i in range(6):
            truth = cond1(A[i])
            assert est[i] <= truth * 1.05, (est[i], truth)
            assert est[i] >= truth * 0.3, (est[i], truth)

    def test_exact_on_diagonal(self):
        d = np.array([1.0, 0.5, 4.0, -0.25], np.float32)
        A = np.diag(d)[None]
        est = float(cond1_est_batched(jnp.asarray(A))[0])
        np.testing.assert_allclose(est, 16.0, rtol=1e-5)

    def test_flags_ill_conditioned(self):
        """A near-singular lane must report tiny rcond; a well-
        conditioned one must not."""
        n = 16
        U = np.triu(np.ones((n, n), np.float32))
        U[np.arange(n), np.arange(n)] = 1.0
        bad = (U @ U.T)  # Cholesky-style, κ grows fast
        good = np.eye(n, dtype=np.float32) * 2.0
        rc = np.asarray(
            rcond_batched(jnp.asarray(np.stack([bad, good])))
        )
        truth_bad = cond1(bad)
        assert rc[0] < 10.0 / truth_bad
        np.testing.assert_allclose(rc[1], 1.0, rtol=1e-5)

    def test_singular_is_zero_rcond(self):
        A = np.zeros((1, 8, 8), np.float32)
        A[0, :4, :4] = np.eye(4)
        rc = np.asarray(rcond_batched(jnp.asarray(A)))
        assert rc[0] == 0.0
        est = np.asarray(cond1_est_batched(jnp.asarray(A)))
        assert np.isinf(est[0])

    def test_mixed_solve_gate(self):
        """The documented use: κ ≲ 1/u_bf16 predicts mixed-precision
        refinement convergence.  Both regimes classified correctly."""
        rng = np.random.RandomState(10)
        n = 32
        ok_mat = rng.randn(n, n).astype(np.float32) + 10 * np.eye(
            n, dtype=np.float32
        )
        # κ ~ 1e6 via scaled SVD
        Uq, _ = np.linalg.qr(rng.randn(n, n))
        Vq, _ = np.linalg.qr(rng.randn(n, n))
        s = np.logspace(0, -6, n)
        bad_mat = (Uq * s) @ Vq
        est = np.asarray(
            cond1_est_batched(
                jnp.asarray(
                    np.stack([ok_mat, bad_mat]).astype(np.float32)
                )
            )
        )
        assert est[0] < 256.0
        assert est[1] > 1e4
