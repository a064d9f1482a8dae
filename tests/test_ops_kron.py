"""Kronecker-structured ops vs materialized np.kron oracles."""

import numpy as np

import jax
import jax.numpy as jnp

import pytest

from linalg_solver_tpu.ops.kron import (
    kron_batched,
    kron_lstsq_batched,
    kron_matvec_batched,
    kron_solve_batched,
    kronsum_solve_batched,
)


def _rand(rng, *shape, diag=0.0):
    out = rng.randn(*shape)
    if diag:
        out = out + diag * np.eye(shape[-2], shape[-1])
    return out.astype(np.float32)


class TestKron:
    def test_materialize_matches_numpy(self):
        rng = np.random.RandomState(0)
        A = _rand(rng, 2, 3, 4)
        Bm = _rand(rng, 2, 5, 2)
        got = np.asarray(kron_batched(jnp.asarray(A), jnp.asarray(Bm)))
        for i in range(2):
            np.testing.assert_allclose(
                got[i], np.kron(A[i], Bm[i]), rtol=1e-6
            )

    def test_matvec_matches_kron(self):
        rng = np.random.RandomState(1)
        A = _rand(rng, 2, 3, 4)
        Bm = _rand(rng, 2, 5, 2)
        x = _rand(rng, 2, 8)   # p·q = 4·2
        got = np.asarray(
            kron_matvec_batched(
                jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(x)
            )
        )
        for i in range(2):
            want = np.kron(A[i], Bm[i]) @ x[i]
            np.testing.assert_allclose(got[i], want, rtol=1e-5,
                                       atol=1e-5)

    def test_solve_matches_dense(self):
        rng = np.random.RandomState(2)
        m, n = 6, 5
        A = _rand(rng, 2, m, m, diag=m)
        Bm = _rand(rng, 2, n, n, diag=n)
        c = _rand(rng, 2, m * n)
        x = np.asarray(
            kron_solve_batched(
                jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(c)
            ),
            np.float64,
        )
        for i in range(2):
            K = np.kron(
                A[i].astype(np.float64), Bm[i].astype(np.float64)
            )
            want = np.linalg.solve(K, c[i].astype(np.float64))
            err = np.abs(x[i] - want).max() / np.abs(want).max()
            assert err < 1e-4

    def test_solve_matrix_rhs(self):
        rng = np.random.RandomState(3)
        m, n, k = 4, 3, 2
        A = _rand(rng, 1, m, m, diag=m)
        Bm = _rand(rng, 1, n, n, diag=n)
        c = _rand(rng, 1, m * n, k)
        x = np.asarray(
            kron_solve_batched(
                jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(c)
            ),
            np.float64,
        )
        K = np.kron(A[0].astype(np.float64), Bm[0].astype(np.float64))
        want = np.linalg.solve(K, c[0].astype(np.float64))
        assert np.abs(x[0] - want).max() / np.abs(want).max() < 1e-4

    def test_solve_differentiable(self):
        """Gradient flows through both factor solves (custom VJPs)."""
        rng = np.random.RandomState(4)
        m, n = 4, 3
        A = _rand(rng, 1, m, m, diag=m)
        Bm = _rand(rng, 1, n, n, diag=n)
        c = _rand(rng, 1, m * n)

        def f(a_, b_):
            return jnp.sum(
                kron_solve_batched(a_, b_, jnp.asarray(c)) ** 2
            )

        ga, gb = jax.grad(f, argnums=(0, 1))(
            jnp.asarray(A), jnp.asarray(Bm)
        )
        assert np.isfinite(np.asarray(ga)).all()
        assert np.isfinite(np.asarray(gb)).all()
        # FD check on one entry of A, in f64
        eps = 1e-4

        def f64(A_):
            K = np.kron(A_, Bm[0].astype(np.float64))
            x = np.linalg.solve(K, c[0].astype(np.float64))
            return float((x * x).sum())

        A64 = A[0].astype(np.float64)
        Ap = A64.copy(); Ap[1, 2] += eps
        Am = A64.copy(); Am[1, 2] -= eps
        fd = (f64(Ap) - f64(Am)) / (2 * eps)
        assert abs(float(ga[0, 1, 2]) - fd) < 2e-2 * max(1, abs(fd))

    def test_lstsq_matches_dense(self):
        rng = np.random.RandomState(5)
        A = _rand(rng, 2, 7, 4, diag=2)
        Bm = _rand(rng, 2, 6, 3, diag=2)
        c = _rand(rng, 2, 42)
        x, ok = kron_lstsq_batched(
            jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(c)
        )
        assert bool(np.asarray(ok).all())
        x = np.asarray(x, np.float64)
        for i in range(2):
            K = np.kron(
                A[i].astype(np.float64), Bm[i].astype(np.float64)
            )
            want = np.linalg.lstsq(K, c[i].astype(np.float64),
                                   rcond=None)[0]
            assert np.abs(x[i] - want).max() / np.abs(want).max() < 1e-3


@pytest.mark.slow
class TestKronSum:
    def test_matches_dense(self):
        rng = np.random.RandomState(6)
        m, n = 6, 5
        A = _rand(rng, 2, m, m, diag=m)
        Bm = _rand(rng, 2, n, n, diag=n)
        c = _rand(rng, 2, m * n)
        res = kronsum_solve_batched(
            jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(c)
        )
        assert bool(np.asarray(res.ok).all())
        x = np.asarray(res.x, np.float64)
        for i in range(2):
            K = np.kron(
                A[i].astype(np.float64), np.eye(n)
            ) + np.kron(np.eye(m), Bm[i].astype(np.float64))
            want = np.linalg.solve(K, c[i].astype(np.float64))
            assert np.abs(x[i] - want).max() / np.abs(want).max() < 1e-3

    def test_2d_laplacian(self):
        """The separable-PDE shape class: discrete Laplacian on an
        m×n grid is T_m ⊕ T_n; solve a Poisson system without ever
        forming the (mn)² operator."""
        def tridiag(n):
            T = 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
            return T.astype(np.float32)

        m, n = 8, 7
        A = tridiag(m)[None]
        Bm = tridiag(n)[None]
        rng = np.random.RandomState(7)
        c = rng.randn(1, m * n).astype(np.float32)
        res = kronsum_solve_batched(
            jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(c)
        )
        K = np.kron(A[0].astype(np.float64), np.eye(n)) + np.kron(
            np.eye(m), Bm[0].astype(np.float64)
        )
        want = np.linalg.solve(K, c[0].astype(np.float64))
        got = np.asarray(res.x[0], np.float64)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-3

    def test_unsolvable_flagged(self):
        """λ(A) + μ(B) = 0 for some pair: the Sylvester defect flag
        reports the lane."""
        A = np.diag([1.0, 2.0]).astype(np.float32)[None]
        Bm = np.diag([-1.0, 5.0]).astype(np.float32)[None]  # 1 + (−1) = 0
        c = np.ones((1, 4), np.float32)
        res = kronsum_solve_batched(
            jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(c)
        )
        assert not bool(np.asarray(res.ok)[0])
