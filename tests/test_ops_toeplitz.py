"""Toeplitz FFT matvec + preconditioned Krylov solves vs scipy/dense."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.toeplitz import (
    strang_precond,
    toeplitz_dense_batched,
    toeplitz_matvec_batched,
    toeplitz_solve_batched,
)


def decaying_toeplitz(B, n, seed=0, dominance=4.0):
    """Well-conditioned nonsymmetric Toeplitz: decaying off-diagonals
    under a dominant main diagonal."""
    rng = np.random.RandomState(seed)
    decay = np.exp(-0.5 * np.arange(n))
    c = (rng.randn(B, n) * decay).astype(np.float32)
    r = (rng.randn(B, n) * decay).astype(np.float32)
    c[:, 0] += dominance
    r[:, 0] = c[:, 0]
    return c, r


class TestToeplitzMatvec:
    def test_matches_dense(self):
        c, r = decaying_toeplitz(3, 17, seed=1)
        v = np.random.RandomState(2).randn(3, 17).astype(np.float32)
        got = np.asarray(
            toeplitz_matvec_batched(
                jnp.asarray(c), jnp.asarray(r), jnp.asarray(v)
            ),
            np.float64,
        )
        T = np.asarray(
            toeplitz_dense_batched(jnp.asarray(c), jnp.asarray(r)),
            np.float64,
        )
        want = np.einsum("bij,bj->bi", T, v)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_dense_matches_scipy(self):
        from scipy.linalg import toeplitz

        c, r = decaying_toeplitz(1, 9, seed=3)
        T = np.asarray(
            toeplitz_dense_batched(jnp.asarray(c), jnp.asarray(r))
        )[0]
        np.testing.assert_allclose(T, toeplitz(c[0], r[0]), atol=1e-6)


class TestToeplitzSolve:
    def test_matches_scipy_solve_toeplitz(self):
        from scipy.linalg import solve_toeplitz

        c, r = decaying_toeplitz(2, 64, seed=4)
        b = np.random.RandomState(5).randn(2, 64).astype(np.float32)
        res = toeplitz_solve_batched(
            jnp.asarray(c), jnp.asarray(r), jnp.asarray(b), tol=1e-6
        )
        assert bool(np.asarray(res.converged).all())
        x = np.asarray(res.x, np.float64)
        for i in range(2):
            want = solve_toeplitz(
                (c[i].astype(np.float64), r[i].astype(np.float64)),
                b[i].astype(np.float64),
            )
            np.testing.assert_allclose(x[i], want, atol=1e-4)

    def test_spd_cg_path(self):
        """Symmetric PD Toeplitz (decaying positive-definite symbol)."""
        from scipy.linalg import solve_toeplitz

        n = 48
        k = np.arange(n)
        col = (0.5 ** k).astype(np.float32)  # Kac–Murdock–Szegő, SPD
        c = np.broadcast_to(col, (2, n)).copy()
        b = np.random.RandomState(6).randn(2, n).astype(np.float32)
        res = toeplitz_solve_batched(
            jnp.asarray(c), jnp.asarray(c), jnp.asarray(b),
            spd=True, tol=1e-6,
        )
        assert bool(np.asarray(res.converged).all())
        x = np.asarray(res.x, np.float64)
        for i in range(2):
            want = solve_toeplitz(col.astype(np.float64),
                                  b[i].astype(np.float64))
            np.testing.assert_allclose(x[i], want, atol=1e-4)

    def test_preconditioner_is_exact_on_circulant(self):
        """For a CIRCULANT matrix Strang's preconditioner IS the
        inverse: one application solves the system."""
        rng = np.random.RandomState(7)
        n = 32
        s = (rng.randn(n) * np.exp(-np.arange(n))).astype(np.float32)
        s[0] += 4.0
        # circulant: c_k = s_k, r_k = s_{n-k}
        c = np.broadcast_to(s, (1, n)).copy()
        r = np.concatenate([[s[0]], s[:0:-1]]).astype(np.float32)[None]
        M = strang_precond(jnp.asarray(c), jnp.asarray(r))
        b = rng.randn(1, n).astype(np.float32)
        x = np.asarray(M(jnp.asarray(b)), np.float64)
        T = np.asarray(
            toeplitz_dense_batched(jnp.asarray(c), jnp.asarray(r)),
            np.float64,
        )[0]
        np.testing.assert_allclose(T @ x[0], b[0], atol=1e-4)

    def test_large_n_scaling_shape(self):
        """n = 1024 solves stay cheap (no dense materialization)."""
        c, r = decaying_toeplitz(1, 1024, seed=8)
        b = np.random.RandomState(9).randn(1, 1024).astype(np.float32)
        res = toeplitz_solve_batched(
            jnp.asarray(c), jnp.asarray(r), jnp.asarray(b), tol=1e-5
        )
        assert bool(np.asarray(res.converged).all())
        T = np.asarray(
            toeplitz_dense_batched(jnp.asarray(c), jnp.asarray(r)),
            np.float64,
        )[0]
        rres = np.linalg.norm(
            T @ np.asarray(res.x, np.float64)[0] - b[0]
        ) / np.linalg.norm(b[0])
        assert rres < 1e-4
