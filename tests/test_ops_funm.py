"""Matrix functions vs scipy/numpy f64 oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.funm import (
    expm_batched,
    logm_spd_batched,
    powm_spd_batched,
    sqrtm_spd_batched,
)


def spd(B, n, seed=0):
    rng = np.random.RandomState(seed)
    G = rng.randn(B, n, n).astype(np.float32)
    return np.einsum("bik,bjk->bij", G, G) + 0.5 * np.eye(
        n, dtype=np.float32
    )


class TestExpm:
    def test_matches_scipy(self):
        from scipy.linalg import expm

        rng = np.random.RandomState(1)
        A = rng.randn(4, 12, 12).astype(np.float32)
        E = np.asarray(expm_batched(jnp.asarray(A)))
        for i in range(4):
            want = expm(A[i].astype(np.float64))
            scale = np.abs(want).max()
            assert np.abs(E[i] - want).max() / scale < 1e-5

    def test_large_norm_scaling_path(self):
        """‖A‖ ≫ θ₁₃ exercises the per-lane squaring loop; mixed
        magnitudes in one batch exercise per-lane counts."""
        from scipy.linalg import expm

        rng = np.random.RandomState(2)
        A = np.stack([
            0.1 * rng.randn(8, 8),
            30.0 * rng.randn(8, 8) * 0.2,
        ]).astype(np.float32)
        E = np.asarray(expm_batched(jnp.asarray(A)))
        for i in range(2):
            want = expm(A[i].astype(np.float64))
            scale = np.abs(want).max()
            assert np.abs(E[i] - want).max() / scale < 1e-4, (
                i, np.abs(E[i] - want).max(), scale
            )

    def test_identities(self):
        Z = np.zeros((1, 5, 5), np.float32)
        np.testing.assert_allclose(
            np.asarray(expm_batched(jnp.asarray(Z)))[0],
            np.eye(5), atol=1e-6,
        )
        # expm(diag(d)) = diag(exp(d))
        d = np.array([0.5, -1.0, 2.0], np.float32)
        E = np.asarray(expm_batched(jnp.asarray(np.diag(d)[None])))[0]
        np.testing.assert_allclose(
            E, np.diag(np.exp(d)), atol=1e-5, rtol=1e-5
        )

    def test_group_property(self):
        """expm(A)·expm(−A) = I (A and −A commute)."""
        rng = np.random.RandomState(3)
        A = rng.randn(2, 10, 10).astype(np.float32)
        E = np.asarray(expm_batched(jnp.asarray(A)))
        Em = np.asarray(expm_batched(jnp.asarray(-A)))
        for i in range(2):
            np.testing.assert_allclose(
                E[i] @ Em[i], np.eye(10), atol=1e-3
            )


class TestSPDFunctions:
    def test_sqrtm(self):
        A = spd(3, 10, seed=4)
        S = np.asarray(sqrtm_spd_batched(jnp.asarray(A)))
        for i in range(3):
            np.testing.assert_allclose(
                S[i] @ S[i], A[i], atol=1e-3 * np.abs(A[i]).max()
            )
            np.testing.assert_allclose(S[i], S[i].T, atol=1e-5)

    def test_logm_inverts_expm_spd(self):
        A = spd(2, 8, seed=5)
        L = np.asarray(logm_spd_batched(jnp.asarray(A)))
        back = np.asarray(expm_batched(jnp.asarray(L)))
        for i in range(2):
            np.testing.assert_allclose(
                back[i], A[i], atol=1e-3 * np.abs(A[i]).max()
            )

    def test_powm_whitening(self):
        """A^{-1/2} A A^{-1/2} = I — the whitening identity."""
        A = spd(2, 12, seed=6)
        W = np.asarray(powm_spd_batched(jnp.asarray(A), -0.5))
        for i in range(2):
            np.testing.assert_allclose(
                W[i] @ A[i] @ W[i], np.eye(12), atol=2e-3
            )
