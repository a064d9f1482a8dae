"""Matrix sign function and spectral counting/projectors."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.sign import (
    eig_count_left_batched,
    sign_batched,
    spectral_projector_batched,
)


def spectrum_matrix(eigs, seed=0):
    """Real matrix with the given (real) spectrum via a random
    similarity."""
    rng = np.random.RandomState(seed)
    n = len(eigs)
    P = np.eye(n) + 0.3 * rng.randn(n, n)
    return (np.linalg.solve(P, np.diag(eigs) @ P)).astype(np.float32)


class TestSign:
    def test_sign_properties(self):
        rng = np.random.RandomState(1)
        B, n = 3, 12
        # shift spectra off the imaginary axis
        A = (rng.randn(B, n, n) + 3 * np.sqrt(n) * np.eye(n)).astype(
            np.float32
        )
        res = sign_batched(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        S = np.asarray(res.S).astype(np.float64)
        for i in range(B):
            # involution + commutation with A
            np.testing.assert_allclose(
                S[i] @ S[i], np.eye(n), atol=1e-3
            )
            np.testing.assert_allclose(
                S[i] @ A[i], A[i] @ S[i], atol=1e-2 * np.abs(A[i]).max()
            )
        # all eigenvalues in the right half plane -> sign = I
        np.testing.assert_allclose(
            S[0], np.eye(n), atol=1e-3
        )

    def test_mixed_spectrum(self):
        eigs = [-3.0, -1.0, 2.0, 4.0, 5.0]
        A = spectrum_matrix(eigs, seed=2)[None]
        res = sign_batched(jnp.asarray(A))
        assert bool(np.asarray(res.converged)[0])
        S = np.asarray(res.S)[0].astype(np.float64)
        w = np.sort(np.linalg.eigvals(S).real)
        np.testing.assert_allclose(
            w, [-1, -1, 1, 1, 1], atol=1e-3
        )


class TestSpectralCounting:
    def test_counts_match_numpy(self):
        rng = np.random.RandomState(3)
        B, n = 4, 10
        A = rng.randn(B, n, n).astype(np.float32) * 2.0
        for sigma in (-1.0, 0.0, 2.0):
            count, conv = eig_count_left_batched(
                jnp.asarray(A), sigma=sigma
            )
            got = np.asarray(count)
            for i in range(B):
                if not bool(np.asarray(conv)[i]):
                    continue  # eigenvalue too close to the line
                want = int(
                    (np.linalg.eigvals(
                        A[i].astype(np.float64)
                    ).real < sigma).sum()
                )
                assert got[i] == want, (i, sigma, got[i], want)

    def test_projector_properties(self):
        eigs = [-4.0, -2.0, 1.0, 3.0, 6.0, 8.0]
        A = spectrum_matrix(eigs, seed=4)[None]
        P, conv = spectral_projector_batched(jnp.asarray(A), sigma=0.0)
        assert bool(np.asarray(conv)[0])
        P0 = np.asarray(P)[0].astype(np.float64)
        # idempotent, commutes, rank = #eigs below 0
        np.testing.assert_allclose(P0 @ P0, P0, atol=1e-3)
        np.testing.assert_allclose(
            P0 @ A[0], A[0] @ P0, atol=1e-2 * np.abs(A[0]).max()
        )
        assert round(float(np.trace(P0))) == 2
        # the projected subspace is A-invariant with the left spectrum
        w = np.linalg.eigvals((P0 @ A[0]).astype(np.float64))
        left = sorted(v.real for v in w if abs(v) > 1e-3)
        np.testing.assert_allclose(left, [-4.0, -2.0], atol=1e-2)
