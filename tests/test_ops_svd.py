"""QDWH-based batched SVD vs the numpy f64 oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.svd import (
    cond2_batched,
    pinv_batched,
    rank_svd_batched,
    svd_batched,
)


def gaussian(B, m, n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(B, m, n).astype(np.float32)


def check_svd(A, res, stol=1e-4, rtol=2e-5):
    B, m, n = A.shape
    k = min(m, n)
    U, s, V = np.asarray(res.U), np.asarray(res.s), np.asarray(res.V)
    assert bool(np.asarray(res.ok).all())
    assert s.shape == (B, k) and (np.diff(s, axis=1) <= 1e-5).all()
    for i in range(B):
        want = np.linalg.svd(A[i].astype(np.float64), compute_uv=False)
        np.testing.assert_allclose(
            s[i], want, atol=stol * want[0], rtol=0
        )
        # reconstruction + orthonormality
        rec = (U[i] * s[i]) @ V[i].T
        assert np.abs(rec - A[i]).max() < rtol * max(1.0, want[0]) * 10
        np.testing.assert_allclose(
            U[i].T @ U[i], np.eye(k), atol=1e-4
        )
        np.testing.assert_allclose(
            V[i].T @ V[i], np.eye(k), atol=1e-4
        )


class TestSVD:
    def test_square(self):
        A = gaussian(4, 24, 24, seed=1)
        check_svd(A, svd_batched(jnp.asarray(A)))

    def test_tall(self):
        A = gaussian(3, 40, 12, seed=2)
        check_svd(A, svd_batched(jnp.asarray(A)))

    def test_wide(self):
        A = gaussian(3, 10, 30, seed=3)
        check_svd(A, svd_batched(jnp.asarray(A)))

    def test_ill_conditioned_within_f32(self):
        """κ = 1e4: singular values still track the f64 oracle to
        ~1e-3 relative of σmax (the f32 floor regime)."""
        rng = np.random.RandomState(4)
        n = 16
        Uq, _ = np.linalg.qr(rng.randn(n, n))
        Vq, _ = np.linalg.qr(rng.randn(n, n))
        s = np.logspace(0, -4, n)
        A = ((Uq * s) @ Vq.T)[None].astype(np.float32)
        res = svd_batched(jnp.asarray(A))
        got = np.asarray(res.s)[0]
        np.testing.assert_allclose(got, s, atol=2e-5, rtol=0)

    def test_identity_and_diagonal(self):
        d = np.array([3.0, 2.0, 0.5, 0.1], np.float32)
        A = np.stack([np.eye(4, dtype=np.float32), np.diag(d)])
        res = svd_batched(jnp.asarray(A))
        s = np.asarray(res.s)
        np.testing.assert_allclose(s[0], np.ones(4), atol=1e-5)
        np.testing.assert_allclose(s[1], np.sort(d)[::-1], atol=1e-5)


class TestDerived:
    def test_pinv_penrose_properties(self):
        A = gaussian(3, 20, 8, seed=5)
        P = np.asarray(pinv_batched(jnp.asarray(A)))
        for i in range(3):
            a, p = A[i].astype(np.float64), P[i].astype(np.float64)
            np.testing.assert_allclose(a @ p @ a, a, atol=1e-3)
            np.testing.assert_allclose(p @ a @ p, p, atol=1e-3)
            np.testing.assert_allclose(
                (a @ p).T, a @ p, atol=1e-3
            )
            np.testing.assert_allclose(
                (p @ a).T, p @ a, atol=1e-3
            )

    def test_pinv_rank_deficient_matches_numpy(self):
        rng = np.random.RandomState(6)
        A = (rng.randn(2, 12, 4) @ rng.randn(2, 4, 12)).astype(
            np.float32
        )  # rank 4 of 12
        P = np.asarray(pinv_batched(jnp.asarray(A), rcond=1e-4))
        for i in range(2):
            want = np.linalg.pinv(A[i].astype(np.float64), rcond=1e-4)
            np.testing.assert_allclose(P[i], want, atol=1e-3)

    def test_cond2(self):
        rng = np.random.RandomState(7)
        A = rng.randn(3, 16, 16).astype(np.float32) + 5 * np.eye(
            16, dtype=np.float32
        )
        got = np.asarray(cond2_batched(jnp.asarray(A)))
        for i in range(3):
            want = np.linalg.cond(A[i].astype(np.float64), 2)
            np.testing.assert_allclose(got[i], want, rtol=1e-3)

    def test_rank(self):
        rng = np.random.RandomState(8)
        full = rng.randn(10, 10).astype(np.float32)
        lowr = (rng.randn(10, 3) @ rng.randn(3, 10)).astype(np.float32)
        r = np.asarray(
            rank_svd_batched(jnp.asarray(np.stack([full, lowr])))
        )
        assert r[0] == 10 and r[1] == 3


class TestPolar:
    def test_polar_properties(self):
        from linalg_solver_tpu.ops.svd import polar_batched

        A = gaussian(3, 16, 16, seed=9)
        res = polar_batched(jnp.asarray(A))
        assert bool(np.asarray(res.ok).all())
        up, H = np.asarray(res.up), np.asarray(res.H)
        for i in range(3):
            np.testing.assert_allclose(up[i] @ H[i], A[i], atol=1e-4)
            np.testing.assert_allclose(
                up[i].T @ up[i], np.eye(16), atol=1e-4
            )
            w = np.linalg.eigvalsh(H[i].astype(np.float64))
            assert w.min() > -1e-4

    def test_nearest_orthogonal(self):
        """up is the orthogonal matrix nearest A in Frobenius norm —
        cross-check against the SVD construction U@Vt."""
        from linalg_solver_tpu.ops.svd import polar_batched

        A = gaussian(2, 10, 10, seed=10)
        up = np.asarray(polar_batched(jnp.asarray(A)).up)
        for i in range(2):
            U, _, Vt = np.linalg.svd(A[i].astype(np.float64))
            np.testing.assert_allclose(up[i], U @ Vt, atol=1e-4)
