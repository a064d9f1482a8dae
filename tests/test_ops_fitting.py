"""Fitting utilities (ridge / TLS / Procrustes / subspace angles)."""

import numpy as np

import jax.numpy as jnp

from linalg_solver_tpu.ops.fitting import (
    procrustes_batched,
    ridge_batched,
    subspace_angles_batched,
    tls_batched,
)


class TestRidge:
    def test_matches_f64_normal_equations(self):
        rng = np.random.RandomState(0)
        B, m, n = 2, 30, 8
        A = rng.randn(B, m, n).astype(np.float32)
        b = rng.randn(B, m).astype(np.float32)
        lam = 0.5
        r = ridge_batched(jnp.asarray(A), jnp.asarray(b), lam)
        assert bool(np.asarray(r.ok).all())
        for i in range(B):
            A64 = A[i].astype(np.float64)
            want = np.linalg.solve(
                A64.T @ A64 + lam * np.eye(n), A64.T @ b[i]
            )
            np.testing.assert_allclose(
                np.asarray(r.x[i], np.float64), want, atol=1e-5
            )

    def test_per_lane_lambda_and_limit(self):
        """λ → 0 on a well-conditioned system recovers plain lstsq."""
        rng = np.random.RandomState(1)
        A = rng.randn(2, 20, 5).astype(np.float32)
        b = rng.randn(2, 20).astype(np.float32)
        lam = jnp.asarray([1e-6, 10.0])
        r = ridge_batched(jnp.asarray(A), jnp.asarray(b), lam)
        want0, *_ = np.linalg.lstsq(
            A[0].astype(np.float64), b[0].astype(np.float64),
            rcond=None,
        )
        np.testing.assert_allclose(np.asarray(r.x[0], np.float64),
                                   want0, atol=1e-4)
        # heavy regularization shrinks the solution
        assert (np.linalg.norm(np.asarray(r.x[1]))
                < np.linalg.norm(np.asarray(r.x[0])))


class TestTLS:
    def test_matches_f64_svd_tls(self):
        rng = np.random.RandomState(2)
        B, m, n = 2, 30, 8
        A = rng.randn(B, m, n).astype(np.float32)
        x_true = rng.randn(B, n)
        b = (np.einsum("bmn,bn->bm", A, x_true)
             + 0.01 * rng.randn(B, m)).astype(np.float32)
        t = tls_batched(jnp.asarray(A), jnp.asarray(b))
        assert bool(np.asarray(t.ok).all())
        for i in range(B):
            C = np.concatenate([A[i], b[i][:, None]], axis=1).astype(
                np.float64
            )
            _, _, Vt = np.linalg.svd(C)
            v = Vt[-1]
            want = -v[:n] / v[n]
            np.testing.assert_allclose(
                np.asarray(t.x[i], np.float64), want, atol=2e-4
            )

    def test_degenerate_flagged(self):
        """b orthogonal to range(A) with σ-tie: the nongeneric TLS
        case must not report ok."""
        A = np.zeros((1, 6, 2), np.float32)
        A[0, 0, 0] = A[0, 1, 1] = 1.0
        b = np.zeros((1, 6), np.float32)
        b[0, 2] = 1.0
        t = tls_batched(jnp.asarray(A), jnp.asarray(b))
        assert not bool(np.asarray(t.ok).all())


class TestProcrustes:
    def test_recovers_rotation(self):
        rng = np.random.RandomState(3)
        B, n = 2, 8
        Qtrue, _ = np.linalg.qr(rng.randn(B, n, n))
        A = rng.randn(B, n, n).astype(np.float32)
        Bm = np.einsum("bij,bjk->bik", Qtrue, A).astype(np.float32)
        p = procrustes_batched(jnp.asarray(A), jnp.asarray(Bm))
        assert bool(np.asarray(p.ok).all())
        np.testing.assert_allclose(np.asarray(p.Q), Qtrue, atol=1e-4)

    def test_with_scale(self):
        rng = np.random.RandomState(4)
        n = 6
        Qtrue, _ = np.linalg.qr(rng.randn(n, n))
        A = rng.randn(n, n).astype(np.float32)
        Bm = (2.5 * Qtrue @ A).astype(np.float32)[None]
        p = procrustes_batched(jnp.asarray(A[None]), jnp.asarray(Bm),
                               with_scale=True)
        np.testing.assert_allclose(float(p.scale[0]), 2.5, atol=1e-3)

    def test_minimizes_over_random_orthogonals(self):
        rng = np.random.RandomState(5)
        n = 6
        A = rng.randn(1, n, n).astype(np.float32)
        Bm = rng.randn(1, n, n).astype(np.float32)
        p = procrustes_batched(jnp.asarray(A), jnp.asarray(Bm))
        Q = np.asarray(p.Q, np.float64)[0]
        best = np.linalg.norm(Q @ A[0] - Bm[0])
        for _ in range(20):
            Qr, _ = np.linalg.qr(rng.randn(n, n))
            assert best <= np.linalg.norm(Qr @ A[0] - Bm[0]) + 1e-3


class TestSubspaceAngles:
    def test_matches_scipy_generic(self):
        from scipy.linalg import subspace_angles

        rng = np.random.RandomState(6)
        U = rng.randn(2, 20, 4).astype(np.float32)
        V = rng.randn(2, 20, 6).astype(np.float32)
        res = subspace_angles_batched(jnp.asarray(U), jnp.asarray(V))
        assert bool(np.asarray(res.ok).all())
        for i in range(2):
            want = np.sort(subspace_angles(
                U[i].astype(np.float64), V[i].astype(np.float64)
            ))
            np.testing.assert_allclose(
                np.sort(np.asarray(res.angles[i], np.float64)), want,
                atol=1e-4,
            )

    def test_small_angles_full_resolution(self):
        """Angles ~1e-3: the cosine path would report ~1e-3-accurate
        garbage (acos cancellation); the sin-theta path keeps f32
        resolution."""
        from scipy.linalg import subspace_angles

        rng = np.random.RandomState(7)
        U = rng.randn(1, 20, 4).astype(np.float32)
        V = (U + 0.001 * rng.randn(1, 20, 4)).astype(np.float32)
        res = subspace_angles_batched(jnp.asarray(U), jnp.asarray(V))
        want = np.sort(subspace_angles(
            U[0].astype(np.float64), V[0].astype(np.float64)
        ))
        got = np.sort(np.asarray(res.angles[0], np.float64))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-6)

    def test_identical_and_orthogonal(self):
        rng = np.random.RandomState(8)
        U = rng.randn(1, 16, 3).astype(np.float32)
        res = subspace_angles_batched(jnp.asarray(U), jnp.asarray(U))
        assert np.abs(np.asarray(res.angles)).max() < 1e-3
        V = np.zeros((1, 16, 3), np.float32)
        V[0, 10:13] = np.eye(3)
        U2 = np.zeros((1, 16, 3), np.float32)
        U2[0, :3] = np.eye(3)
        res2 = subspace_angles_batched(jnp.asarray(U2), jnp.asarray(V))
        np.testing.assert_allclose(np.asarray(res2.angles),
                                   np.pi / 2, atol=1e-4)
