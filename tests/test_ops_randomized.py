"""Randomized SVD vs the truncated exact SVD."""

import numpy as np

import jax
import jax.numpy as jnp

from linalg_solver_tpu.ops.randomized import randomized_svd_batched


def lowrank_plus_noise(B, m, n, r, noise, seed=0):
    rng = np.random.RandomState(seed)
    L = rng.randn(B, m, r) @ rng.randn(B, r, n)
    return (L + noise * rng.randn(B, m, n)).astype(np.float32)


class TestRandomizedSVD:
    def test_recovers_low_rank(self):
        B, m, n, r = 3, 60, 40, 5
        A = lowrank_plus_noise(B, m, n, r, noise=0.0, seed=1)
        res = randomized_svd_batched(jnp.asarray(A), k=r)
        assert bool(np.asarray(res.ok).all())
        U, s, V = map(np.asarray, (res.U, res.s, res.V))
        for i in range(B):
            rec = (U[i] * s[i]) @ V[i].T
            scale = np.abs(A[i]).max()
            assert np.abs(rec - A[i]).max() < 1e-4 * scale
            want = np.linalg.svd(
                A[i].astype(np.float64), compute_uv=False
            )[:r]
            np.testing.assert_allclose(
                s[i], want, rtol=1e-4
            )
            assert float(np.asarray(res.resid_est)[i]) < 1e-3 * scale
        assert bool(np.asarray(res.valid).all())

    def test_near_optimal_on_decaying_spectrum(self):
        rng = np.random.RandomState(2)
        B, m, n, k = 2, 50, 50, 8
        Uq, _ = np.linalg.qr(rng.randn(m, m))
        Vq, _ = np.linalg.qr(rng.randn(n, n))
        sv = np.power(0.5, np.arange(n))
        A = np.broadcast_to(
            (Uq[:, :n] * sv) @ Vq.T, (B, m, n)
        ).astype(np.float32).copy()
        res = randomized_svd_batched(jnp.asarray(A), k=k)
        s = np.asarray(res.s)
        for i in range(B):
            np.testing.assert_allclose(
                s[i], sv[:k], rtol=1e-3
            )
            # rank-k error near σ_{k+1}
            rec = (
                np.asarray(res.U)[i] * s[i]
            ) @ np.asarray(res.V)[i].T
            err = np.linalg.norm(
                A[i] - rec, 2
            )
            assert err < 3.0 * sv[k], (err, sv[k])

    def test_orthonormal_factors(self):
        A = lowrank_plus_noise(2, 30, 45, 6, noise=0.01, seed=3)
        res = randomized_svd_batched(jnp.asarray(A), k=6)
        U, V = np.asarray(res.U), np.asarray(res.V)
        for i in range(2):
            np.testing.assert_allclose(
                U[i].T @ U[i], np.eye(6), atol=1e-4
            )
            np.testing.assert_allclose(
                V[i].T @ V[i], np.eye(6), atol=1e-4
            )

    def test_resid_est_reports_truncation(self):
        """Truncating below the true rank must surface in resid_est."""
        A = lowrank_plus_noise(1, 40, 40, 10, noise=0.0, seed=4)
        res_full = randomized_svd_batched(jnp.asarray(A), k=10)
        res_trunc = randomized_svd_batched(jnp.asarray(A), k=3)
        assert float(np.asarray(res_full.resid_est)[0]) < 1e-2
        assert (
            float(np.asarray(res_trunc.resid_est)[0])
            > 10.0 * float(np.asarray(res_full.resid_est)[0])
        )

    def test_dynamic_range_and_honest_flagging(self):
        """The Gram-based orthonormalization resolves σ down to
        ~1e-3·σmax at f32 (the squared-condition floor); components
        inside that range must be KEPT and accurate (regression: an
        8·ell·eps threshold zeroed σ = 4e-3·σmax with ok=True), and
        components below it must come back with valid=False and zero
        columns — never silent garbage."""
        rng = np.random.RandomState(7)
        m = n = 50
        k = 16
        Uq, _ = np.linalg.qr(rng.randn(m, m))
        Vq, _ = np.linalg.qr(rng.randn(n, n))
        sv = np.power(0.5, np.arange(n))
        A = ((Uq[:, :n] * sv) @ Vq.T)[None].astype(np.float32)
        res = randomized_svd_batched(jnp.asarray(A), k=k)
        assert bool(np.asarray(res.ok).all())
        valid = np.asarray(res.valid)[0]
        s = np.asarray(res.s)[0]
        # everything down to σ = 2e-3·σmax (index 9) is resolvable
        assert valid[:10].all(), (valid, s)
        np.testing.assert_allclose(s[:10], sv[:10], rtol=5e-3)
        # dropped components are flagged and zero, not wrong
        assert (s[~valid] == 0.0).all()
        U = np.asarray(res.U)[0][:, valid]
        kv = int(valid.sum())
        np.testing.assert_allclose(
            U.T @ U, np.eye(kv), atol=1e-3
        )


class TestInterpolativeCUR:
    def test_id_exact_low_rank(self):
        from linalg_solver_tpu.ops.randomized import (
            interpolative_batched,
        )

        rng = np.random.RandomState(20)
        B, m, n, r = 2, 48, 40, 6
        A = (rng.randn(B, m, r) @ rng.randn(B, r, n)).astype(np.float32)
        res = interpolative_batched(jnp.asarray(A), r)
        assert bool(np.asarray(res.ok).all())
        assert np.asarray(res.resid_fro).max() < 1e-5
        # X really interpolates from ACTUAL columns of A
        X = np.asarray(res.X, np.float64)
        cols = np.asarray(res.cols)
        for b in range(B):
            C = A[b][:, cols[b]].astype(np.float64)
            err = np.abs(C @ X[b] - A[b]).max()
            assert err < 1e-4 * np.abs(A[b]).max()

    def test_cur_exact_low_rank_and_factors_from_a(self):
        from linalg_solver_tpu.ops.randomized import cur_batched

        rng = np.random.RandomState(21)
        B, m, n, r = 2, 40, 48, 5
        A = (rng.randn(B, m, r) @ rng.randn(B, r, n)).astype(np.float32)
        res = cur_batched(jnp.asarray(A), r)
        assert bool(np.asarray(res.ok).all())
        assert np.asarray(res.resid_fro).max() < 1e-5
        cols = np.asarray(res.cols)
        rows = np.asarray(res.rows)
        for b in range(B):
            np.testing.assert_allclose(
                np.asarray(res.C)[b], A[b][:, cols[b]], atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(res.R)[b], A[b][rows[b], :], atol=1e-5
            )

    def test_near_optimal_on_decaying_spectrum(self):
        from linalg_solver_tpu.ops.randomized import (
            cur_batched,
            interpolative_batched,
        )

        rng = np.random.RandomState(22)
        m = n = 40
        Q1, _ = np.linalg.qr(rng.randn(m, m))
        Q2, _ = np.linalg.qr(rng.randn(n, n))
        s = 2.0 ** (-np.arange(n).astype(float))
        A = ((Q1[:, :n] * s[None, :]) @ Q2)[None].astype(np.float32)
        k = 8
        opt = np.sqrt((s[k:] ** 2).sum()) / np.sqrt((s**2).sum())
        rid = interpolative_batched(jnp.asarray(A), k)
        rcur = cur_batched(jnp.asarray(A), k)
        assert float(rid.resid_fro[0]) < 4.0 * opt
        assert float(rcur.resid_fro[0]) < 8.0 * opt
