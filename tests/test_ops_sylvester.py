"""Sylvester/Lyapunov solver vs scipy and constructed solutions."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.sylvester import (
    lyapunov_batched,
    sylvester_batched,
)


def stable(B, n, seed=0, shift=None):
    """Batch with spectra shifted into the right half plane, so
    spec(A) ∩ spec(−B) = ∅ holds when both factors use it."""
    rng = np.random.RandomState(seed)
    shift = shift if shift is not None else 2.0 * np.sqrt(n)
    return (
        rng.randn(B, n, n) + shift * np.eye(n)
    ).astype(np.float32)


@pytest.mark.slow
class TestSylvester:
    def test_matches_scipy(self):
        from scipy.linalg import solve_sylvester

        B, n, m = 3, 12, 8
        A = stable(B, n, seed=1)
        Bm = stable(B, m, seed=2)
        C = np.random.RandomState(3).randn(B, n, m).astype(np.float32)
        res = sylvester_batched(
            jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(C)
        )
        assert bool(np.asarray(res.ok).all())
        assert np.asarray(res.imag_defect).max() < 1e-3
        X = np.asarray(res.X)
        for i in range(B):
            want = solve_sylvester(
                A[i].astype(np.float64),
                Bm[i].astype(np.float64),
                C[i].astype(np.float64),
            )
            scale = max(1.0, np.abs(want).max())
            assert np.abs(X[i] - want).max() / scale < 1e-4

    def test_residual_small(self):
        B, n, m = 2, 16, 16
        A = stable(B, n, seed=4)
        Bm = stable(B, m, seed=5)
        C = np.random.RandomState(6).randn(B, n, m).astype(np.float32)
        X = np.asarray(
            sylvester_batched(
                jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(C)
            ).X
        ).astype(np.float64)
        R = (
            np.einsum("bij,bjk->bik", A.astype(np.float64), X)
            + np.einsum("bij,bjk->bik", X, Bm.astype(np.float64))
            - C
        )
        assert np.abs(R).max() / np.abs(C).max() < 1e-3

    def test_constructed_solution_recovered(self):
        B, n, m = 2, 10, 6
        A = stable(B, n, seed=7)
        Bm = stable(B, m, seed=8)
        X_true = np.random.RandomState(9).randn(B, n, m).astype(
            np.float32
        )
        C = np.einsum("bij,bjk->bik", A, X_true) + np.einsum(
            "bij,bjk->bik", X_true, Bm
        )
        X = np.asarray(
            sylvester_batched(
                jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(C)
            ).X
        )
        scale = np.abs(X_true).max()
        assert np.abs(X - X_true).max() / scale < 1e-3

    def test_complex_spectrum_b(self):
        """B with genuinely complex eigenvalues exercises the complex
        shift path (conjugate-pair columns of W)."""
        from scipy.linalg import solve_sylvester

        rot = np.array([[1.0, -3.0], [3.0, 1.0]], np.float32)
        Bm = np.zeros((1, 6, 6), np.float32)
        for k in range(3):
            Bm[0, 2 * k:2 * k + 2, 2 * k:2 * k + 2] = rot * (k + 1)
        A = stable(1, 5, seed=10)
        C = np.random.RandomState(11).randn(1, 5, 6).astype(np.float32)
        res = sylvester_batched(
            jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(C)
        )
        want = solve_sylvester(
            A[0].astype(np.float64),
            Bm[0].astype(np.float64),
            C[0].astype(np.float64),
        )
        scale = max(1.0, np.abs(want).max())
        assert np.abs(np.asarray(res.X)[0] - want).max() / scale < 1e-4


class TestLyapunov:
    def test_matches_scipy(self):
        from scipy.linalg import solve_lyapunov

        B, n = 2, 12
        A = stable(B, n, seed=12)
        Qm = np.random.RandomState(13).randn(B, n, n).astype(np.float32)
        Qm = Qm + np.swapaxes(Qm, 1, 2)
        X = np.asarray(
            lyapunov_batched(jnp.asarray(A), jnp.asarray(Qm)).X
        )
        for i in range(B):
            want = solve_lyapunov(
                A[i].astype(np.float64), Qm[i].astype(np.float64)
            )
            scale = max(1.0, np.abs(want).max())
            assert np.abs(X[i] - want).max() / scale < 1e-4

    def test_gramian_is_symmetric_psd(self):
        """Controllability-Gramian use: A stable (spectrum in the LEFT
        half plane), Q = −BBᵀ ⇒ X symmetric PSD."""
        B, n = 2, 10
        A = -stable(B, n, seed=14)
        rng = np.random.RandomState(15)
        Bin = rng.randn(B, n, 3).astype(np.float32)
        Q = -np.einsum("bik,bjk->bij", Bin, Bin)
        X = np.asarray(
            lyapunov_batched(jnp.asarray(A), jnp.asarray(Q)).X
        ).astype(np.float64)
        for i in range(B):
            sym_defect = np.abs(X[i] - X[i].T).max() / max(
                np.abs(X[i]).max(), 1e-30
            )
            assert sym_defect < 1e-3
            w = np.linalg.eigvalsh(0.5 * (X[i] + X[i].T))
            assert w.min() > -1e-4 * max(w.max(), 1.0)


class TestStein:
    def test_matches_scipy_discrete_lyapunov(self):
        from scipy.linalg import solve_discrete_lyapunov
        from linalg_solver_tpu.ops.sylvester import stein_batched

        rng = np.random.RandomState(40)
        B, n = 2, 24
        A = rng.randn(B, n, n).astype(np.float32) * (0.5 / np.sqrt(n))
        G = rng.randn(B, n, n)
        Q = np.einsum("bij,bkj->bik", G, G).astype(np.float32) / n
        res = stein_batched(jnp.asarray(A), jnp.asarray(Q))
        assert bool(np.asarray(res.ok).all())
        assert int(res.iters) <= 10  # doubling: log-depth
        for b in range(B):
            want = solve_discrete_lyapunov(
                A[b].astype(np.float64), Q[b].astype(np.float64)
            )
            err = (np.abs(np.asarray(res.X[b], np.float64) - want).max()
                   / np.abs(want).max())
            assert err < 1e-5, (b, err)

    def test_unstable_lane_flagged(self):
        from linalg_solver_tpu.ops.sylvester import stein_batched

        rng = np.random.RandomState(41)
        n = 16
        A = np.stack([
            rng.randn(n, n) * (0.4 / np.sqrt(n)),      # stable
            rng.randn(n, n) * (3.0 / np.sqrt(n)),      # rho > 1
        ]).astype(np.float32)
        Q = np.broadcast_to(np.eye(n), (2, n, n)).astype(np.float32)
        res = stein_batched(jnp.asarray(A), jnp.asarray(Q.copy()))
        ok = np.asarray(res.ok)
        assert bool(ok[0]) and not bool(ok[1])


class TestCARE:
    def test_matches_scipy(self):
        from scipy.linalg import solve_continuous_are
        from linalg_solver_tpu.ops.riccati import care_batched

        rng = np.random.RandomState(42)
        B, n, m = 2, 12, 4
        A = rng.randn(B, n, n).astype(np.float32) * 0.5
        Bm = rng.randn(B, n, m).astype(np.float32)
        G = rng.randn(B, n, n)
        Q = (np.einsum("bij,bkj->bik", G, G) / n
             + np.eye(n)).astype(np.float32)
        R = np.broadcast_to(np.eye(m), (B, m, m)).astype(
            np.float32
        ).copy()
        res = care_batched(jnp.asarray(A), jnp.asarray(Bm),
                           jnp.asarray(Q), jnp.asarray(R))
        assert bool(np.asarray(res.ok).all())
        for b in range(B):
            want = solve_continuous_are(
                A[b].astype(np.float64), Bm[b].astype(np.float64),
                Q[b].astype(np.float64), R[b].astype(np.float64),
            )
            err = (np.abs(np.asarray(res.X[b], np.float64) - want).max()
                   / np.abs(want).max())
            assert err < 1e-4, (b, err)

    def test_solution_is_stabilizing(self):
        """A − G X must be Hurwitz (all eigenvalues in the left
        half-plane) — the defining property of the CARE solution."""
        from linalg_solver_tpu.ops.riccati import care_batched

        rng = np.random.RandomState(43)
        n, m = 10, 3
        A = (rng.randn(n, n) * 0.5 + 0.3 * np.eye(n))[None].astype(
            np.float32
        )  # slightly unstable open loop
        Bm = rng.randn(1, n, m).astype(np.float32)
        Q = np.eye(n)[None].astype(np.float32)
        R = np.eye(m)[None].astype(np.float32)
        res = care_batched(jnp.asarray(A), jnp.asarray(Bm),
                           jnp.asarray(Q), jnp.asarray(R))
        assert bool(np.asarray(res.ok).all())
        X = np.asarray(res.X, np.float64)[0]
        G = (Bm[0].astype(np.float64)
             @ Bm[0].astype(np.float64).T)  # R = I
        closed = A[0].astype(np.float64) - G @ X
        assert np.linalg.eigvals(closed).real.max() < 0

    def test_imaginary_axis_flagged(self):
        """A Hamiltonian with imaginary-axis eigenvalues (uncontrollable
        undamped mode) has no stabilizing solution: must flag."""
        from linalg_solver_tpu.ops.riccati import care_batched

        n = 4
        # undamped oscillator block, B couples only to other states
        A = np.zeros((n, n), np.float32)
        A[0, 1], A[1, 0] = 1.0, -1.0       # eigenvalues ±i
        A[2, 2] = A[3, 3] = -1.0
        Bm = np.zeros((n, 1), np.float32)
        Bm[2, 0] = 1.0                      # mode 0/1 uncontrollable
        Q = np.zeros((n, n), np.float32)    # ... and unobserved
        R = np.eye(1, dtype=np.float32)
        res = care_batched(jnp.asarray(A[None]), jnp.asarray(Bm[None]),
                           jnp.asarray(Q[None]), jnp.asarray(R[None]))
        assert not bool(np.asarray(res.ok).all())


class TestDARE:
    def test_matches_scipy(self):
        from scipy.linalg import solve_discrete_are
        from linalg_solver_tpu.ops.riccati import dare_batched

        rng = np.random.RandomState(44)
        B, n, m = 3, 12, 4
        A = rng.randn(B, n, n).astype(np.float32) * (0.9 / np.sqrt(n))
        A[1] *= 2.2  # unstable open loop, still stabilizable
        Bm = rng.randn(B, n, m).astype(np.float32)
        G = rng.randn(B, n, n)
        Q = (np.einsum("bij,bkj->bik", G, G) / n
             + np.eye(n)).astype(np.float32)
        R = np.broadcast_to(np.eye(m), (B, m, m)).astype(
            np.float32
        ).copy()
        res = dare_batched(jnp.asarray(A), jnp.asarray(Bm),
                           jnp.asarray(Q), jnp.asarray(R))
        assert bool(np.asarray(res.ok).all())
        assert int(res.iters) <= 12  # doubling: quadratic
        for b in range(B):
            want = solve_discrete_are(
                A[b].astype(np.float64), Bm[b].astype(np.float64),
                Q[b].astype(np.float64), R[b].astype(np.float64),
            )
            err = (np.abs(np.asarray(res.X[b], np.float64) - want).max()
                   / np.abs(want).max())
            assert err < 1e-4, (b, err)

    def test_closed_loop_is_schur_stable(self):
        """A − B(R + BᵀXB)⁻¹BᵀXA must have spectral radius < 1."""
        from linalg_solver_tpu.ops.riccati import dare_batched

        rng = np.random.RandomState(45)
        n, m = 10, 3
        A = (rng.randn(n, n) * 0.5 + 0.5 * np.eye(n))[None].astype(
            np.float32
        )
        Bm = rng.randn(1, n, m).astype(np.float32)
        Q = np.eye(n)[None].astype(np.float32)
        R = np.eye(m)[None].astype(np.float32)
        res = dare_batched(jnp.asarray(A), jnp.asarray(Bm),
                           jnp.asarray(Q), jnp.asarray(R))
        assert bool(np.asarray(res.ok).all())
        X = np.asarray(res.X, np.float64)[0]
        A64, B64 = A[0].astype(np.float64), Bm[0].astype(np.float64)
        K = np.linalg.solve(
            np.eye(m) + B64.T @ X @ B64, B64.T @ X @ A64
        )
        closed = A64 - B64 @ K
        assert np.abs(np.linalg.eigvals(closed)).max() < 1.0
