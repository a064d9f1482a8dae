"""Krylov solvers vs numpy direct-solve oracles."""

import numpy as np

import jax.numpy as jnp

from linalg_solver_tpu.ops.krylov import (
    bicgstab_batched,
    cg_batched,
    gmres_batched,
)


def spd(B, n, seed=0, cond=10.0):
    rng = np.random.RandomState(seed)
    Q, _ = np.linalg.qr(rng.randn(B, n, n))
    w = np.exp(
        np.linspace(0.0, np.log(cond), n)
    )[None, :] * (1.0 + 0.01 * rng.rand(B, n))
    return np.einsum("bik,bk,bjk->bij", Q, w, Q)


def general(B, n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(B, n, n) + 3.0 * np.sqrt(n) * np.eye(n)


def rel_res(A, x, b):
    r = np.einsum("bij,bj->bi", A, np.asarray(x, np.float64)) - b
    return np.linalg.norm(r, axis=1) / np.linalg.norm(b, axis=1)


class TestCG:
    def test_spd_converges(self):
        A = spd(4, 48, seed=1)
        b = np.random.RandomState(2).randn(4, 48)
        res = cg_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        assert bool(np.asarray(res.converged).all())
        assert rel_res(A, res.x, b).max() < 1e-4

    def test_matches_direct_solve(self):
        A = spd(3, 32, seed=3)
        b = np.random.RandomState(4).randn(3, 32)
        res = cg_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        want = np.linalg.solve(A, b[..., None])[..., 0]
        scale = np.abs(want).max()
        assert np.abs(np.asarray(res.x) - want).max() / scale < 1e-4

    def test_jacobi_badly_scaled(self):
        """Rows scaled over 6 orders of magnitude: Jacobi fixes it."""
        A = spd(2, 40, seed=5)
        s = np.logspace(0, 6, 40)
        A = s[None, :, None] * A * s[None, None, :]  # stays SPD
        b = np.random.RandomState(6).randn(2, 40) * s[None, :]
        res = cg_batched(
            jnp.asarray(A, jnp.float32),
            jnp.asarray(b, jnp.float32),
            jacobi=True,
            tol=1e-5,
        )
        assert bool(np.asarray(res.converged).all())
        assert rel_res(A, res.x, b).max() < 1e-4

    def test_early_termination_iters(self):
        """Identity system converges in one step, not 2n."""
        n = 64
        A = np.broadcast_to(np.eye(n, dtype=np.float32), (2, n, n))
        b = np.random.RandomState(7).randn(2, n).astype(np.float32)
        res = cg_batched(jnp.asarray(A), jnp.asarray(b))
        assert int(res.iters) <= 2
        assert bool(np.asarray(res.converged).all())


class TestBiCGSTAB:
    def test_general_converges(self):
        A = general(4, 48, seed=8)
        b = np.random.RandomState(9).randn(4, 48)
        res = bicgstab_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            tol=1e-5,
        )
        assert bool(np.asarray(res.converged).all())
        assert rel_res(A, res.x, b).max() < 1e-4

    def test_nonsymmetric_indefinite(self):
        rng = np.random.RandomState(10)
        n = 32
        A = rng.randn(2, n, n)
        A = A + 4.0 * np.sqrt(n) * np.eye(n)  # push spectrum right
        A[:, : n // 2] *= -1.0  # indefinite symmetric part rows
        b = rng.randn(2, n)
        res = bicgstab_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            tol=1e-5,
        )
        # BiCGSTAB may legitimately fail on hard systems — but then it
        # must SAY so; accept either honest outcome.
        conv = np.asarray(res.converged)
        rr = rel_res(A, res.x, b)
        assert (rr[conv] < 1e-3).all()


class TestGMRES:
    def test_general_converges(self):
        A = general(4, 48, seed=11)
        b = np.random.RandomState(12).randn(4, 48)
        res = gmres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            tol=1e-5, restart=24,
        )
        assert bool(np.asarray(res.converged).all())
        assert rel_res(A, res.x, b).max() < 1e-4

    def test_full_krylov_space_exact(self):
        """restart = n makes GMRES a direct method (one cycle)."""
        A = general(2, 24, seed=13)
        b = np.random.RandomState(14).randn(2, 24)
        res = gmres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            tol=1e-5, restart=24, max_restarts=2,
        )
        assert bool(np.asarray(res.converged).all())
        want = np.linalg.solve(A, b[..., None])[..., 0]
        scale = np.abs(want).max()
        assert np.abs(np.asarray(res.x) - want).max() / scale < 1e-3

    def test_restarted_beats_single_cycle(self):
        """A restart-8 run on a 48-dim system still converges by
        iterating cycles (shifted spectrum — GMRES-friendly)."""
        A = general(2, 48, seed=15)
        b = np.random.RandomState(16).randn(2, 48)
        res = gmres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            tol=1e-5, restart=8, max_restarts=24,
        )
        assert bool(np.asarray(res.converged).all())
        assert rel_res(A, res.x, b).max() < 1e-4

    def test_zero_rhs(self):
        A = general(1, 16, seed=17)
        b = np.zeros((1, 16))
        res = gmres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        assert bool(np.asarray(res.converged).all())
        assert np.abs(np.asarray(res.x)).max() == 0.0


class TestScaleInvariance:
    """Regressions: f32 squares of ~1e-20 entries flush to zero, so an
    unscaled ‖b‖² made every solver return x = 0 with converged=True
    for tiny nonzero right sides (and NaN for huge ones).  The solvers
    are exactly scale-equivariant in b — _prep now normalizes."""

    def test_tiny_rhs_actually_solved(self):
        A = spd(2, 24, seed=20)
        b = np.random.RandomState(21).randn(2, 24) * 1e-20
        res = cg_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            tol=1e-5,
        )
        assert bool(np.asarray(res.converged).all())
        x = np.asarray(res.x, np.float64)
        assert np.abs(x).max() > 0.0  # NOT the zero vector
        assert rel_res(A, x, b).max() < 1e-4

    def test_huge_rhs_no_overflow(self):
        A = spd(2, 24, seed=22)
        b = np.random.RandomState(23).randn(2, 24) * 1e18
        res = gmres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            tol=1e-5, restart=24,
        )
        x = np.asarray(res.x, np.float64)
        assert np.isfinite(x).all()
        assert bool(np.asarray(res.converged).all())
        assert rel_res(A, x, b).max() < 1e-4

    def test_bicgstab_tiny_rhs_no_spurious_breakdown(self):
        A = general(2, 24, seed=24)
        b = np.random.RandomState(25).randn(2, 24) * 1e-19
        res = bicgstab_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            tol=1e-5,
        )
        assert bool(np.asarray(res.converged).all())
        assert rel_res(A, np.asarray(res.x, np.float64), b).max() < 1e-4


class TestHonestyContract:
    def test_singular_system_flagged(self):
        """A singular system cannot reach tol — converged must be
        False (CG) rather than returning garbage silently."""
        n = 16
        rng = np.random.RandomState(18)
        U = np.linalg.qr(rng.randn(n, n))[0]
        w = np.ones(n); w[-4:] = 0.0
        A = (U * w) @ U.T
        b = rng.randn(1, n)  # generic rhs has a component off range(A)
        res = cg_batched(
            jnp.asarray(A[None], jnp.float32),
            jnp.asarray(b, jnp.float32),
            tol=1e-6, max_iters=64,
        )
        assert not bool(np.asarray(res.converged).any())


class TestMINRES:
    def _indef(self, B, n, seed=0):
        """Symmetric INDEFINITE, well-conditioned: Q diag(±) Qᵀ."""
        rng = np.random.RandomState(seed)
        Q, _ = np.linalg.qr(rng.randn(B, n, n))
        w = np.linspace(1.0, 10.0, n)[None, :] * (
            1.0 + 0.01 * rng.rand(B, n)
        )
        w[:, ::2] *= -1.0  # half the spectrum negative
        return np.einsum("bik,bk,bjk->bij", Q, w, Q)

    def test_indefinite_converges(self):
        from linalg_solver_tpu.ops.krylov import minres_batched

        A = self._indef(4, 48, seed=11)
        b = np.random.RandomState(12).randn(4, 48)
        res = minres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        assert bool(np.asarray(res.converged).all())
        assert rel_res(A, res.x, b).max() < 1e-4

    def test_matches_direct_solve(self):
        from linalg_solver_tpu.ops.krylov import minres_batched

        A = self._indef(3, 32, seed=13)
        b = np.random.RandomState(14).randn(3, 32)
        res = minres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        want = np.linalg.solve(A, b[..., None])[..., 0]
        scale = np.abs(want).max()
        assert np.abs(np.asarray(res.x) - want).max() / scale < 1e-4

    def test_spd_agrees_with_cg(self):
        from linalg_solver_tpu.ops.krylov import minres_batched

        A = spd(3, 40, seed=15)
        b = np.random.RandomState(16).randn(3, 40)
        r1 = minres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        r2 = cg_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        assert bool(np.asarray(r1.converged).all())
        d = np.abs(np.asarray(r1.x) - np.asarray(r2.x)).max()
        assert d / np.abs(np.asarray(r2.x)).max() < 1e-3

    def test_jacobi_badly_scaled_symmetric(self):
        from linalg_solver_tpu.ops.krylov import minres_batched

        A = self._indef(2, 40, seed=17)
        s = np.logspace(0, 4, 40)
        A = s[None, :, None] * A * s[None, None, :]  # stays symmetric
        b = np.random.RandomState(18).randn(2, 40) * s[None, :]
        res = minres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            jacobi=True,
        )
        assert bool(np.asarray(res.converged).all())
        assert rel_res(A, res.x, b).max() < 1e-3

    def test_singular_consistent(self):
        """Rank-deficient but consistent (b ∈ range A): MINRES still
        drives the residual to the floor (CG would divide by zero)."""
        from linalg_solver_tpu.ops.krylov import minres_batched

        rng = np.random.RandomState(19)
        n, r = 32, 20
        Q, _ = np.linalg.qr(rng.randn(1, n, n))
        w = np.concatenate([np.linspace(1, 5, r), np.zeros(n - r)])
        A = np.einsum("bik,k,bjk->bij", Q, w, Q)
        y = rng.randn(1, n)
        b = np.einsum("bij,bj->bi", A, y)  # consistent
        res = minres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        assert rel_res(A, res.x, b).max() < 1e-3


class TestLSQR:
    def test_overdetermined_matches_lstsq(self):
        from linalg_solver_tpu.ops.krylov import lsqr_batched

        rng = np.random.RandomState(21)
        B, m, n = 3, 64, 24
        A = rng.randn(B, m, n) + 2.0 * np.eye(m, n)
        b = rng.randn(B, m)
        res = lsqr_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        assert bool(np.asarray(res.converged).all())
        for i in range(B):
            want = np.linalg.lstsq(A[i], b[i], rcond=None)[0]
            err = np.abs(np.asarray(res.x[i], np.float64) - want).max()
            assert err / max(np.abs(want).max(), 1e-30) < 1e-3

    def test_square_matches_solve(self):
        from linalg_solver_tpu.ops.krylov import lsqr_batched

        A = general(3, 32, seed=22)
        b = np.random.RandomState(23).randn(3, 32)
        res = lsqr_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        want = np.linalg.solve(A, b[..., None])[..., 0]
        assert np.abs(
            np.asarray(res.x) - want
        ).max() / np.abs(want).max() < 1e-3

    def test_underdetermined_min_norm(self):
        """m < n, damp=0: LSQR converges to the MINIMUM-NORM solution
        (x ∈ range(Aᵀ) throughout)."""
        from linalg_solver_tpu.ops.krylov import lsqr_batched

        rng = np.random.RandomState(24)
        B, m, n = 2, 16, 40
        A = rng.randn(B, m, n)
        b = rng.randn(B, m)
        res = lsqr_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        for i in range(B):
            want = np.linalg.pinv(A[i]) @ b[i]
            err = np.abs(np.asarray(res.x[i], np.float64) - want).max()
            assert err / np.abs(want).max() < 1e-3

    def test_damped_matches_ridge(self):
        """damp > 0 minimizes ‖Ax−b‖² + damp²‖x‖² — cross-check the
        augmented normal equations in f64."""
        from linalg_solver_tpu.ops.krylov import lsqr_batched

        rng = np.random.RandomState(25)
        B, m, n = 2, 48, 20
        A = rng.randn(B, m, n)
        b = rng.randn(B, m)
        damp = 0.7
        res = lsqr_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            damp=damp,
        )
        for i in range(B):
            want = np.linalg.solve(
                A[i].T @ A[i] + damp**2 * np.eye(n), A[i].T @ b[i]
            )
            err = np.abs(np.asarray(res.x[i], np.float64) - want).max()
            assert err / np.abs(want).max() < 1e-3

    def test_inconsistent_reports_ls_optimality(self):
        """b ∉ range(A): resnorm stays O(1) but atresnorm (the true LS
        optimality measure) reaches the tolerance."""
        from linalg_solver_tpu.ops.krylov import lsqr_batched

        rng = np.random.RandomState(26)
        B, m, n = 2, 64, 8
        A = rng.randn(B, m, n)
        b = rng.randn(B, m)  # massively overdetermined: big residual
        res = lsqr_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32)
        )
        assert bool(np.asarray(res.converged).all())
        assert np.asarray(res.atresnorm).max() < 1e-3
        assert np.asarray(res.resnorm).min() > 0.1  # genuinely inconsistent

    def test_matvec_entry_point(self):
        """Matrix-free LSQR through explicit closures == dense path."""
        from linalg_solver_tpu.ops.krylov import (
            lsqr_batched, lsqr_matvec,
        )

        rng = np.random.RandomState(27)
        B, m, n = 2, 32, 12
        A = rng.randn(B, m, n).astype(np.float32)
        b = rng.randn(B, m).astype(np.float32)
        Aj = jnp.asarray(A)
        mv = lambda v: jnp.einsum("bij,bj->bi", Aj, v)
        rmv = lambda u: jnp.einsum("bij,bi->bj", Aj, u)
        r1 = lsqr_matvec(mv, rmv, jnp.asarray(b), n)
        r2 = lsqr_batched(Aj, jnp.asarray(b))
        assert np.abs(
            np.asarray(r1.x) - np.asarray(r2.x)
        ).max() < 1e-4


class TestMinresJacobiHonesty:
    def test_jacobi_reports_true_unscaled_residual(self):
        """minres(jacobi=True) must report ||b - Ax||/||b|| of the
        ORIGINAL system, not the symmetrically scaled one (ADVICE r1:
        matching the cg/bicgstab honesty contract)."""
        from linalg_solver_tpu.ops.krylov import minres_batched

        rng = np.random.RandomState(33)
        n = 24
        A = rng.randn(1, n, n)
        A = A + A.transpose(0, 2, 1) + 2 * n * np.eye(n)
        # badly scaled rows/cols so D-scaling matters
        s = np.logspace(-3, 3, n)
        A = A * s[None, :, None] * s[None, None, :]
        b = rng.randn(1, n)
        res = minres_batched(
            jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
            jacobi=True,
        )
        true = rel_res(A, res.x, b)
        reported = np.asarray(res.resnorm, np.float64)
        # reported residual is the true one (same quantity, f32 noise);
        # the pre-fix scaled-system residual here is orders smaller.
        np.testing.assert_allclose(reported, true, rtol=2e-2)
        assert reported.max() > 1e-3  # honesty: not the scaled resid
        assert not bool(np.asarray(res.converged).any())
