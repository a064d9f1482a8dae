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
