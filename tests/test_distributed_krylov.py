"""Distributed row-sharded Krylov solves vs numpy, mesh-invariance."""

import numpy as np

import jax
import jax.numpy as jnp

from linalg_solver_tpu.parallel.mesh import make_mesh
from linalg_solver_tpu.parallel.distributed_krylov import (
    distributed_bicgstab,
    distributed_cg,
    distributed_gmres,
)


def spd_system(N, seed=0):
    rng = np.random.RandomState(seed)
    G = rng.randn(N, N)
    A = (G @ G.T / N + 4 * np.eye(N)).astype(np.float32)
    b = rng.randn(N).astype(np.float32)
    return A, b


class TestDistributedCG:
    def test_matches_numpy_and_mesh_invariant(self):
        A, b = spd_system(128)
        want = np.linalg.solve(A.astype(np.float64), b)
        results = []
        for dp in (1, 2, 4, 8):
            mesh = make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])
            res = distributed_cg(jnp.asarray(A), jnp.asarray(b), mesh,
                                 tol=1e-6)
            assert bool(res.converged)
            x = np.asarray(res.x, np.float64)
            assert np.abs(x - want).max() < 1e-4
            results.append((int(res.iters), x))
        # identical iteration counts and solutions across mesh shapes
        it0, x0 = results[0]
        for it, x in results[1:]:
            assert it == it0
            np.testing.assert_allclose(x, x0, atol=1e-6)

    def test_agrees_with_batched_core(self):
        from linalg_solver_tpu.ops.krylov import cg_batched

        A, b = spd_system(64, seed=1)
        mesh = make_mesh(dp=8, tp=1)
        r1 = distributed_cg(jnp.asarray(A), jnp.asarray(b), mesh,
                            tol=1e-6)
        r2 = cg_batched(jnp.asarray(A[None]), jnp.asarray(b[None]),
                        tol=1e-6)
        np.testing.assert_allclose(np.asarray(r1.x),
                                   np.asarray(r2.x)[0], atol=1e-5)

    def test_honest_failure_on_indefinite(self):
        """CG on an indefinite matrix with few iterations: flags must
        admit failure."""
        rng = np.random.RandomState(2)
        N = 64
        A = np.diag(np.concatenate(
            [np.ones(32), -np.ones(32)]
        )).astype(np.float32) + 0.01 * rng.randn(N, N).astype(np.float32)
        A = (A + A.T) / 2
        b = rng.randn(N).astype(np.float32)
        mesh = make_mesh(dp=8, tp=1)
        res = distributed_cg(jnp.asarray(A), jnp.asarray(b), mesh,
                             tol=1e-7, max_iters=5)
        assert not bool(res.converged)


class TestDistributedGeneral:
    def _system(self, N, seed=3):
        rng = np.random.RandomState(seed)
        A = (rng.randn(N, N)
             + 4 * np.sqrt(N) * np.eye(N)).astype(np.float32)
        b = rng.randn(N).astype(np.float32)
        return A, b

    def test_bicgstab_matches_numpy(self):
        A, b = self._system(96)
        mesh = make_mesh(dp=8, tp=1)
        res = distributed_bicgstab(jnp.asarray(A), jnp.asarray(b),
                                   mesh, tol=1e-6)
        assert bool(res.converged)
        want = np.linalg.solve(A.astype(np.float64), b)
        assert np.abs(np.asarray(res.x, np.float64) - want).max() < 1e-4

    def test_gmres_matches_numpy(self):
        A, b = self._system(96, seed=4)
        mesh = make_mesh(dp=8, tp=1)
        res = distributed_gmres(jnp.asarray(A), jnp.asarray(b), mesh,
                                tol=1e-6)
        assert bool(res.converged)
        want = np.linalg.solve(A.astype(np.float64), b)
        assert np.abs(np.asarray(res.x, np.float64) - want).max() < 1e-4

    def test_gmres_mesh_invariant(self):
        A, b = self._system(64, seed=5)
        xs = []
        for dp in (2, 8):
            mesh = make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])
            res = distributed_gmres(jnp.asarray(A), jnp.asarray(b),
                                    mesh, tol=1e-6)
            assert bool(res.converged)
            xs.append(np.asarray(res.x))
        np.testing.assert_allclose(xs[0], xs[1], atol=1e-5)
