"""Distributed block-Jacobi eigendecomposition on the 8 virtual CPU
devices: differential vs numpy, mesh-shape invariance, sharding
round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.parallel.distributed_eigh import (
    distributed_eigh,
    distributed_svd_jacobi,
)
from linalg_solver_tpu.parallel.mesh import make_mesh


def sym(n, seed=0, spectrum=None):
    rng = np.random.RandomState(seed)
    if spectrum is None:
        a = rng.randn(n, n)
        return ((a + a.T) / 2).astype(np.float32)
    Q, _ = np.linalg.qr(rng.randn(n, n))
    return ((Q * spectrum) @ Q.T).astype(np.float32)


def check_decomposition(A, res, atol):
    w = np.asarray(res.w, np.float64)
    V = np.asarray(res.V, np.float64)
    n = A.shape[0]
    # orthonormal eigenvectors
    np.testing.assert_allclose(V.T @ V, np.eye(n), atol=10 * atol)
    # A V = V diag(w)
    r = A.astype(np.float64) @ V - V * w[None, :]
    assert np.abs(r).max() < atol * max(np.abs(A).max(), 1.0), (
        np.abs(r).max()
    )
    # spectrum matches numpy
    np.testing.assert_allclose(
        np.sort(w), np.linalg.eigvalsh(A.astype(np.float64)),
        atol=atol * max(np.abs(A).max(), 1.0),
    )


class TestDistributedEigh:
    @pytest.mark.parametrize("shards", [1, 2, 4, 8])
    def test_matches_numpy(self, shards):
        mesh = make_mesh(dp=shards, tp=8 // shards)
        A = sym(48, seed=1)
        res = distributed_eigh(jnp.asarray(A), mesh, axis="dp")
        assert bool(res.converged), float(res.offnorm)
        check_decomposition(A, res, atol=1e-4)

    def test_mesh_shape_invariance_of_spectrum(self):
        A = sym(32, seed=2)
        ws = []
        for shards in (1, 2, 4):
            mesh = make_mesh(dp=shards, tp=8 // shards)
            res = distributed_eigh(jnp.asarray(A), mesh, axis="dp")
            assert bool(res.converged)
            ws.append(np.sort(np.asarray(res.w)))
        for w in ws[1:]:
            np.testing.assert_allclose(w, ws[0], atol=1e-4)

    def test_clustered_spectrum(self):
        """Multiplicity-heavy spectra — the regime that stresses the
        Francis iteration is easy for Jacobi."""
        spec = np.repeat([1.0, 2.0, 3.0], 16)
        A = sym(48, seed=3, spectrum=spec)
        mesh = make_mesh(dp=4, tp=2)
        res = distributed_eigh(jnp.asarray(A), mesh, axis="dp")
        assert bool(res.converged)
        np.testing.assert_allclose(
            np.sort(np.asarray(res.w)), np.sort(spec), atol=1e-4
        )

    def test_graded_spectrum(self):
        spec = np.logspace(-3, 3, 64)
        A = sym(64, seed=4, spectrum=spec)
        mesh = make_mesh(dp=8, tp=1)
        res = distributed_eigh(
            jnp.asarray(A), mesh, axis="dp", sweeps=10
        )
        assert bool(res.converged)
        w = np.sort(np.asarray(res.w, np.float64))
        np.testing.assert_allclose(
            w, spec, rtol=5e-4, atol=1e-3
        )

    def test_requires_divisible(self):
        mesh = make_mesh(dp=4, tp=2)
        with pytest.raises(ValueError):
            distributed_eigh(jnp.asarray(sym(30, seed=5)), mesh, axis="dp")

    def test_agrees_with_batched_eigh(self):
        from linalg_solver_tpu.ops.symmetric import eigh_batched

        A = sym(32, seed=6)
        mesh = make_mesh(dp=2, tp=4)
        res = distributed_eigh(jnp.asarray(A), mesh, axis="dp")
        w_d = np.sort(np.asarray(res.w))
        w_b = np.sort(np.asarray(eigh_batched(jnp.asarray(A[None])).w[0]))
        np.testing.assert_allclose(w_d, w_b, atol=1e-4)


class TestDistributedSVDJacobi:
    @pytest.mark.parametrize("shards", [1, 2, 4, 8])
    def test_matches_numpy(self, shards):
        mesh = make_mesh(dp=shards, tp=8 // shards)
        rng = np.random.RandomState(7)
        A = rng.randn(40, 32).astype(np.float32)
        res = distributed_svd_jacobi(jnp.asarray(A), mesh, axis="dp")
        assert bool(res.converged), float(res.offnorm)
        U = np.asarray(res.U, np.float64)
        s = np.asarray(res.s, np.float64)
        V = np.asarray(res.V, np.float64)
        np.testing.assert_allclose(
            (U * s[None, :]) @ V.T, A, atol=1e-4 * np.abs(A).max()
        )
        np.testing.assert_allclose(V.T @ V, np.eye(32), atol=1e-4)
        np.testing.assert_allclose(U.T @ U, np.eye(32), atol=1e-3)
        np.testing.assert_allclose(
            np.sort(s)[::-1],
            np.linalg.svd(A.astype(np.float64), compute_uv=False),
            rtol=1e-4, atol=1e-4,
        )

    def test_rank_deficient(self):
        rng = np.random.RandomState(8)
        A = (rng.randn(24, 8) @ rng.randn(8, 16)).astype(np.float32)
        mesh = make_mesh(dp=4, tp=2)
        res = distributed_svd_jacobi(
            jnp.asarray(A), mesh, axis="dp", sweeps=12
        )
        s = np.sort(np.asarray(res.s))[::-1]
        want = np.linalg.svd(A.astype(np.float64), compute_uv=False)
        np.testing.assert_allclose(s, want, atol=1e-3 * want[0])
        assert (s[8:] < 1e-3 * want[0]).all()
        U = np.asarray(res.U, np.float64)
        V = np.asarray(res.V, np.float64)
        np.testing.assert_allclose(
            (U * np.asarray(res.s)[None, :]) @ V.T, A,
            atol=1e-3 * want[0],
        )

    def test_square_matches_eigh_for_spd(self):
        """For SPD input, singular values == eigenvalues."""
        A = sym(32, seed=9, spectrum=np.linspace(1.0, 50.0, 32))
        mesh = make_mesh(dp=2, tp=4)
        res = distributed_svd_jacobi(jnp.asarray(A), mesh, axis="dp")
        np.testing.assert_allclose(
            np.sort(np.asarray(res.s)),
            np.linspace(1.0, 50.0, 32),
            rtol=1e-4,
        )
