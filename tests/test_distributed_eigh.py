"""Distributed block-Jacobi eigendecomposition on the 8 virtual CPU
devices: differential vs numpy, mesh-shape invariance, sharding
round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.parallel.distributed_eigh import distributed_eigh
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
