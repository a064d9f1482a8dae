"""Pseudospectra (σmin(A − zI) maps) vs f64 SVD oracles."""

import numpy as np

import jax.numpy as jnp

from linalg_solver_tpu.ops.pseudospectra import (
    pseudospectrum_grid_batched,
    sigmin_points_batched,
)


class TestSigminPoints:
    def test_matches_f64_svd(self):
        rng = np.random.RandomState(0)
        n = 12
        A = rng.randn(2, n, n).astype(np.float32)
        zr = np.array([0.0, 1.0, -0.5, 2.0], np.float32)
        zi = np.array([0.0, 0.5, 1.0, -1.0], np.float32)
        res = sigmin_points_batched(
            jnp.asarray(A), jnp.asarray(zr), jnp.asarray(zi)
        )
        assert bool(np.asarray(res.converged).all())
        for b in range(2):
            for g in range(4):
                M = A[b].astype(np.float64) - (
                    zr[g] + 1j * zi[g]
                ) * np.eye(n)
                want = np.linalg.svd(M, compute_uv=False)[-1]
                got = float(res.sigmin[b, g])
                assert abs(got - want) / want < 1e-4, (b, g)

    def test_normal_matrix_is_spectral_distance(self):
        """For a NORMAL matrix, σmin(A − zI) = min_i |λ_i − z| — the
        pseudospectrum degenerates to disks around eigenvalues."""
        rng = np.random.RandomState(1)
        n = 10
        Q, _ = np.linalg.qr(rng.randn(n, n))
        lam = np.linspace(-2.0, 3.0, n)
        A = (Q @ np.diag(lam) @ Q.T).astype(np.float32)[None]
        zr = np.array([0.1, 1.3, -2.5], np.float32)
        zi = np.array([0.2, 0.0, 0.4], np.float32)
        res = sigmin_points_batched(
            jnp.asarray(A), jnp.asarray(zr), jnp.asarray(zi)
        )
        for g in range(3):
            want = np.abs(lam - (zr[g] + 1j * zi[g])).min()
            got = float(res.sigmin[0, g])
            assert abs(got - want) / want < 1e-3

    def test_z_at_eigenvalue_is_tiny(self):
        """z exactly on an eigenvalue: σmin collapses toward 0 (the
        resolvent blows up) without producing NaN/Inf."""
        A = np.diag([1.0, 2.0, 3.0, 4.0]).astype(np.float32)
        A[0, 1] = 0.5  # mildly non-normal
        res = sigmin_points_batched(
            jnp.asarray(A[None]),
            jnp.asarray(np.array([2.0], np.float32)),
            jnp.asarray(np.array([0.0], np.float32)),
        )
        s = np.asarray(res.sigmin)
        assert np.isfinite(s).all()
        assert s[0, 0] < 1e-5

    def test_nonnormal_exceeds_spectral_distance(self):
        """Jordan-type non-normality: the resolvent is FAR larger than
        eigenvalues suggest — σmin(A − zI) ≪ dist(z, Λ(A)).  This is
        the phenomenon pseudospectra exist to expose."""
        n = 8
        A = np.zeros((n, n), np.float32)
        A[np.arange(n - 1), np.arange(n - 1) + 1] = 2.0  # nilpotent-ish
        # all eigenvalues at 0; check z on the unit circle
        res = sigmin_points_batched(
            jnp.asarray(A[None]),
            jnp.asarray(np.array([0.5], np.float32)),
            jnp.asarray(np.array([0.0], np.float32)),
        )
        got = float(res.sigmin[0, 0])
        want = np.linalg.svd(
            A.astype(np.float64) - 0.5 * np.eye(n), compute_uv=False
        )[-1]
        assert abs(got - want) / want < 1e-3
        assert got < 0.1 * 0.5  # ≪ |z − 0| = dist to spectrum


class TestGrid:
    def test_grid_shape_and_values(self):
        rng = np.random.RandomState(2)
        n = 8
        A = rng.randn(2, n, n).astype(np.float32)
        re = np.linspace(-1, 1, 5).astype(np.float32)
        im = np.linspace(-0.5, 0.5, 3).astype(np.float32)
        res = pseudospectrum_grid_batched(
            jnp.asarray(A), jnp.asarray(re), jnp.asarray(im)
        )
        assert res.sigmin.shape == (2, 3, 5)
        # spot-check one interior point against the flat entry point
        flat = sigmin_points_batched(
            jnp.asarray(A),
            jnp.asarray(np.array([re[2]], np.float32)),
            jnp.asarray(np.array([im[1]], np.float32)),
        )
        np.testing.assert_allclose(
            np.asarray(res.sigmin[:, 1, 2]),
            np.asarray(flat.sigmin[:, 0]),
            rtol=1e-5,
        )

    def test_eps_contour_encloses_spectrum(self):
        """Every eigenvalue lies inside the ε-contour: σmin at the
        eigenvalue locations is (near) zero, grid min ≤ ε."""
        rng = np.random.RandomState(3)
        n = 6
        A = rng.randn(1, n, n).astype(np.float32)
        lam = np.linalg.eigvals(A[0].astype(np.float64))
        re = np.linspace(lam.real.min() - 1, lam.real.max() + 1, 9)
        im = np.linspace(lam.imag.min() - 1, lam.imag.max() + 1, 9)
        res = pseudospectrum_grid_batched(
            jnp.asarray(A),
            jnp.asarray(re.astype(np.float32)),
            jnp.asarray(im.astype(np.float32)),
        )
        sig = np.asarray(res.sigmin)[0]
        # σmin is 1-Lipschitz in z, so the grid minimum is bounded by
        # the distance from the nearest grid node to the spectrum.
        h = max(re[1] - re[0], im[1] - im[0])
        assert sig.min() <= h
