"""Quadratic eigenproblems vs per-coordinate exact roots."""

import numpy as np

import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.slow

from linalg_solver_tpu.ops.quadeig import quadeig_batched


def diagonal_quadratic(seed=0, singular_mass_at=None):
    """Equivalence-scrambled diagonal quadratic pencil: the exact
    eigenvalues are the per-coordinate quadratic roots (equivalence
    transforms P·(λ²M+λC+K)·Q preserve them)."""
    rng = np.random.RandomState(seed)
    mm = np.array([1.0, 2.0, 1.0, 0.5, 1.0, 3.0])
    cc = np.array([0.5, 1.0, 3.0, 0.2, 2.0, 0.1])
    kk = np.array([4.0, 9.0, 1.0, 6.0, 5.0, 2.0])
    if singular_mass_at is not None:
        mm[singular_mass_at] = 0.0
    roots = []
    for i in range(len(mm)):
        if mm[i] != 0:
            roots.extend(np.roots([mm[i], cc[i], kk[i]]))
        else:
            roots.append(-kk[i] / cc[i])  # degree drop: one root
    n = len(mm)
    P = rng.randn(n, n) * 0.3 + np.eye(n)
    Q = rng.randn(n, n) * 0.3 + np.eye(n)
    M = (P @ np.diag(mm) @ Q)[None].astype(np.float32)
    C = (P @ np.diag(cc) @ Q)[None].astype(np.float32)
    K = (P @ np.diag(kk) @ Q)[None].astype(np.float32)
    return M, C, K, np.array(roots)


def match_sets(got, want, tol):
    want = list(want)
    for g in got:
        j = int(np.argmin(np.abs(np.array(want) - g)))
        assert abs(want[j] - g) < tol, (g, want[j])
        want.pop(j)
    assert not want


class TestQuadEig:
    def test_roots_and_residuals(self):
        M, C, K, roots = diagonal_quadratic(seed=0)
        res = quadeig_batched(jnp.asarray(M), jnp.asarray(C),
                              jnp.asarray(K))
        assert bool(np.asarray(res.ok).all())
        fin = np.asarray(res.finite)[0]
        assert fin.sum() == 12
        lam = (np.asarray(res.real)[0] + 1j * np.asarray(res.imag)[0])
        match_sets(lam[fin], roots, tol=5e-3)
        assert np.asarray(res.resid).max() < 1e-4

    def test_singular_mass(self):
        """A zero mass row drops the polynomial degree: 11 finite
        eigenvalues + 1 infinite, all flagged correctly."""
        M, C, K, roots = diagonal_quadratic(seed=0, singular_mass_at=3)
        res = quadeig_batched(jnp.asarray(M), jnp.asarray(C),
                              jnp.asarray(K))
        assert bool(np.asarray(res.ok).all())
        fin = np.asarray(res.finite)[0]
        assert fin.sum() == 11
        lam = (np.asarray(res.real)[0] + 1j * np.asarray(res.imag)[0])
        match_sets(lam[fin], roots, tol=5e-3)
        assert np.asarray(res.resid)[0][fin].max() < 1e-4

    def test_eigenvector_quadratic_residual_f64(self):
        """Returned v satisfies (λ²M + λC + K)v ≈ 0 in f64."""
        M, C, K, _ = diagonal_quadratic(seed=1)
        res = quadeig_batched(jnp.asarray(M), jnp.asarray(C),
                              jnp.asarray(K))
        fin = np.asarray(res.finite)[0]
        lam = (np.asarray(res.real, np.float64)[0]
               + 1j * np.asarray(res.imag, np.float64)[0])
        V = (np.asarray(res.vectors_real, np.float64)[0]
             + 1j * np.asarray(res.vectors_imag, np.float64)[0])
        M64, C64, K64 = (X[0].astype(np.float64) for X in (M, C, K))
        scale = np.abs(M64).max() + np.abs(C64).max() + np.abs(K64).max()
        for j in np.where(fin)[0]:
            r = (lam[j] ** 2 * M64 + lam[j] * C64 + K64) @ V[:, j]
            assert np.linalg.norm(r) < 1e-3 * scale * max(
                1.0, abs(lam[j]) ** 2
            )

    def test_batched_lanes(self):
        M1, C1, K1, r1 = diagonal_quadratic(seed=2)
        M2, C2, K2, r2 = diagonal_quadratic(seed=3, singular_mass_at=0)
        M = np.concatenate([M1, M2])
        C = np.concatenate([C1, C2])
        K = np.concatenate([K1, K2])
        res = quadeig_batched(jnp.asarray(M), jnp.asarray(C),
                              jnp.asarray(K))
        fin = np.asarray(res.finite)
        assert fin[0].sum() == 12 and fin[1].sum() == 11
        lam = np.asarray(res.real) + 1j * np.asarray(res.imag)
        match_sets(lam[0][fin[0]], r1, tol=5e-3)
        match_sets(lam[1][fin[1]], r2, tol=5e-3)


class TestPolyEig:
    def _diagonal_poly(self, coeff_rows, seed=0):
        """Equivalence-scrambled diagonal degree-d pencil; exact
        eigenvalues are the per-coordinate scalar-polynomial roots."""
        rng = np.random.RandomState(seed)
        coeff_rows = [np.asarray(c, np.float64) for c in coeff_rows]
        n = len(coeff_rows[0])
        roots = []
        for i in range(n):
            # np.roots wants highest degree first
            poly = [c[i] for c in coeff_rows[::-1]]
            roots.extend(np.roots(poly))
        P = rng.randn(n, n) * 0.3 + np.eye(n)
        Q = rng.randn(n, n) * 0.3 + np.eye(n)
        mats = [
            (P @ np.diag(c) @ Q)[None].astype(np.float32)
            for c in coeff_rows
        ]
        return mats, np.array(roots)

    def test_cubic_roots(self):
        from linalg_solver_tpu.ops.quadeig import polyeig_batched

        coeffs = [
            [4.0, 2.0, 6.0, 1.0],    # A0
            [1.0, 3.0, 0.5, 2.0],    # A1
            [0.5, 1.0, 2.0, 0.3],    # A2
            [1.0, 0.5, 1.0, 2.0],    # A3 (nonsingular leading)
        ]
        mats, roots = self._diagonal_poly(coeffs, seed=1)
        res = polyeig_batched([jnp.asarray(m) for m in mats])
        assert bool(np.asarray(res.ok).all())
        assert bool(np.asarray(res.finite).all())
        got = (np.asarray(res.real)[0] + 1j * np.asarray(res.imag)[0])
        match_sets(got, roots, 2e-3)
        assert np.asarray(res.resid).max() < 1e-4

    def test_degree2_matches_quadeig(self):
        from linalg_solver_tpu.ops.quadeig import polyeig_batched

        M, C, K, _ = diagonal_quadratic(seed=3)
        r1 = polyeig_batched(
            [jnp.asarray(K), jnp.asarray(C), jnp.asarray(M)]
        )
        r2 = quadeig_batched(
            jnp.asarray(M), jnp.asarray(C), jnp.asarray(K)
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(r1.real)), np.sort(np.asarray(r2.real))
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(r1.imag)), np.sort(np.asarray(r2.imag))
        )

    def test_degree1_is_generalized_eig(self):
        """[A0, A1]: polyeig solves A0 v = −λ A1 v — cross-check
        against scipy's generalized eigensolver."""
        import scipy.linalg

        from linalg_solver_tpu.ops.quadeig import polyeig_batched

        rng = np.random.RandomState(4)
        n = 6
        A0 = rng.randn(1, n, n).astype(np.float32)
        A1 = (rng.randn(1, n, n) + 3 * np.eye(n)).astype(np.float32)
        res = polyeig_batched([jnp.asarray(A0), jnp.asarray(A1)])
        want = scipy.linalg.eigvals(
            -A0[0].astype(np.float64), A1[0].astype(np.float64)
        )
        got = np.asarray(res.real)[0] + 1j * np.asarray(res.imag)[0]
        match_sets(got, want, 2e-3)

    def test_singular_leading_coefficient(self):
        """Rank-deficient A_d: the missing degrees surface as flagged
        infinite eigenvalues, finite ones stay correct."""
        from linalg_solver_tpu.ops.quadeig import polyeig_batched

        coeffs = [
            [2.0, 3.0, 1.0, 5.0],
            [1.0, 0.5, 2.0, 1.0],
            [1.0, 1.0, 0.0, 0.0],    # A2 singular: 2 infinite eigs
        ]
        mats, roots = self._diagonal_poly(coeffs, seed=5)
        res = polyeig_batched([jnp.asarray(m) for m in mats])
        fin = np.asarray(res.finite)[0]
        assert fin.sum() == len(roots) == 6
        got = (np.asarray(res.real)[0] + 1j * np.asarray(res.imag)[0])[
            fin
        ]
        match_sets(got, roots, 2e-3)

    def test_scalar_coefficients_match_np_roots(self):
        """1×1 coefficients: polyeig IS the scalar companion-root
        finder."""
        from linalg_solver_tpu.ops.quadeig import polyeig_batched

        poly = [6.0, -5.0, -2.0, 1.0]  # lowest first
        mats = [
            jnp.asarray(np.full((1, 1, 1), c, np.float32))
            for c in poly
        ]
        res = polyeig_batched(mats)
        want = np.roots(poly[::-1])
        got = np.asarray(res.real)[0] + 1j * np.asarray(res.imag)[0]
        match_sets(got, want, 1e-3)

    def test_residual_f64_verified(self):
        from linalg_solver_tpu.ops.quadeig import polyeig_batched

        rng = np.random.RandomState(7)
        B, n, d = 2, 5, 3
        mats = [
            (rng.randn(B, n, n) + (2.0 if i == d else 0.0) * np.eye(n))
            .astype(np.float32)
            for i in range(d + 1)
        ]
        res = polyeig_batched([jnp.asarray(m) for m in mats])
        lam = (np.asarray(res.real, np.float64)
               + 1j * np.asarray(res.imag, np.float64))
        V = (np.asarray(res.vectors_real, np.float64)
             + 1j * np.asarray(res.vectors_imag, np.float64))
        fin = np.asarray(res.finite)
        for b in range(B):
            for j in range(d * n):
                if not fin[b, j]:
                    continue
                P = sum(
                    lam[b, j] ** i * mats[i][b].astype(np.float64)
                    for i in range(d + 1)
                )
                r = np.linalg.norm(P @ V[b, :, j])
                scale = sum(
                    abs(lam[b, j]) ** i
                    * np.abs(mats[i][b]).sum(axis=0).max()
                    for i in range(d + 1)
                )
                assert r / scale < 5e-4
