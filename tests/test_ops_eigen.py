"""Device eigen stack + generator tests (CPU, small fixed shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu.ops.eigen import (
    algebraic_multiplicities,
    charpoly,
    charpoly_batched,
    diagonalize,
    diagonalize_batched,
    eigenspace,
    eigvals_qr,
    eigvals_qr_batched,
    geometric_multiplicity,
    weyr_characteristic,
)
from linalg_solver_tpu.ops.generate import (
    diagonalizable_batch,
    full_rank_batch,
    jordan_batch,
    jordan_form_matrix,
    random_batch,
    rank_batch,
    unimodular_batch,
)


class TestCharpoly:
    def test_2x2(self):
        A = jnp.array([[2.0, 1.0], [0.0, 3.0]])
        # p(l) = l^2 - 5l + 6
        np.testing.assert_allclose(charpoly(A), [1.0, -5.0, 6.0], atol=1e-5)

    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            A = rng.randint(-4, 5, (4, 4)).astype(np.float32)
            got = np.asarray(charpoly(jnp.asarray(A)))
            expected = np.poly(A.astype(np.float64))
            np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)

    def test_batched(self):
        rng = np.random.RandomState(1)
        batch = rng.randint(-3, 4, (4, 3, 3)).astype(np.float32)
        coeffs = charpoly_batched(jnp.asarray(batch))
        for i in range(4):
            np.testing.assert_allclose(
                coeffs[i], np.poly(batch[i].astype(np.float64)),
                rtol=1e-4, atol=1e-3,
            )


class TestEigvals:
    def test_diagonal(self):
        ev = eigvals_qr(jnp.diag(jnp.array([3.0, 1.0, -2.0])))
        got = sorted(np.asarray(ev.real))
        np.testing.assert_allclose(got, [-2.0, 1.0, 3.0], atol=1e-4)
        np.testing.assert_allclose(ev.imag, 0, atol=1e-5)

    def test_random_real_spectra(self):
        rng = np.random.RandomState(2)
        for _ in range(5):
            # Symmetric => real spectrum.
            M = rng.randn(5, 5).astype(np.float32)
            A = (M + M.T) / 2
            ev = eigvals_qr(jnp.asarray(A), iters=200)
            got = np.sort(np.asarray(ev.real))
            expected = np.sort(np.linalg.eigvalsh(A.astype(np.float64)))
            np.testing.assert_allclose(got, expected, atol=1e-3)
            np.testing.assert_allclose(ev.imag, 0, atol=1e-3)

    def test_complex_pair(self):
        # Rotation: eigenvalues ±i.
        A = jnp.array([[0.0, -1.0], [1.0, 0.0]])
        ev = eigvals_qr(A, iters=50)
        np.testing.assert_allclose(np.sort(np.asarray(ev.imag)),
                                   [-1.0, 1.0], atol=1e-4)
        np.testing.assert_allclose(ev.real, 0, atol=1e-4)

    def test_general_nonsymmetric(self):
        rng = np.random.RandomState(3)
        for _ in range(5):
            A = rng.randint(-3, 4, (4, 4)).astype(np.float32)
            ev = eigvals_qr(jnp.asarray(A), iters=300)
            got = np.sort_complex(
                np.asarray(ev.real) + 1j * np.asarray(ev.imag)
            )
            expected = np.sort_complex(
                np.linalg.eigvals(A.astype(np.float64))
            )
            np.testing.assert_allclose(got, expected, atol=2e-2)

    def test_batched(self):
        batch = jnp.stack([
            jnp.diag(jnp.array([1.0, 2.0, 3.0])),
            jnp.diag(jnp.array([5.0, 5.0, -1.0])),
        ])
        ev = eigvals_qr_batched(batch)
        assert ev.real.shape == (2, 3)


class TestMultiplicities:
    def test_algebraic(self):
        real = jnp.array([5.0, 5.0, 1.0])
        imag = jnp.zeros(3)
        mult = algebraic_multiplicities(real, imag, tol=1e-3)
        assert list(np.asarray(mult)) == [2, 2, 1]

    def test_geometric_diagonal(self):
        A = jnp.diag(jnp.array([3.0, 3.0, 1.0]))
        assert int(geometric_multiplicity(A, jnp.float32(3.0))) == 2
        assert int(geometric_multiplicity(A, jnp.float32(1.0))) == 1

    def test_geometric_jordan(self):
        # Jordan block: alg 2, geom 1.
        J = jnp.array([[2.0, 1.0], [0.0, 2.0]])
        assert int(geometric_multiplicity(J, jnp.float32(2.0))) == 1

    def test_weyr(self):
        # J(2,2) ⊕ J(2,1): Weyr w = [2, 1] -> two blocks, one of size >= 2.
        J = jordan_form_matrix([(2.0, 2), (2.0, 1)])
        w = weyr_characteristic(J, jnp.float32(2.0), k_max=3)
        assert list(np.asarray(w)) == [2, 1, 0]

    def test_eigenspace_vectors(self):
        A = jnp.diag(jnp.array([4.0, 4.0, 1.0]))
        space = eigenspace(A, jnp.float32(4.0))
        assert int(space.dim) == 2
        gens = np.asarray(space.generators)
        mask = np.asarray(space.gen_mask)
        for j in range(3):
            if mask[j]:
                v = gens[:, j]
                np.testing.assert_allclose(
                    np.asarray(A) @ v, 4.0 * v, atol=1e-5
                )


class TestDiagonalize:
    def test_distinct_eigenvalues(self):
        key = jax.random.PRNGKey(0)
        batch = diagonalizable_batch(key, 3, [5.0, 2.0, -5.0])
        res = diagonalize_batched(batch, iters=200)
        assert bool(np.asarray(res.success).all())
        A = np.asarray(batch)
        P = np.asarray(res.P)
        D = np.asarray(res.D)
        P_inv = np.asarray(res.P_inv)
        for i in range(3):
            # D should be diagonal with the prescribed eigenvalues.
            np.testing.assert_allclose(
                np.sort(np.diag(D[i])), [-5.0, 2.0, 5.0], atol=1e-2
            )
            np.testing.assert_allclose(
                D[i], np.diag(np.diag(D[i])), atol=1e-2
            )
            np.testing.assert_allclose(
                P[i] @ D[i] @ P_inv[i], A[i], atol=1e-2
            )

    def test_defective_fails(self):
        key = jax.random.PRNGKey(1)
        batch = jordan_batch(key, 2, ((2.0, 2), (1.0, 1)))
        res = diagonalize_batched(batch, iters=200, tol=3e-2)
        assert not bool(np.asarray(res.success).any())


class TestGenerators:
    def test_random_batch_range(self):
        x = random_batch(jax.random.PRNGKey(0), 4, 3, 3, lo=-5, hi=5)
        assert x.shape == (4, 3, 3)
        arr = np.asarray(x)
        assert arr.min() >= -5 and arr.max() <= 5
        assert np.all(arr == np.round(arr))

    def test_unimodular_det(self):
        P = unimodular_batch(jax.random.PRNGKey(1), 8, 4)
        dets = np.linalg.det(np.asarray(P).astype(np.float64))
        np.testing.assert_allclose(np.abs(dets), 1.0, atol=1e-6)

    def test_full_rank(self):
        A = full_rank_batch(jax.random.PRNGKey(2), 8, 4)
        dets = np.linalg.det(np.asarray(A).astype(np.float64))
        assert np.all(np.abs(dets) > 0.5)

    def test_rank_batch(self):
        A = rank_batch(jax.random.PRNGKey(3), 6, 4, 5, r=2)
        for i in range(6):
            assert np.linalg.matrix_rank(np.asarray(A[i])) == 2

    def test_diagonalizable_eigs(self):
        A = diagonalizable_batch(jax.random.PRNGKey(4), 4, [1.0, 2.0, 3.0])
        for i in range(4):
            got = np.sort(np.linalg.eigvals(
                np.asarray(A[i]).astype(np.float64)
            ).real)
            np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-3)

    def test_jordan_batch_spectrum(self):
        A = jordan_batch(jax.random.PRNGKey(5), 3, ((2.0, 2), (5.0, 1)))
        for i in range(3):
            got = np.sort(np.linalg.eigvals(
                np.asarray(A[i]).astype(np.float64)
            ).real)
            np.testing.assert_allclose(got, [2.0, 2.0, 5.0], atol=1e-3)


class TestSpectralDecomposeBatched:
    """Distinct-compaction spectral decomposition: one batched nullspace
    pass must reproduce the per-slot multiplicities and a valid P D P⁻¹."""

    def _mk(self, vals, seed=0):
        rng = np.random.RandomState(seed)
        B, n = vals.shape
        D = np.stack([np.diag(v) for v in vals])
        P = rng.randn(B, n, n).astype(np.float32)
        A = np.einsum("bij,bjk,bkl->bil", P, D, np.linalg.inv(P))
        return A.astype(np.float32)

    def test_multiplicities_and_reconstruction(self):
        from linalg_solver_tpu.ops.eigen import spectral_decompose_batched

        vals = np.array(
            [[3, 3, 2, 2, 2, 1], [5, 4, 3, 2, 1, 0], [1, 1, 1, 1, 1, 1]],
            np.float32,
        )
        A = self._mk(vals, seed=41)
        res = spectral_decompose_batched(
            jnp.asarray(A), jnp.asarray(vals),
            jnp.zeros(vals.shape, jnp.float32),
            tol=1e-3, space_tol=1e-3,
        )
        assert bool(np.asarray(res.success).all())
        np.testing.assert_array_equal(
            np.asarray(res.alg_mult[0]), [2, 2, 3, 3, 3, 1]
        )
        np.testing.assert_array_equal(
            np.asarray(res.geom_mult), np.asarray(res.alg_mult)
        )
        Arec = (
            np.asarray(res.P, np.float64)
            @ np.asarray(res.D, np.float64)
            @ np.asarray(res.P_inv, np.float64)
        )
        assert np.abs(Arec - A).max() / np.abs(A).max() < 1e-4

    def test_defective_flagged(self):
        from linalg_solver_tpu.ops.eigen import spectral_decompose_batched

        J = np.array(
            [[[2, 1, 0], [0, 2, 0], [0, 0, 1]]], np.float32
        )
        res = spectral_decompose_batched(
            jnp.asarray(J), jnp.asarray([[2, 2, 1]], np.float32),
            jnp.zeros((1, 3), jnp.float32),
        )
        assert not bool(np.asarray(res.success)[0])
        np.testing.assert_array_equal(
            np.asarray(res.geom_mult[0]), [1, 1, 1]
        )
        np.testing.assert_array_equal(
            np.asarray(res.alg_mult[0]), [2, 2, 1]
        )

    def test_max_distinct_bound(self):
        from linalg_solver_tpu.ops.eigen import spectral_decompose_batched

        vals = np.array([[4, 4, 2, 2, 1, 1]], np.float32)
        A = self._mk(vals, seed=42)
        full = spectral_decompose_batched(
            jnp.asarray(A), jnp.asarray(vals),
            jnp.zeros(vals.shape, jnp.float32),
        )
        tight = spectral_decompose_batched(
            jnp.asarray(A), jnp.asarray(vals),
            jnp.zeros(vals.shape, jnp.float32), max_distinct=3,
        )
        assert bool(np.asarray(full.success).all())
        assert bool(np.asarray(tight.success).all())
        np.testing.assert_array_equal(
            np.asarray(full.geom_mult), np.asarray(tight.geom_mult)
        )
        # Bound BELOW the true distinct count: cluster 3 gets no space.
        starved = spectral_decompose_batched(
            jnp.asarray(A), jnp.asarray(vals),
            jnp.zeros(vals.shape, jnp.float32), max_distinct=2,
        )
        assert not bool(np.asarray(starved.success).any())

    def test_complex_pair_fails_gracefully(self):
        from linalg_solver_tpu.ops.eigen import spectral_decompose_batched

        rot = np.array([[[0, -1], [1, 0]]], np.float32)  # eigs ±i
        res = spectral_decompose_batched(
            jnp.asarray(rot),
            jnp.asarray([[0.0, 0.0]], np.float32),
            jnp.asarray([[1.0, -1.0]], np.float32),
        )
        assert not bool(np.asarray(res.success)[0])


class TestOrthonormalColumns:
    def test_ill_conditioned_generators_stay_finite(self):
        """Regression: plain CholeskyQR2 returns all-NaN for independent
        but ill-conditioned column sets (normalized Gram κ past 1/eps);
        the shifted first pass must keep the factorization PD."""
        from linalg_solver_tpu.ops.orth import orthonormal_columns

        rng = np.random.RandomState(0)
        n, d = 32, 3
        base = rng.randn(n)
        # near-parallel huge columns + tiny independent perturbations
        gens = np.zeros((1, n, n), np.float32)
        for j in range(d):
            gens[0, :, j] = 4e3 * base + 1e-2 * rng.randn(n)
        gmask = np.zeros((1, n), bool)
        gmask[0, :d] = True
        Q, dd = orthonormal_columns(
            jnp.asarray(gens), jnp.asarray(gmask)
        )
        Qn = np.asarray(Q)
        assert np.isfinite(Qn).all()
        assert int(dd[0]) == d
        # the span is preserved: projecting the generators onto Q's
        # column space must reproduce them (up to f32 conditioning)
        G = gens[0, :, :d].astype(np.float64)
        Qd = Qn[0, :, :d].astype(np.float64)
        proj = Qd @ (Qd.T @ G)
        assert np.abs(proj - G).max() / np.abs(G).max() < 1e-2

    def test_well_conditioned_orthonormal(self):
        from linalg_solver_tpu.ops.orth import orthonormal_columns

        rng = np.random.RandomState(1)
        gens = rng.randn(2, 24, 24).astype(np.float32)
        gmask = np.zeros((2, 24), bool)
        gmask[:, :10] = True
        Q, d = orthonormal_columns(jnp.asarray(gens), jnp.asarray(gmask))
        Qn = np.asarray(Q, np.float64)
        for b in range(2):
            QtQ = Qn[b, :, :10].T @ Qn[b, :, :10]
            np.testing.assert_allclose(QtQ, np.eye(10), atol=1e-4)
            assert np.abs(Qn[b, :, 10:]).max() == 0.0
