"""Symmetric eigensolver path: eigh wrapper, symmetry probe, and the
spectral-pipeline routing (method="eigh" / "auto")."""

import numpy as np

import jax.numpy as jnp

from linalg_solver_tpu.ops import symmetric


def sym_batch(B, n, seed=0, vals=None):
    rng = np.random.RandomState(seed)
    if vals is None:
        S = rng.randn(B, n, n).astype(np.float32)
        return (S + np.swapaxes(S, 1, 2)).astype(np.float32)
    Q, _ = np.linalg.qr(rng.randn(B, n, n))
    return ((Q * vals[None, None, :]) @ np.swapaxes(Q, 1, 2)).astype(
        np.float32
    )


class TestEighBatched:
    def test_matches_numpy(self):
        A = sym_batch(3, 32, seed=1)
        res = symmetric.eigh_batched(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        w = np.sort(np.asarray(res.w), axis=1)
        want = np.sort(
            np.linalg.eigvalsh(A.astype(np.float64)), axis=1
        )
        np.testing.assert_allclose(w, want, atol=5e-5 * np.abs(want).max())

    def test_reconstruction_and_orthogonality(self):
        A = sym_batch(2, 24, seed=2)
        res = symmetric.eigh_batched(jnp.asarray(A))
        V = np.asarray(res.V).astype(np.float64)
        w = np.asarray(res.w).astype(np.float64)
        rec = np.einsum("bij,bj,bkj->bik", V, w, V)
        assert np.abs(rec - A).max() < 1e-4
        orth = np.einsum("bij,bik->bjk", V, V) - np.eye(24)
        assert np.abs(orth).max() < 1e-5

    def test_symmetrizes_near_symmetric_input(self):
        A = sym_batch(1, 16, seed=3)
        A2 = A + 1e-7 * np.random.RandomState(0).randn(1, 16, 16).astype(
            np.float32
        )
        r1 = symmetric.eigh_batched(jnp.asarray(A))
        r2 = symmetric.eigh_batched(jnp.asarray(A2))
        np.testing.assert_allclose(
            np.asarray(r1.w), np.asarray(r2.w), atol=1e-5
        )


class TestSymmetryProbe:
    def test_detects_symmetry(self):
        A = sym_batch(2, 16, seed=4)
        G = np.random.RandomState(5).randn(2, 16, 16).astype(np.float32)
        batch = np.concatenate([A, G])
        got = np.asarray(
            symmetric.is_symmetric_batched(jnp.asarray(batch))
        )
        np.testing.assert_array_equal(got, [True, True, False, False])


class TestSpectralPipelineEigh:
    def test_eigh_method_full_report(self):
        from linalg_solver_tpu.models.spectral import spectral_pipeline

        vals = np.concatenate(
            [np.full(16, 2.0), np.full(16, 5.0)]
        ).astype(np.float32)
        A = sym_batch(2, 32, seed=6, vals=vals)
        rep = spectral_pipeline(jnp.asarray(A), method="eigh")
        assert bool(np.asarray(rep.diagonalizable).all())
        # P orthogonal: P_inv = P^T exactly
        np.testing.assert_allclose(
            np.asarray(rep.P_inv),
            np.swapaxes(np.asarray(rep.P), 1, 2),
            atol=0,
        )
        # reconstruction P D P^T = A
        rec = np.einsum(
            "bij,bjk,bkl->bil",
            np.asarray(rep.P), np.asarray(rep.D), np.asarray(rep.P_inv),
        )
        assert np.abs(rec - A).max() < 1e-3
        # multiplicities: two clusters of 16, alg == geom
        am = np.sort(np.asarray(rep.alg_mult), axis=1)
        assert (am[:, -1] == 16).all() and (am[:, -2] == 16).all()
        np.testing.assert_array_equal(
            np.asarray(rep.alg_mult), np.asarray(rep.geom_mult)
        )

    def test_auto_routes_symmetric_to_eigh(self):
        from linalg_solver_tpu.models import spectral

        A = sym_batch(2, 24, seed=7)
        rep = spectral.spectral_pipeline(jnp.asarray(A), method="auto")
        assert bool(np.asarray(rep.diagonalizable).all())
        np.testing.assert_allclose(
            np.asarray(rep.P_inv),
            np.swapaxes(np.asarray(rep.P), 1, 2),
            atol=0,
        )

    def test_auto_routes_general_to_schur(self):
        from linalg_solver_tpu.models.spectral import spectral_pipeline

        rng = np.random.RandomState(8)
        A = rng.randn(2, 24, 24).astype(np.float32)
        rep = spectral_pipeline(jnp.asarray(A), method="auto")
        # general gaussian input: must still produce a report with the
        # schur machinery (eigenvalues match numpy).  Match spectra
        # nearest-neighbor PER LANE (sort_complex orders by real part
        # and scrambles near-ties — CLAUDE.md).
        got = np.asarray(rep.eig_real) + 1j * np.asarray(rep.eig_imag)
        for b in range(A.shape[0]):
            want = np.linalg.eigvals(A[b].astype(np.float64))
            for g in got[b]:
                i = np.argmin(np.abs(want - g))
                assert abs(want[i] - g) < 1e-3
                want = np.delete(want, i)
