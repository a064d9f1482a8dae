"""Generalized eigenproblems vs scipy."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.geig import (
    eig_generalized_batched,
    eigh_generalized_batched,
)


def spd(B, n, seed=0):
    rng = np.random.RandomState(seed)
    G = rng.randn(B, n, n).astype(np.float32)
    return np.einsum("bik,bjk->bij", G, G) + 0.5 * np.eye(
        n, dtype=np.float32
    )


class TestEighGeneralized:
    def test_matches_scipy(self):
        from scipy.linalg import eigh

        B, n = 3, 12
        rng = np.random.RandomState(1)
        A = rng.randn(B, n, n).astype(np.float32)
        A = A + np.swapaxes(A, 1, 2)
        Bm = spd(B, n, seed=2)
        res = eigh_generalized_batched(jnp.asarray(A), jnp.asarray(Bm))
        assert bool(np.asarray(res.ok).all())
        w = np.asarray(res.w)
        V = np.asarray(res.V)
        for i in range(B):
            want = eigh(
                A[i].astype(np.float64), Bm[i].astype(np.float64),
                eigvals_only=True,
            )
            scale = max(np.abs(want).max(), 1.0)
            assert np.abs(w[i] - want).max() / scale < 1e-4
            # residual + B-orthonormality
            R = A[i] @ V[i] - Bm[i] @ V[i] * w[i][None, :]
            assert np.abs(R).max() < 1e-2
            np.testing.assert_allclose(
                V[i].T @ Bm[i] @ V[i], np.eye(n), atol=1e-3
            )

    def test_non_spd_b_flagged(self):
        rng = np.random.RandomState(3)
        A = rng.randn(2, 6, 6).astype(np.float32)
        A = A + np.swapaxes(A, 1, 2)
        Bm = spd(2, 6, seed=4)
        Bm[1] -= 20.0 * np.eye(6, dtype=np.float32)
        ok = np.asarray(
            eigh_generalized_batched(jnp.asarray(A), jnp.asarray(Bm)).ok
        )
        assert bool(ok[0]) and not bool(ok[1])


@pytest.mark.slow
class TestEigGeneralized:
    def test_matches_scipy_eig(self):
        from scipy.linalg import eig

        B, n = 2, 10
        rng = np.random.RandomState(5)
        A = rng.randn(B, n, n).astype(np.float32)
        Bm = (
            rng.randn(B, n, n) + 4.0 * np.sqrt(n) * np.eye(n)
        ).astype(np.float32)
        res = eig_generalized_batched(jnp.asarray(A), jnp.asarray(Bm))
        assert bool(np.asarray(res.ok).all())
        got = np.asarray(res.real) + 1j * np.asarray(res.imag)
        for i in range(B):
            want = eig(
                A[i].astype(np.float64), Bm[i].astype(np.float64),
                right=False,
            )
            # nearest-neighbor spectrum match (CLAUDE.md rule)
            for g in got[i]:
                j = np.argmin(np.abs(want - g))
                assert abs(want[j] - g) < 1e-3, (g, want)
                want = np.delete(want, j)

    def test_pencil_residual(self):
        """A v = λ B v residual for the computed eigenpairs."""
        rng = np.random.RandomState(6)
        n = 8
        A = rng.randn(1, n, n).astype(np.float32)
        Bm = (
            rng.randn(1, n, n) + 4.0 * np.sqrt(n) * np.eye(n)
        ).astype(np.float32)
        res = eig_generalized_batched(jnp.asarray(A), jnp.asarray(Bm))
        lam = np.asarray(res.real)[0] + 1j * np.asarray(res.imag)[0]
        V = (
            np.asarray(res.vectors_real)[0]
            + 1j * np.asarray(res.vectors_imag)[0]
        )
        valid = np.asarray(res.valid)[0]
        for j in range(n):
            if not valid[j]:
                continue
            r = A[0] @ V[:, j] - lam[j] * (Bm[0] @ V[:, j])
            assert np.abs(r).max() < 1e-2, (j, np.abs(r).max())
        assert float(np.asarray(res.rcond_b)[0]) > 1e-4


@pytest.mark.slow
class TestShiftedPencil:
    def _singular_pencil(self, B, n, n_inf, seed, finite_lams=None):
        """Regular pencil with n−n_inf known finite eigenvalues and
        n_inf infinite ones, scrambled by an equivalence transform
        (eigenvalues invariant under A→PAQ, B→PBQ)."""
        rng = np.random.RandomState(seed)
        nf = n - n_inf
        if finite_lams is None:
            finite_lams = np.linspace(-3.0, 7.0, nf)
        D_A = np.diag(np.concatenate([finite_lams, np.ones(n_inf)]))
        D_B = np.diag(np.concatenate([np.ones(nf), np.zeros(n_inf)]))
        A = np.zeros((B, n, n))
        Bm = np.zeros((B, n, n))
        for b in range(B):
            P = rng.randn(n, n) * 0.4 + np.eye(n)
            Q = rng.randn(n, n) * 0.4 + np.eye(n)
            A[b] = P @ D_A @ Q
            Bm[b] = P @ D_B @ Q
        return (A.astype(np.float32), Bm.astype(np.float32),
                np.sort(finite_lams))

    def test_singular_b_finite_and_infinite(self):
        from linalg_solver_tpu.ops.geig import (
            eig_generalized_shifted_batched,
        )

        A, Bm, want = self._singular_pencil(2, 12, 3, seed=30)
        res = eig_generalized_shifted_batched(jnp.asarray(A),
                                              jnp.asarray(Bm))
        assert bool(np.asarray(res.ok).all())
        fin = np.asarray(res.finite)
        np.testing.assert_array_equal(fin.sum(axis=1), [9, 9])
        for b in range(2):
            lam = np.asarray(res.real)[b][fin[b]]
            assert np.abs(np.asarray(res.imag)[b][fin[b]]).max() < 1e-3
            np.testing.assert_allclose(np.sort(lam), want, atol=3e-3)
            # the infinite slots really are inf
            assert np.isinf(np.asarray(res.real)[b][~fin[b]]).all()

    def test_matches_scipy_qz_finite_set(self):
        from scipy.linalg import eig as seig
        from linalg_solver_tpu.ops.geig import (
            eig_generalized_shifted_batched,
        )

        A, Bm, _ = self._singular_pencil(1, 10, 2, seed=31)
        res = eig_generalized_shifted_batched(jnp.asarray(A),
                                              jnp.asarray(Bm))
        w = seig(A[0].astype(np.float64), Bm[0].astype(np.float64),
                 right=False)
        # scipy's QZ reports the infinite eigenvalues as huge-but-
        # finite (β at f64 roundoff) — drop them by magnitude.
        w = w[np.isfinite(w) & (np.abs(w) < 1e3)]
        fin = np.asarray(res.finite)[0]
        got = np.asarray(res.real)[0][fin]
        want = np.sort(w.real)
        np.testing.assert_allclose(np.sort(got), want, atol=3e-3)

    def test_pencil_residual_and_vectors(self):
        from linalg_solver_tpu.ops.geig import (
            eig_generalized_shifted_batched,
        )

        A, Bm, _ = self._singular_pencil(2, 12, 3, seed=32)
        res = eig_generalized_shifted_batched(jnp.asarray(A),
                                              jnp.asarray(Bm))
        fin = np.asarray(res.finite)
        Vr = np.asarray(res.vectors_real, np.float64)
        Vi = np.asarray(res.vectors_imag, np.float64)
        scale = max(np.abs(A).max(), 1.0)
        for b in range(2):
            for j in np.where(fin[b])[0]:
                v = Vr[b][:, j] + 1j * Vi[b][:, j]
                lam = (np.asarray(res.real)[b, j]
                       + 1j * np.asarray(res.imag)[b, j])
                r = np.linalg.norm(
                    A[b].astype(np.float64) @ v
                    - lam * (Bm[b].astype(np.float64) @ v)
                ) / max(np.linalg.norm(v), 1e-30)
                assert r < 1e-3 * scale, (b, j, r)

    def test_agrees_with_lu_path_on_invertible_b(self):
        from linalg_solver_tpu.ops.geig import (
            eig_generalized_batched,
            eig_generalized_shifted_batched,
        )

        rng = np.random.RandomState(33)
        n = 8
        A = rng.randn(2, n, n).astype(np.float32)
        Bm = (rng.randn(2, n, n)
              + 4.0 * np.sqrt(n) * np.eye(n)).astype(np.float32)
        r1 = eig_generalized_batched(jnp.asarray(A), jnp.asarray(Bm))
        r2 = eig_generalized_shifted_batched(jnp.asarray(A),
                                             jnp.asarray(Bm))
        assert bool(np.asarray(r2.ok).all())
        assert bool(np.asarray(r2.finite).all())
        for b in range(2):
            l1 = np.sort_complex(np.asarray(r1.real)[b]
                                 + 1j * np.abs(np.asarray(r1.imag)[b]))
            l2 = np.sort_complex(np.asarray(r2.real)[b]
                                 + 1j * np.abs(np.asarray(r2.imag)[b]))
            # nearest-neighbor spectrum match (CLAUDE.md rule)
            l1 = list(l1)
            for g in l2:
                j = int(np.argmin(np.abs(np.asarray(l1) - g)))
                assert abs(l1[j] - g) < 5e-3 * max(abs(g), 1.0)
                l1.pop(j)

    def test_complex_pairs_preserved(self):
        from linalg_solver_tpu.ops.geig import (
            eig_generalized_shifted_batched,
        )

        rng = np.random.RandomState(34)
        n = 8
        # A has a rotation block => complex pencil eigenvalues; B
        # singular in the tail block.
        D_A = np.eye(n)
        D_A[0:2, 0:2] = [[3.0, -2.0], [2.0, 3.0]]
        D_B = np.eye(n)
        D_B[n - 1, n - 1] = 0.0
        P = rng.randn(n, n) * 0.3 + np.eye(n)
        Q = rng.randn(n, n) * 0.3 + np.eye(n)
        A = (P @ D_A @ Q)[None].astype(np.float32)
        Bm = (P @ D_B @ Q)[None].astype(np.float32)
        res = eig_generalized_shifted_batched(jnp.asarray(A),
                                              jnp.asarray(Bm))
        fin = np.asarray(res.finite)[0]
        lam = (np.asarray(res.real)[0][fin]
               + 1j * np.asarray(res.imag)[0][fin])
        cplx = lam[np.abs(lam.imag) > 1e-3]
        assert len(cplx) == 2
        np.testing.assert_allclose(
            np.sort_complex(cplx), [3.0 - 2.0j, 3.0 + 2.0j], atol=5e-3
        )
