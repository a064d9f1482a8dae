"""Matrix-free Krylov–Schur (Arnoldi) eigensolver vs numpy oracles."""

import numpy as np

import jax
import jax.numpy as jnp

import pytest

pytestmark = pytest.mark.slow

from linalg_solver_tpu.ops.arnoldi import (
    eigs_arnoldi_batched,
    eigs_arnoldi_matvec,
)


def sym_with_top(B, n, seed, gaps=(8.0, 6.0, 4.0, 2.0)):
    rng = np.random.RandomState(seed)
    lams = np.sort(rng.rand(B, n) * 10, axis=1)[:, ::-1].copy()
    lams[:, : len(gaps)] += np.asarray(gaps)
    Q, _ = np.linalg.qr(rng.randn(B, n, n))
    A = np.einsum("bij,bj,bkj->bik", Q, lams, Q).astype(np.float32)
    return A, lams


def rotation_spectrum(B, n, seed):
    """Dominant 2×2 rotation blocks (complex pairs, radii 12 and 9)
    over a decaying real tail, scrambled by a similarity."""
    rng = np.random.RandomState(seed)
    blocks = np.zeros((B, n, n))
    for b in range(B):
        th1, th2 = 0.4 + 0.1 * b, 1.1
        c1, s1 = np.cos(th1), np.sin(th1)
        c2, s2 = np.cos(th2), np.sin(th2)
        blocks[b, 0:2, 0:2] = 12 * np.array([[c1, -s1], [s1, c1]])
        blocks[b, 2:4, 2:4] = 9 * np.array([[c2, -s2], [s2, c2]])
        blocks[b, 4:, 4:] = np.diag(rng.rand(n - 4) * 5)
    P = rng.randn(B, n, n) * 0.5 + np.eye(n)
    return np.einsum(
        "bij,bjk,bkl->bil", P, blocks, np.linalg.inv(P)
    ).astype(np.float32)


def true_resid(A, res):
    """f64 ‖Av − λv‖ per returned column (complex arithmetic)."""
    lam = np.asarray(res.real, np.float64) + 1j * np.asarray(
        res.imag, np.float64
    )
    V = np.asarray(res.vectors_real, np.float64) + 1j * np.asarray(
        res.vectors_imag, np.float64
    )
    Av = np.einsum("bij,bjk->bik", A.astype(np.float64), V)
    return np.linalg.norm(Av - lam[:, None, :] * V, axis=1)


class TestArnoldiSymmetric:
    def test_top_k_lm(self):
        A, lams = sym_with_top(2, 96, seed=0)
        res = eigs_arnoldi_batched(jnp.asarray(A), 4, which="LM",
                                   max_restarts=40)
        assert bool(np.asarray(res.converged).all())
        np.testing.assert_allclose(
            np.asarray(res.real), lams[:, :4],
            rtol=0, atol=2e-4 * lams.max(),
        )
        assert np.abs(np.asarray(res.imag)).max() == 0.0
        r = true_resid(A, res)
        assert r.max() < 5e-4 * lams.max()

    def test_sr_selects_smallest(self):
        A, lams = sym_with_top(1, 80, seed=3)
        res = eigs_arnoldi_batched(jnp.asarray(A), 3, which="SR",
                                   m=40, max_restarts=80)
        got = np.sort(np.asarray(res.real)[0])
        want = np.sort(lams[0])[:3]
        # interior-adjacent smallest converge slower; require the
        # converged ones to be right and the best to be found.
        conv = np.asarray(res.converged)[0]
        assert conv.any()
        np.testing.assert_allclose(got[conv.argsort()][:conv.sum()].min(),
                                   want.min(), atol=2e-3 * lams.max())


class TestArnoldiGeneral:
    def test_complex_pairs_lm(self):
        A = rotation_spectrum(2, 80, seed=1)
        res = eigs_arnoldi_batched(jnp.asarray(A), 4, which="LM",
                                   max_restarts=60)
        assert bool(np.asarray(res.converged).all())
        lam = np.asarray(res.real) + 1j * np.asarray(res.imag)
        np.testing.assert_allclose(np.abs(lam[:, :2]), 12.0, atol=1e-3)
        np.testing.assert_allclose(np.abs(lam[:, 2:]), 9.0, atol=1e-3)
        # pairs listed together, +imag first
        np.testing.assert_allclose(lam[:, 0], lam[:, 1].conj(),
                                   atol=1e-4)
        assert (np.asarray(res.imag)[:, 0] > 0).all()
        # match the f64 oracle's top-4 as sets
        for b in range(2):
            w = np.linalg.eigvals(A[b].astype(np.float64))
            w = w[np.argsort(-np.abs(w))][:4]
            for lv in lam[b]:
                assert np.abs(w - lv).min() < 1e-3 * np.abs(w).max()
        assert true_resid(A, res).max() < 1e-3 * 12

    def test_lr_ordering(self):
        A = rotation_spectrum(1, 64, seed=2)
        res = eigs_arnoldi_batched(jnp.asarray(A), 2, which="LR",
                                   max_restarts=60)
        w = np.linalg.eigvals(A[0].astype(np.float64))
        want = np.sort(w.real)[::-1][:2]
        got = np.sort(np.asarray(res.real)[0])[::-1]
        conv = np.asarray(res.converged)[0]
        assert conv.all()
        np.testing.assert_allclose(got, want, atol=2e-3 * 12)

    def test_matvec_path_matches_dense(self):
        A = rotation_spectrum(2, 72, seed=4)
        aj = jnp.asarray(A)

        def mv(v):
            return jnp.einsum("bij,bj->bi", aj, v)

        v0 = jax.random.normal(jax.random.PRNGKey(0), (2, 72))
        r1 = eigs_arnoldi_batched(aj, 4, max_restarts=60, v0=v0)
        r2 = eigs_arnoldi_matvec(mv, v0, 4, max_restarts=60)
        np.testing.assert_allclose(np.asarray(r1.real),
                                   np.asarray(r2.real), atol=1e-4)
        np.testing.assert_allclose(np.asarray(r1.imag),
                                   np.asarray(r2.imag), atol=1e-4)

    def test_honest_nonconvergence(self):
        """One restart on a tightly clustered spectrum: flags must
        admit failure (resid honestly above tol)."""
        rng = np.random.RandomState(5)
        n = 128
        lams = 10.0 - 1e-4 * np.arange(n)  # pathologically clustered
        Q, _ = np.linalg.qr(rng.randn(1, n, n))
        A = np.einsum("bij,bj,bkj->bik", Q, lams[None], Q).astype(
            np.float32
        )
        res = eigs_arnoldi_batched(jnp.asarray(A), 4, m=8,
                                   max_restarts=1, tol=1e-6)
        assert not bool(np.asarray(res.converged).all())

    def test_batch_lanes_independent(self):
        """Different matrices per lane converge to their own spectra."""
        A1, l1 = sym_with_top(1, 64, seed=6)
        A2 = rotation_spectrum(1, 64, seed=7)
        A = np.concatenate([A1, A2], axis=0)
        res = eigs_arnoldi_batched(jnp.asarray(A), 2, which="LM",
                                   max_restarts=60)
        assert bool(np.asarray(res.converged).all())
        np.testing.assert_allclose(np.asarray(res.real)[0], l1[0, :2],
                                   atol=1e-3 * l1.max())
        lam2 = np.abs(np.asarray(res.real)[1]
                      + 1j * np.asarray(res.imag)[1])
        np.testing.assert_allclose(lam2, 12.0, atol=1e-3)


class TestShiftInvert:
    def test_interior_eigenvalues(self):
        from linalg_solver_tpu.ops.arnoldi import (
            eigs_arnoldi_shifted_batched,
        )

        rng = np.random.RandomState(8)
        B, n, k = 2, 100, 4
        lams = np.sort(rng.rand(B, n) * 20 - 10, axis=1)
        Q, _ = np.linalg.qr(rng.randn(B, n, n))
        A = np.einsum("bij,bj,bkj->bik", Q, lams, Q).astype(np.float32)
        sigma = 1.234
        res = eigs_arnoldi_shifted_batched(jnp.asarray(A), k, sigma,
                                           max_restarts=40)
        assert bool(np.asarray(res.converged).all())
        got = np.sort(np.asarray(res.real), axis=1)
        for b in range(B):
            want = np.sort(
                lams[b][np.argsort(np.abs(lams[b] - sigma))][:k]
            )
            np.testing.assert_allclose(got[b], want, atol=1e-3)

    def test_shift_invert_beats_plain_sm(self):
        """Interior targets: plain which='SM' stalls where shift-invert
        converges fast — the documented reason the mode exists."""
        from linalg_solver_tpu.ops.arnoldi import (
            eigs_arnoldi_shifted_batched,
        )

        rng = np.random.RandomState(9)
        n = 120
        lams = np.linspace(0.1, 50.0, n)
        Q, _ = np.linalg.qr(rng.randn(1, n, n))
        A = np.einsum("bij,bj,bkj->bik", Q, lams[None], Q).astype(
            np.float32
        )
        res = eigs_arnoldi_shifted_batched(jnp.asarray(A), 3, 0.0,
                                           max_restarts=20)
        assert bool(np.asarray(res.converged).all())
        assert res.restarts <= 5
        np.testing.assert_allclose(
            np.sort(np.asarray(res.real)[0]), lams[:3], atol=1e-3
        )
