"""Randomized property sweep over the extended solver family.

Mirrors tests/test_dispatch_fuzz.py for the ops added on top of the
core solvers: random shapes/spectra, invariant assertions (residuals,
orthogonality, flags) rather than fixed oracles — the reference's
seeded-property-test methodology (SURVEY §4) applied to the new
surface.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp


def make_rng(name: str, trial: int) -> np.random.RandomState:
    """Per-test seeded RNG: failures reproduce in isolation (a shared
    module-level stream would make drawn shapes depend on execution
    order)."""
    return np.random.RandomState(abs(hash((name, trial))) % 2**31)


def wellposed(rng, B, n, shift_mult=3.0):
    return (
        rng.randn(B, n, n) + shift_mult * np.sqrt(n) * np.eye(n)
    ).astype(np.float32)


class TestSolverFamilyFuzz:
    @pytest.mark.parametrize("trial", range(4))
    def test_lstsq_qr_consistency(self, trial):
        from linalg_solver_tpu.ops.lstsq import lstsq_batched, qr_batched

        rng = make_rng("lstsq", trial)
        B = int(rng.randint(1, 4))
        n = int(rng.randint(3, 12))
        m = n + int(rng.randint(1, 20))
        A = rng.randn(B, m, n).astype(np.float32)
        b = rng.randn(B, m).astype(np.float32)
        res = lstsq_batched(jnp.asarray(A), jnp.asarray(b))
        qr = qr_batched(jnp.asarray(A))
        assert bool(np.asarray(res.ok).all() and np.asarray(qr.ok).all())
        # normal equations: Aᵀ(Ax − b) = 0
        r = np.einsum("bij,bj->bi", A, np.asarray(res.x)) - b
        g = np.einsum("bji,bj->bi", A, r)
        assert np.abs(g).max() < 1e-2 * max(np.abs(b).max(), 1.0)
        # QR factorizes
        rec = np.asarray(qr.Q) @ np.asarray(qr.R)
        assert np.abs(rec - A).max() < 1e-3

    @pytest.mark.parametrize("trial", range(3))
    def test_svd_cond_pinv_consistency(self, trial):
        from linalg_solver_tpu.ops.cond import cond1_est_batched
        from linalg_solver_tpu.ops.svd import (
            cond2_batched, pinv_batched, svd_batched,
        )

        rng = make_rng("svd", trial)
        B = int(rng.randint(1, 4))
        n = int(rng.randint(4, 16))
        A = wellposed(rng, B, n)
        sv = svd_batched(jnp.asarray(A))
        s = np.asarray(sv.s)
        # κ₂ from the SVD vs the dedicated op
        k2 = np.asarray(cond2_batched(jnp.asarray(A)))
        np.testing.assert_allclose(k2, s[:, 0] / s[:, -1], rtol=1e-4)
        # norm-equivalence: κ₁ estimate within n·κ₂ of κ₂ and ≥ κ₂/n
        k1 = np.asarray(cond1_est_batched(jnp.asarray(A)))
        assert (k1 <= n * k2 * 1.1).all() and (k1 >= k2 / n * 0.9).all()
        # pinv of a square invertible matrix is the inverse
        P = np.asarray(pinv_batched(jnp.asarray(A)))
        eye = np.eye(n)
        for i in range(B):
            assert np.abs(A[i] @ P[i] - eye).max() < 1e-2

    @pytest.mark.parametrize("trial", range(3))
    def test_sylvester_expm_invariants(self, trial):
        from linalg_solver_tpu.ops.funm import expm_batched
        from linalg_solver_tpu.ops.sylvester import sylvester_batched

        rng = make_rng("sylv", trial)
        B = int(rng.randint(1, 3))
        n = int(rng.randint(3, 10))
        m = int(rng.randint(3, 10))
        A = wellposed(rng, B, n, shift_mult=2.0)
        Bm = wellposed(rng, B, m, shift_mult=2.0)
        C = rng.randn(B, n, m).astype(np.float32)
        res = sylvester_batched(
            jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(C)
        )
        assert bool(np.asarray(res.ok).all())
        X = np.asarray(res.X).astype(np.float64)
        R = (
            np.einsum("bij,bjk->bik", A.astype(np.float64), X)
            + np.einsum("bij,bjk->bik", X, Bm.astype(np.float64))
            - C
        )
        assert np.abs(R).max() < 1e-2 * max(np.abs(C).max(), 1.0)
        # det(expm(M)) = exp(tr(M)) on a small stable matrix
        M = (0.1 * rng.randn(B, n, n)).astype(np.float32)
        E = np.asarray(expm_batched(jnp.asarray(M))).astype(np.float64)
        for i in range(B):
            np.testing.assert_allclose(
                np.linalg.det(E[i]),
                np.exp(np.trace(M[i].astype(np.float64))),
                rtol=1e-3,
            )

    @pytest.mark.parametrize("trial", range(3))
    def test_spd_tridiag_geig_invariants(self, trial):
        from linalg_solver_tpu.ops.geig import eigh_generalized_batched
        from linalg_solver_tpu.ops.spd import (
            cholesky_solve_batched, logdet_spd_batched,
        )
        from linalg_solver_tpu.ops.tridiag import tridiag_solve_batched

        rng = make_rng("spd", trial)
        B = int(rng.randint(1, 4))
        n = int(rng.randint(3, 14))
        G = rng.randn(B, n, n).astype(np.float32)
        S = np.einsum("bik,bjk->bij", G, G) + np.eye(
            n, dtype=np.float32
        )
        b = rng.randn(B, n).astype(np.float32)
        x, ok = cholesky_solve_batched(jnp.asarray(S), jnp.asarray(b))
        assert bool(np.asarray(ok).all())
        r = np.einsum("bij,bj->bi", S, np.asarray(x)) - b
        assert np.abs(r).max() < 1e-2
        ld, ok2 = logdet_spd_batched(jnp.asarray(S))
        for i in range(B):
            want = np.linalg.slogdet(S[i].astype(np.float64))[1]
            assert abs(float(np.asarray(ld)[i]) - want) < 1e-2 * max(
                abs(want), 1.0
            )
        # generalized symmetric: VᵀSV = I and A V = S V Λ
        Asym = rng.randn(B, n, n).astype(np.float32)
        Asym = Asym + np.swapaxes(Asym, 1, 2)
        ge = eigh_generalized_batched(jnp.asarray(Asym), jnp.asarray(S))
        V = np.asarray(ge.V)
        w = np.asarray(ge.w)
        for i in range(B):
            bo = V[i].T @ S[i] @ V[i]
            assert np.abs(bo - np.eye(n)).max() < 1e-2
            R = Asym[i] @ V[i] - S[i] @ V[i] * w[i][None, :]
            assert np.abs(R).max() < 1e-1, np.abs(R).max()
        # tridiagonal residual
        dl = rng.randn(B, n).astype(np.float32)
        du = rng.randn(B, n).astype(np.float32)
        d = (np.abs(dl) + np.abs(du) + 1.0).astype(np.float32)
        tri = tridiag_solve_batched(
            jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
            jnp.asarray(b),
        )
        assert bool(np.asarray(tri.ok).all())
        xv = np.asarray(tri.x)
        for i in range(B):
            M = (
                np.diag(d[i].astype(np.float64))
                + np.diag(dl[i][1:].astype(np.float64), -1)
                + np.diag(du[i][:-1].astype(np.float64), 1)
            )
            assert np.abs(M @ xv[i] - b[i]).max() < 1e-3
