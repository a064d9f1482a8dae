"""Matrix functions vs scipy/numpy f64 oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.funm import (
    expm_batched,
    logm_batched,
    logm_spd_batched,
    powm_batched,
    powm_spd_batched,
    sqrtm_batched,
    sqrtm_spd_batched,
)


def spd(B, n, seed=0):
    rng = np.random.RandomState(seed)
    G = rng.randn(B, n, n).astype(np.float32)
    return np.einsum("bik,bjk->bij", G, G) + 0.5 * np.eye(
        n, dtype=np.float32
    )


class TestExpm:
    def test_matches_scipy(self):
        from scipy.linalg import expm

        rng = np.random.RandomState(1)
        A = rng.randn(4, 12, 12).astype(np.float32)
        E = np.asarray(expm_batched(jnp.asarray(A)))
        for i in range(4):
            want = expm(A[i].astype(np.float64))
            scale = np.abs(want).max()
            assert np.abs(E[i] - want).max() / scale < 1e-5

    def test_large_norm_scaling_path(self):
        """‖A‖ ≫ θ₁₃ exercises the per-lane squaring loop; mixed
        magnitudes in one batch exercise per-lane counts."""
        from scipy.linalg import expm

        rng = np.random.RandomState(2)
        A = np.stack([
            0.1 * rng.randn(8, 8),
            30.0 * rng.randn(8, 8) * 0.2,
        ]).astype(np.float32)
        E = np.asarray(expm_batched(jnp.asarray(A)))
        for i in range(2):
            want = expm(A[i].astype(np.float64))
            scale = np.abs(want).max()
            assert np.abs(E[i] - want).max() / scale < 1e-4, (
                i, np.abs(E[i] - want).max(), scale
            )

    def test_identities(self):
        Z = np.zeros((1, 5, 5), np.float32)
        np.testing.assert_allclose(
            np.asarray(expm_batched(jnp.asarray(Z)))[0],
            np.eye(5), atol=1e-6,
        )
        # expm(diag(d)) = diag(exp(d))
        d = np.array([0.5, -1.0, 2.0], np.float32)
        E = np.asarray(expm_batched(jnp.asarray(np.diag(d)[None])))[0]
        np.testing.assert_allclose(
            E, np.diag(np.exp(d)), atol=1e-5, rtol=1e-5
        )

    def test_group_property(self):
        """expm(A)·expm(−A) = I (A and −A commute)."""
        rng = np.random.RandomState(3)
        A = rng.randn(2, 10, 10).astype(np.float32)
        E = np.asarray(expm_batched(jnp.asarray(A)))
        Em = np.asarray(expm_batched(jnp.asarray(-A)))
        for i in range(2):
            np.testing.assert_allclose(
                E[i] @ Em[i], np.eye(10), atol=1e-3
            )


class TestSPDFunctions:
    def test_sqrtm(self):
        A = spd(3, 10, seed=4)
        S = np.asarray(sqrtm_spd_batched(jnp.asarray(A)))
        for i in range(3):
            np.testing.assert_allclose(
                S[i] @ S[i], A[i], atol=1e-3 * np.abs(A[i]).max()
            )
            np.testing.assert_allclose(S[i], S[i].T, atol=1e-5)

    def test_logm_inverts_expm_spd(self):
        A = spd(2, 8, seed=5)
        L = np.asarray(logm_spd_batched(jnp.asarray(A)))
        back = np.asarray(expm_batched(jnp.asarray(L)))
        for i in range(2):
            np.testing.assert_allclose(
                back[i], A[i], atol=1e-3 * np.abs(A[i]).max()
            )

    def test_powm_whitening(self):
        """A^{-1/2} A A^{-1/2} = I — the whitening identity."""
        A = spd(2, 12, seed=6)
        W = np.asarray(powm_spd_batched(jnp.asarray(A), -0.5))
        for i in range(2):
            np.testing.assert_allclose(
                W[i] @ A[i] @ W[i], np.eye(12), atol=2e-3
            )


def general_right_halfplane(B, n, seed=0):
    """Random non-normal batch with spectrum in the right half plane
    (shifted Gaussian — eigenvalues fill a disk of radius ~√n around
    the shift), the principal sqrtm/logm domain."""
    rng = np.random.RandomState(seed)
    G = rng.randn(B, n, n)
    return G + 3.0 * np.sqrt(n) * np.eye(n)


class TestGeneralSqrtm:
    def test_matches_scipy(self):
        from scipy.linalg import sqrtm

        A = general_right_halfplane(4, 12, seed=7)
        res = sqrtm_batched(jnp.asarray(A.astype(np.float32)))
        assert bool(np.asarray(res.converged).all())
        Y = np.asarray(res.Y, np.float64)
        for i in range(4):
            want = sqrtm(A[i])
            scale = np.abs(want).max()
            assert np.abs(Y[i] - want).max() / scale < 1e-4

    def test_square_and_inverse_coupling(self):
        A = general_right_halfplane(3, 16, seed=8)
        res = sqrtm_batched(jnp.asarray(A.astype(np.float32)))
        Y = np.asarray(res.Y, np.float64)
        Z = np.asarray(res.Yinv, np.float64)
        for i in range(3):
            scale = np.abs(A[i]).max()
            assert np.abs(Y[i] @ Y[i] - A[i]).max() / scale < 1e-4
            # Z is the inverse square root
            np.testing.assert_allclose(
                Y[i] @ Z[i], np.eye(16), atol=1e-3
            )

    def test_nonnormal_and_complex_spectrum(self):
        """Upper-triangular (defective-ish) and rotation-scaled inputs:
        eigenvalues off the positive real axis but away from R⁻."""
        from scipy.linalg import sqrtm

        J = np.array([[[4.0, 10.0], [0.0, 4.1]]])
        th = 2.0  # e^{±2i} — well off the real axis, not on R⁻
        R = 3.0 * np.array(
            [[[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]]
        )
        for A in (J, R):
            res = sqrtm_batched(jnp.asarray(A.astype(np.float32)))
            assert bool(np.asarray(res.converged).all())
            Y = np.asarray(res.Y, np.float64)[0]
            want = np.real_if_close(sqrtm(A[0]))
            np.testing.assert_allclose(Y, want, atol=1e-4 * np.abs(want).max())

    def test_spd_agrees_with_spectral_path(self):
        A = spd(2, 10, seed=9)
        Y = np.asarray(sqrtm_batched(jnp.asarray(A)).Y)
        S = np.asarray(sqrtm_spd_batched(jnp.asarray(A)))
        np.testing.assert_allclose(Y, S, atol=2e-3 * np.abs(S).max())


class TestGeneralLogm:
    def test_matches_scipy(self):
        from scipy.linalg import logm

        A = general_right_halfplane(4, 10, seed=10)
        res = logm_batched(jnp.asarray(A.astype(np.float32)))
        assert bool(np.asarray(res.converged).all())
        L = np.asarray(res.L, np.float64)
        for i in range(4):
            want = logm(A[i])
            assert np.abs(L[i] - want).max() < 1e-4 * max(
                np.abs(want).max(), 1.0
            )

    def test_expm_inverts_logm(self):
        A = general_right_halfplane(3, 12, seed=11)
        res = logm_batched(jnp.asarray(A.astype(np.float32)))
        back = np.asarray(
            expm_batched(res.L), np.float64
        )
        for i in range(3):
            scale = np.abs(A[i]).max()
            assert np.abs(back[i] - A[i]).max() / scale < 1e-4

    def test_mixed_magnitudes_per_lane_roots(self):
        """One near-identity lane (s=0 roots) and one large-norm lane
        (many roots) in the same batch exercise the per-lane inverse
        scaling counts."""
        from scipy.linalg import logm

        rng = np.random.RandomState(12)
        n = 8
        A = np.stack([
            np.eye(n) + 0.01 * rng.randn(n, n),
            1000.0 * np.eye(n) + 5.0 * rng.randn(n, n),
        ])
        res = logm_batched(jnp.asarray(A.astype(np.float32)))
        assert bool(np.asarray(res.converged).all())
        roots = np.asarray(res.roots)
        # 1000^(1/2^5) ≈ 1.24 is the first iterate inside θ = 0.25
        assert roots[0] == 0 and roots[1] == 5
        L = np.asarray(res.L, np.float64)
        for i in range(2):
            want = logm(A[i])
            assert np.abs(L[i] - want).max() < 2e-3 * max(
                np.abs(want).max(), 1.0
            )

    def test_spd_agrees_with_spectral_path(self):
        A = spd(2, 10, seed=13)
        L = np.asarray(logm_batched(jnp.asarray(A)).L)
        S = np.asarray(logm_spd_batched(jnp.asarray(A)))
        np.testing.assert_allclose(L, S, atol=2e-3 * np.abs(S).max())


class TestGeneralPowm:
    def test_half_power_is_sqrtm(self):
        A = general_right_halfplane(2, 10, seed=14)
        P, ok = powm_batched(jnp.asarray(A.astype(np.float32)), 0.5)
        assert bool(np.asarray(ok).all())
        Y = np.asarray(sqrtm_batched(jnp.asarray(A.astype(np.float32))).Y)
        np.testing.assert_allclose(
            np.asarray(P), Y, atol=1e-3 * np.abs(Y).max()
        )

    def test_inverse_power(self):
        A = general_right_halfplane(2, 8, seed=15)
        P, ok = powm_batched(jnp.asarray(A.astype(np.float32)), -1.0)
        assert bool(np.asarray(ok).all())
        P = np.asarray(P, np.float64)
        for i in range(2):
            np.testing.assert_allclose(
                P[i] @ A[i], np.eye(8), atol=2e-3
            )


class TestExpmMultiply:
    def _batch(self, seed=16):
        rng = np.random.RandomState(seed)
        A = rng.randn(3, 24, 24).astype(np.float32)
        A[1] *= 6.0   # large-norm lane: many segments
        A[2] *= 0.05  # small-norm lane: one segment
        v = rng.randn(3, 24).astype(np.float32)
        return A, v

    def test_matches_scipy_expm_action(self):
        from scipy.linalg import expm
        from linalg_solver_tpu.ops.funm import expm_multiply_batched

        A, v = self._batch()
        for t in (1.0, -0.7):
            res = expm_multiply_batched(jnp.asarray(A), jnp.asarray(v),
                                        t=t)
            assert bool(np.asarray(res.ok).all())
            for b in range(3):
                want = expm(t * A[b].astype(np.float64)) @ v[b]
                got = np.asarray(res.x[b], np.float64)
                rel = (np.linalg.norm(got - want)
                       / np.linalg.norm(want))
                assert rel < 5e-5, (t, b, rel)

    def test_per_lane_segment_counts(self):
        from linalg_solver_tpu.ops.funm import expm_multiply_batched

        A, v = self._batch()
        res = expm_multiply_batched(jnp.asarray(A), jnp.asarray(v))
        seg = np.asarray(res.segments)
        assert seg[1] > seg[0] > seg[2]  # scale with the lane's norm

    def test_matvec_path_matches_dense(self):
        from linalg_solver_tpu.ops.funm import (
            expm_multiply_batched,
            expm_multiply_matvec,
        )

        A, v = self._batch(seed=17)
        aj = jnp.asarray(A)

        def mv(w):
            return jnp.einsum("bij,bj->bi", aj, w)

        nb = jnp.max(jnp.sum(jnp.abs(aj), axis=1), axis=1)
        r1 = expm_multiply_batched(aj, jnp.asarray(v))
        r2 = expm_multiply_matvec(mv, jnp.asarray(v), nb)
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                                   atol=1e-5)

    def test_segment_cap_flagged(self):
        from linalg_solver_tpu.ops.funm import expm_multiply_batched

        A, v = self._batch()
        res = expm_multiply_batched(jnp.asarray(A), jnp.asarray(v),
                                    max_segments=2)
        assert not bool(np.asarray(res.ok).all())
        assert np.isfinite(np.asarray(res.x)).all()


class TestTrig:
    """cosm/sinm/tanm + hyperbolic family vs scipy f64."""

    def _batch(self, B=4, n=12, seed=3, scale=1.0):
        rng = np.random.RandomState(seed)
        return (scale * rng.randn(B, n, n) / np.sqrt(n)).astype(
            np.float32
        )

    def test_cosm_sinm_match_scipy(self):
        from scipy.linalg import cosm, sinm

        from linalg_solver_tpu.ops.funm import cosm_sinm_batched

        A = self._batch()
        c, s = cosm_sinm_batched(jnp.asarray(A))
        for b in range(A.shape[0]):
            np.testing.assert_allclose(
                np.asarray(c[b]), cosm(A[b].astype(np.float64)),
                atol=5e-6,
            )
            np.testing.assert_allclose(
                np.asarray(s[b]), sinm(A[b].astype(np.float64)),
                atol=5e-6,
            )

    def test_pythagorean_identity(self):
        from linalg_solver_tpu.ops.funm import cosm_sinm_batched

        A = self._batch(seed=11, scale=2.0)
        c, s = cosm_sinm_batched(jnp.asarray(A))
        c, s = np.asarray(c, np.float64), np.asarray(s, np.float64)
        eye = np.eye(A.shape[-1])
        for b in range(A.shape[0]):
            np.testing.assert_allclose(
                c[b] @ c[b] + s[b] @ s[b], eye, atol=5e-5
            )

    def test_tanm(self):
        from scipy.linalg import tanm

        from linalg_solver_tpu.ops.funm import tanm_batched

        A = self._batch(seed=5, scale=0.7)
        t = tanm_batched(jnp.asarray(A))
        for b in range(A.shape[0]):
            np.testing.assert_allclose(
                np.asarray(t[b]), tanm(A[b].astype(np.float64)),
                atol=1e-5,
            )

    def test_hyperbolic(self):
        from scipy.linalg import coshm, sinhm, tanhm

        from linalg_solver_tpu.ops.funm import (
            coshm_sinhm_batched,
            tanhm_batched,
        )

        A = self._batch(seed=7)
        c, s = coshm_sinhm_batched(jnp.asarray(A))
        t = tanhm_batched(jnp.asarray(A))
        for b in range(A.shape[0]):
            A64 = A[b].astype(np.float64)
            np.testing.assert_allclose(
                np.asarray(c[b]), coshm(A64), atol=5e-6
            )
            np.testing.assert_allclose(
                np.asarray(s[b]), sinhm(A64), atol=5e-6
            )
            np.testing.assert_allclose(
                np.asarray(t[b]), tanhm(A64), atol=1e-5
            )

    def test_hyperbolic_identity(self):
        from linalg_solver_tpu.ops.funm import coshm_sinhm_batched

        A = self._batch(seed=13, scale=1.5)
        c, s = coshm_sinhm_batched(jnp.asarray(A))
        c, s = np.asarray(c, np.float64), np.asarray(s, np.float64)
        eye = np.eye(A.shape[-1])
        for b in range(A.shape[0]):
            np.testing.assert_allclose(
                c[b] @ c[b] - s[b] @ s[b], eye, atol=5e-5
            )


class TestFunmGeneral:
    """funm_batched (eigenbasis method) vs the specialised routines
    and scipy.funm."""

    def _batch(self, B=4, n=10, seed=2):
        # Separated spectra: gaussian + distinct diagonal shifts keep
        # kappa(V) modest so the eigenbasis method is in-domain.
        rng = np.random.RandomState(seed)
        A = rng.randn(B, n, n).astype(np.float32) / np.sqrt(n)
        A += np.diag(np.linspace(1.0, 4.0, n)).astype(np.float32)
        return A

    def test_exp_matches_expm(self):
        from linalg_solver_tpu.ops.funm import expm_batched, funm_batched

        A = self._batch()
        r = funm_batched(jnp.asarray(A), jnp.exp)
        assert bool(np.asarray(r.ok).all()), np.asarray(r.resid)
        want = np.asarray(expm_batched(jnp.asarray(A)), np.float64)
        np.testing.assert_allclose(
            np.asarray(r.F, np.float64), want, atol=2e-4
        )
        assert float(np.asarray(r.imag_max).max()) < 1e-4

    def test_matches_scipy_funm(self):
        from scipy.linalg import funm

        from linalg_solver_tpu.ops.funm import funm_batched

        A = self._batch(seed=9)
        f = lambda z: z * jnp.exp(-z) + jnp.cos(z)
        fn = lambda z: z * np.exp(-z) + np.cos(z)
        r = funm_batched(jnp.asarray(A), f)
        assert bool(np.asarray(r.ok).all())
        for b in range(A.shape[0]):
            want = funm(A[b].astype(np.float64), fn)
            np.testing.assert_allclose(
                np.asarray(r.F[b], np.float64), want.real, atol=5e-4
            )

    def test_complex_pair_spectrum(self):
        # Rotation-heavy matrix: complex conjugate eigenvalues exercise
        # the complex arithmetic path; result must still be real.
        from scipy.linalg import funm

        from linalg_solver_tpu.ops.funm import funm_batched

        rng = np.random.RandomState(21)
        B, n = 3, 8
        A = (rng.randn(B, n, n) - rng.randn(B, n, n).transpose(0, 2, 1)
             + 3.0 * np.eye(n)).astype(np.float32)
        r = funm_batched(jnp.asarray(A), lambda z: 1.0 / z)
        assert bool(np.asarray(r.ok).all())
        for b in range(A.shape[0]):
            want = np.linalg.inv(A[b].astype(np.float64))
            np.testing.assert_allclose(
                np.asarray(r.F[b], np.float64), want, atol=5e-5
            )
        assert float(np.asarray(r.imag_max).max()) < 1e-4


class TestFunmComplex:
    def test_general_complex_funm(self):
        from scipy.linalg import funm

        from linalg_solver_tpu.ops.complexlin import funm_complex_batched

        rng = np.random.RandomState(4)
        B, n = 3, 8
        Ar = (rng.randn(B, n, n) / np.sqrt(n)
              + np.diag(np.linspace(1, 3, n))).astype(np.float32)
        Ai = (rng.randn(B, n, n) / np.sqrt(n)).astype(np.float32)
        fr, fi, resid, ok = funm_complex_batched(
            jnp.asarray(Ar), jnp.asarray(Ai), jnp.exp
        )
        assert bool(np.asarray(ok).all()), np.asarray(resid)
        for b in range(B):
            want = funm(
                Ar[b].astype(np.float64) + 1j * Ai[b].astype(np.float64),
                np.exp,
            )
            got = (np.asarray(fr[b], np.float64)
                   + 1j * np.asarray(fi[b], np.float64))
            assert np.abs(got - want).max() < 5e-4


class TestExpmFrechet:
    def test_matches_scipy_expm_frechet(self):
        from scipy.linalg import expm_frechet

        from linalg_solver_tpu.ops.funm import expm_frechet_batched

        rng = np.random.RandomState(7)
        B, n = 4, 12
        A = (rng.randn(B, n, n) / np.sqrt(n)).astype(np.float32)
        E = rng.randn(B, n, n).astype(np.float32)
        r = expm_frechet_batched(jnp.asarray(A), jnp.asarray(E))
        for b in range(B):
            eA, L = expm_frechet(
                A[b].astype(np.float64), E[b].astype(np.float64)
            )
            scale = max(np.abs(L).max(), 1.0)
            np.testing.assert_allclose(
                np.asarray(r.expm[b], np.float64), eA, atol=2e-5
            )
            assert (
                np.abs(np.asarray(r.L[b], np.float64) - L).max() / scale
                < 2e-5
            )

    def test_linearity_and_scale_invariance(self):
        # L(A, cE) = c L(A, E), including very large/small c — the
        # internal E-normalization must make the answer c-independent.
        from linalg_solver_tpu.ops.funm import expm_frechet_batched

        rng = np.random.RandomState(11)
        B, n = 2, 8
        A = (rng.randn(B, n, n) / np.sqrt(n)).astype(np.float32)
        E = rng.randn(B, n, n).astype(np.float32)
        base = np.asarray(
            expm_frechet_batched(jnp.asarray(A), jnp.asarray(E)).L,
            np.float64,
        )
        for c in (1e6, 1e-6, -3.0):
            got = np.asarray(
                expm_frechet_batched(jnp.asarray(A), jnp.asarray(c * E)).L,
                np.float64,
            )
            np.testing.assert_allclose(
                got, c * base, rtol=2e-5, atol=2e-5 * abs(c)
            )

    def test_zero_direction(self):
        from linalg_solver_tpu.ops.funm import expm_frechet_batched

        rng = np.random.RandomState(3)
        A = rng.randn(2, 6, 6).astype(np.float32)
        E = np.zeros_like(A)
        r = expm_frechet_batched(jnp.asarray(A), jnp.asarray(E))
        assert float(np.abs(np.asarray(r.L)).max()) == 0.0

    def test_commuting_direction_identity(self):
        # E = A commutes with A: L(A, A) = A expm(A) exactly.
        from linalg_solver_tpu.ops.funm import expm_frechet_batched

        rng = np.random.RandomState(5)
        B, n = 3, 10
        A = (rng.randn(B, n, n) / np.sqrt(n)).astype(np.float32)
        r = expm_frechet_batched(jnp.asarray(A), jnp.asarray(A))
        for b in range(B):
            A64 = A[b].astype(np.float64)
            import scipy.linalg

            want = A64 @ scipy.linalg.expm(A64)
            np.testing.assert_allclose(
                np.asarray(r.L[b], np.float64), want, atol=5e-5
            )


class TestExpmCond:
    def test_matches_scipy_expm_cond(self):
        from scipy.linalg import expm_cond

        from linalg_solver_tpu.ops.funm import expm_cond_batched

        rng = np.random.RandomState(13)
        B, n = 4, 10
        A = (rng.randn(B, n, n) / np.sqrt(n)).astype(np.float32)
        # One deliberately worse-conditioned lane (large non-normality).
        A[1] += 4.0 * np.triu(np.ones((n, n), np.float32), 1) / n
        kappa, _ = expm_cond_batched(jnp.asarray(A), iters=12)
        kappa = np.asarray(kappa, np.float64)
        for b in range(B):
            want = expm_cond(A[b].astype(np.float64))
            # Power iteration estimates from below; condition numbers
            # are order-of-magnitude quantities.
            assert kappa[b] <= want * 1.05, (b, kappa[b], want)
            assert kappa[b] >= 0.5 * want, (b, kappa[b], want)

    def test_normal_matrix_floor(self):
        # For normal A, kappa_exp >= ~1 (equality for A = 0); a
        # symmetric matrix must report a small, >= 1-ish value.
        from linalg_solver_tpu.ops.funm import expm_cond_batched

        rng = np.random.RandomState(17)
        n = 8
        G = rng.randn(2, n, n).astype(np.float32)
        A = (G + G.transpose(0, 2, 1)) / 2
        kappa, _ = expm_cond_batched(jnp.asarray(A), iters=10)
        kappa = np.asarray(kappa)
        assert (kappa > 0.8).all() and (kappa < 50).all()
