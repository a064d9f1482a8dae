"""Extended-precision (Ozaki slice-GEMM float-float) tests.

f64-class results from pure f32/bf16 arithmetic — the TPU-native
replacement for "just use f64" (no reference counterpart; the
reference's float path IS host f64).  All accuracy checks are
computed in float64 on the host.
"""

import jax.numpy as jnp
import numpy as np

from linalg_solver_tpu.ops.dd import (
    dd_add_f32,
    matmul_dd_batched,
    solve_dd_batched,
    two_sum,
)


class TestDDPrimitives:
    def test_two_sum_exact(self):
        a = jnp.asarray(np.float32(1.0))
        b = jnp.asarray(np.float32(1e-9))
        s, e = two_sum(a, b)
        assert float(s) + float(e) == 1.0 + float(np.float32(1e-9))
        assert float(e) != 0.0  # the bit that f32 addition loses

    def test_dd_accumulation_beats_f32(self):
        # sum 10_000 copies of 0.1: f32 drifts, dd stays exact-ish
        t = jnp.asarray(np.float32(0.1))
        hi = jnp.zeros(())
        lo = jnp.zeros(())
        f32sum = np.float32(0.0)
        for _ in range(1000):
            hi, lo = dd_add_f32(hi, lo, t)
            f32sum += np.float32(0.1)
        dd = float(np.float64(np.asarray(hi)) + np.float64(np.asarray(lo)))
        want = 1000 * np.float64(np.float32(0.1))
        assert abs(dd - want) < 1e-10
        assert abs(float(f32sum) - want) > 1e-6  # plain f32 drifted


class TestDDMatmul:
    def test_f64_class_accuracy(self):
        rng = np.random.RandomState(1)
        A = rng.randn(2, 32, 256).astype(np.float32)
        B = rng.randn(2, 256, 32).astype(np.float32)
        r = matmul_dd_batched(jnp.asarray(A), jnp.asarray(B))
        got = np.asarray(r.hi, np.float64) + np.asarray(r.lo, np.float64)
        want = A.astype(np.float64) @ B.astype(np.float64)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1e-12, rel

    def test_chunked_contraction(self):
        rng = np.random.RandomState(2)
        A = rng.randn(1, 16, 700).astype(np.float32)
        B = rng.randn(1, 700, 16).astype(np.float32)
        r = matmul_dd_batched(jnp.asarray(A), jnp.asarray(B))
        got = np.asarray(r.hi, np.float64) + np.asarray(r.lo, np.float64)
        want = A.astype(np.float64) @ B.astype(np.float64)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12

    def test_t3_is_f32_class(self):
        rng = np.random.RandomState(3)
        A = rng.randn(1, 16, 64).astype(np.float32)
        B = rng.randn(1, 64, 16).astype(np.float32)
        r = matmul_dd_batched(jnp.asarray(A), jnp.asarray(B), t=3)
        got = np.asarray(r.hi, np.float64) + np.asarray(r.lo, np.float64)
        want = A.astype(np.float64) @ B.astype(np.float64)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1e-6  # 24 bits below row max

    def test_scale_extremes(self):
        # scaling is per row/column power-of-two: huge and tiny scales
        # must round-trip exactly
        rng = np.random.RandomState(4)
        A = (rng.randn(1, 8, 32) * 1e18).astype(np.float32)
        B = (rng.randn(1, 32, 8) * 1e-18).astype(np.float32)
        r = matmul_dd_batched(jnp.asarray(A), jnp.asarray(B))
        got = np.asarray(r.hi, np.float64) + np.asarray(r.lo, np.float64)
        want = A.astype(np.float64) @ B.astype(np.float64)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-12


class TestDDSolve:
    def _system(self, B, n, kappa, seed):
        rng = np.random.RandomState(seed)
        U, _ = np.linalg.qr(rng.randn(B, n, n))
        V, _ = np.linalg.qr(rng.randn(B, n, n))
        s = np.logspace(0, -np.log10(kappa), n)
        A = (U * s[None, None, :]) @ V.transpose(0, 2, 1)
        x = rng.randn(B, n)
        b = np.einsum("bij,bj->bi", A, x)
        return A.astype(np.float32), b.astype(np.float32)

    def test_f64_class_residual(self):
        A, b = self._system(4, 64, kappa=10.0, seed=5)
        s = solve_dd_batched(jnp.asarray(A), jnp.asarray(b))
        assert bool(np.asarray(s.ok).all())
        x = np.asarray(s.x_hi, np.float64) + np.asarray(s.x_lo, np.float64)
        res = np.abs(
            np.einsum("bij,bj->bi", A.astype(np.float64), x)
            - b.astype(np.float64)
        ).max() / np.abs(b).max()
        assert res < 1e-12, res

    def test_kappa_1e5_still_converges(self):
        A, b = self._system(2, 64, kappa=1e5, seed=6)
        s = solve_dd_batched(jnp.asarray(A), jnp.asarray(b))
        assert bool(np.asarray(s.ok).all())
        x = np.asarray(s.x_hi, np.float64) + np.asarray(s.x_lo, np.float64)
        res = np.abs(
            np.einsum("bij,bj->bi", A.astype(np.float64), x)
            - b.astype(np.float64)
        ).max() / np.abs(b).max()
        assert res < 1e-11, res

    def test_singular_lane_flagged(self):
        A, b = self._system(2, 32, kappa=10.0, seed=7)
        A[1] = 0.0
        s = solve_dd_batched(jnp.asarray(A), jnp.asarray(b))
        ok = np.asarray(s.ok)
        assert bool(ok[0]) and not bool(ok[1])


class TestDDEigh:
    """dd Rayleigh-quotient refinement: symmetric eigenvalues far
    below the f32 eigensolver floor, with an always-valid dd residual
    bound |w - lambda| <= resid."""

    def _spd(self, lam, seed):
        rng = np.random.RandomState(seed)
        B, n = lam.shape
        Q, _ = np.linalg.qr(rng.randn(B, n, n))
        return ((Q * lam[:, None, :]) @ Q.transpose(0, 2, 1)).astype(
            np.float32
        )

    def test_separated_spectrum_f64_class(self):
        from linalg_solver_tpu.ops.dd import eigh_dd_batched
        from linalg_solver_tpu.ops.symmetric import eigh_batched

        lam = np.linspace(1, 2, 64)[None, :] * np.ones((2, 1))
        A = self._spd(lam, seed=9)
        r = eigh_dd_batched(jnp.asarray(A))
        w = np.asarray(r.w, np.float64) + np.asarray(r.w_lo, np.float64)
        want = np.stack([
            np.linalg.eigvalsh(A[b].astype(np.float64)) for b in range(2)
        ])
        dd_err = np.abs(w - want).max()
        f32_err = np.abs(
            np.asarray(eigh_batched(jnp.asarray(A)).w, np.float64) - want
        ).max()
        assert dd_err < 1e-10, dd_err
        assert dd_err < f32_err / 100  # orders below the f32 floor

    def test_residual_bound_always_valid(self):
        from linalg_solver_tpu.ops.dd import eigh_dd_batched

        rng = np.random.RandomState(10)
        lam = np.sort(rng.randn(2, 48), axis=1)  # arbitrary gaps
        A = self._spd(lam, seed=10)
        r = eigh_dd_batched(jnp.asarray(A))
        w = np.asarray(r.w, np.float64) + np.asarray(r.w_lo, np.float64)
        want = np.stack([
            np.linalg.eigvalsh(A[b].astype(np.float64)) for b in range(2)
        ])
        # symmetric a-posteriori bound needs no gap assumption
        assert bool((
            np.abs(w - want)
            <= np.asarray(r.resid, np.float64) * 1.1 + 1e-12
        ).all())


class TestDDLstsq:
    """Corrected semi-normal equations with dd residuals: the
    least-squares residual is NOT small at the optimum, so r_lo must
    flow through its own A^T product (collapsing r to f32 stalls the
    iteration at ~1e-7 — regression-tested by the kappa=10 bound)."""

    def _system(self, B, m, n, kappa, seed):
        rng = np.random.RandomState(seed)
        U, _ = np.linalg.qr(rng.randn(B, m, n))
        V, _ = np.linalg.qr(rng.randn(B, n, n))
        s = np.logspace(0, -np.log10(kappa), n)
        A = ((U * s[None, None, :]) @ V.transpose(0, 2, 1)).astype(
            np.float32
        )
        b = rng.randn(B, m).astype(np.float32)
        return A, b

    def test_f64_class_minimizer(self):
        from linalg_solver_tpu.ops.dd import lstsq_dd_batched

        A, b = self._system(2, 96, 48, kappa=10.0, seed=2)
        r = lstsq_dd_batched(jnp.asarray(A), jnp.asarray(b))
        assert bool(np.asarray(r.ok).all())
        x = np.asarray(r.x_hi, np.float64) + np.asarray(r.x_lo, np.float64)
        want = np.stack([
            np.linalg.lstsq(
                A[i].astype(np.float64), b[i].astype(np.float64),
                rcond=None,
            )[0]
            for i in range(2)
        ])
        assert np.abs(x - want).max() < 1e-11

    def test_kappa_1e3(self):
        from linalg_solver_tpu.ops.dd import lstsq_dd_batched
        from linalg_solver_tpu.ops.lstsq import lstsq_batched

        A, b = self._system(2, 96, 48, kappa=1e3, seed=3)
        r = lstsq_dd_batched(jnp.asarray(A), jnp.asarray(b))
        assert bool(np.asarray(r.ok).all())
        x = np.asarray(r.x_hi, np.float64) + np.asarray(r.x_lo, np.float64)
        want = np.stack([
            np.linalg.lstsq(
                A[i].astype(np.float64), b[i].astype(np.float64),
                rcond=None,
            )[0]
            for i in range(2)
        ])
        dd_err = np.abs(x - want).max()
        f32_err = np.abs(
            np.asarray(lstsq_batched(jnp.asarray(A), jnp.asarray(b)).x,
                       np.float64) - want
        ).max()
        assert dd_err < 1e-7
        assert dd_err < f32_err / 1e3


class TestDDInverse:
    def test_newton_refined_inverse(self):
        from linalg_solver_tpu.ops.dd import inverse_dd_batched
        from linalg_solver_tpu.ops.dispatch import inverse_batched

        rng = np.random.RandomState(4)
        B, n = 2, 64
        U, _ = np.linalg.qr(rng.randn(B, n, n))
        V, _ = np.linalg.qr(rng.randn(B, n, n))
        s = np.logspace(0, -4, n)
        A = ((U * s[None, None, :]) @ V.transpose(0, 2, 1)).astype(
            np.float32
        )
        r = inverse_dd_batched(jnp.asarray(A))
        assert bool(np.asarray(r.ok).all())
        X = np.asarray(r.x_hi, np.float64) + np.asarray(r.x_lo, np.float64)
        res = max(
            np.abs(A[b].astype(np.float64) @ X[b] - np.eye(n)).max()
            for b in range(B)
        )
        Xp = np.asarray(inverse_batched(jnp.asarray(A)), np.float64)
        resp = max(
            np.abs(A[b].astype(np.float64) @ Xp[b] - np.eye(n)).max()
            for b in range(B)
        )
        assert res < 1e-9, res        # kappa=1e4
        assert res < resp / 100

    def test_singular_flagged(self):
        from linalg_solver_tpu.ops.dd import inverse_dd_batched

        A = np.zeros((1, 32, 32), np.float32)
        r = inverse_dd_batched(jnp.asarray(A))
        assert not bool(np.asarray(r.ok)[0])


class TestEigDD:
    """General (non-symmetric) dd eigenvalue refinement: two-sided
    Rayleigh quotients in error-free arithmetic on the f32 Schur
    output (VERDICT r2 item 7)."""

    @staticmethod
    def _nearest_dev(lam, oracle):
        """Max nearest-neighbor deviation (np.sort_complex orders by
        real part and scrambles roundoff-close spectra — match each
        computed eigenvalue to its closest oracle instead)."""
        dev = 0.0
        for z in lam:
            dev = max(dev, np.min(np.abs(oracle - z)))
        return dev

    def test_separated_spectrum_f64_class(self):
        from linalg_solver_tpu.ops.dd import eig_dd_batched

        rng = np.random.RandomState(11)
        B, n = 4, 24
        # separated real + complex spectra: distinct-diagonal dominant
        # part plus O(1) asymmetric noise (gaps ~4 >> perturbation)
        base = np.stack([
            np.diag(np.linspace(0, 4 * (n - 1), n))
            + rng.randn(n, n) for _ in range(B)
        ]).astype(np.float32)
        r = eig_dd_batched(jnp.asarray(base))
        assert bool(np.all(np.asarray(r.converged)))
        assert bool(np.all(np.asarray(r.valid)))
        for b in range(B):
            oracle = np.linalg.eigvals(base[b].astype(np.float64))
            lam_dd = (
                np.asarray(r.lam_re[b], np.float64)
                + np.asarray(r.lam_re_lo[b], np.float64)
                + 1j * (np.asarray(r.lam_im[b], np.float64)
                        + np.asarray(r.lam_im_lo[b], np.float64))
            )
            anorm = np.linalg.norm(base[b].astype(np.float64), 2)
            dev = self._nearest_dev(lam_dd, oracle)
            assert dev <= 1e-10 * anorm, (b, dev, anorm)
            # and the refinement genuinely beat the f32 Schur spectrum
            lam_f32 = (np.asarray(r.lam_re[b], np.float64)
                       + 1j * np.asarray(r.lam_im[b], np.float64))
            # (hi part alone is the f32-representable refined value —
            # compare the claimed bound instead)
            eb = np.asarray(r.err_bound[b], np.float64)
            true_err = np.array(
                [np.min(np.abs(oracle - z)) for z in lam_dd]
            )
            assert np.all(true_err <= np.maximum(eb, 1e-12) * 20), (
                b, float(np.max(true_err / np.maximum(eb, 1e-30)))
            )

    def test_defective_flags_honest(self):
        """A Jordan block defeats quadratic refinement — the result
        must SAY so (s collapses, err_bound >= the actual error) rather
        than report false digits."""
        from linalg_solver_tpu.ops.dd import eig_dd_batched

        n = 8
        J = np.eye(n, dtype=np.float32) * 2.0
        for i in range(n - 1):
            J[i, i + 1] = 1.0
        rng = np.random.RandomState(3)
        P = np.eye(n) + 0.1 * rng.randn(n, n)
        A = (P @ J @ np.linalg.inv(P)).astype(np.float32)
        r = eig_dd_batched(jnp.asarray(A[None]))
        oracle = np.linalg.eigvals(A.astype(np.float64))
        lam_dd = (
            np.asarray(r.lam_re[0], np.float64)
            + np.asarray(r.lam_re_lo[0], np.float64)
            + 1j * (np.asarray(r.lam_im[0], np.float64)
                    + np.asarray(r.lam_im_lo[0], np.float64))
        )
        true_err = np.array(
            [np.min(np.abs(oracle - z)) for z in lam_dd]
        )
        eb = np.asarray(r.err_bound[0], np.float64)
        s = np.asarray(r.s[0], np.float64)
        # the Jordan chain must be visible: tiny s somewhere and the
        # bound covering the actual error (no silent false precision)
        assert float(np.min(s)) < 1e-2
        assert np.all(true_err <= np.maximum(eb, 1e-10) * 20), (
            float(np.max(true_err / np.maximum(eb, 1e-30)))
        )

    def test_complex_pairs_refined(self):
        from linalg_solver_tpu.ops.dd import eig_dd_batched

        rng = np.random.RandomState(5)
        n = 16
        # well-separated complex pairs: block-diagonal rotations with
        # distinct radii + small noise, conjugated by a random basis
        blocks = []
        for k in range(n // 2):
            rad, ang = 2.0 + 3.0 * k, 0.4 + 0.2 * k
            c, sn = rad * np.cos(ang), rad * np.sin(ang)
            blocks.append(np.array([[c, sn], [-sn, c]]))
        D = np.zeros((n, n))
        for k, blk in enumerate(blocks):
            D[2 * k:2 * k + 2, 2 * k:2 * k + 2] = blk
        P = np.eye(n) + 0.2 * rng.randn(n, n)
        A = (P @ D @ np.linalg.inv(P)).astype(np.float32)
        r = eig_dd_batched(jnp.asarray(A[None]))
        oracle = np.linalg.eigvals(A.astype(np.float64))
        lam_dd = (
            np.asarray(r.lam_re[0], np.float64)
            + np.asarray(r.lam_re_lo[0], np.float64)
            + 1j * (np.asarray(r.lam_im[0], np.float64)
                    + np.asarray(r.lam_im_lo[0], np.float64))
        )
        anorm = np.linalg.norm(A.astype(np.float64), 2)
        dev = self._nearest_dev(lam_dd, oracle)
        assert dev <= 1e-9 * anorm, (dev, anorm)
