"""Complex dense ops (real 2n-embedding) vs numpy complex oracles."""

import numpy as np

import jax.numpy as jnp

import pytest

from linalg_solver_tpu.ops.complexlin import (
    det_complex_batched,
    inverse_complex_batched,
    solve_complex_batched,
)


def cbatch(B, n, seed=0, shift=0.0):
    rng = np.random.RandomState(seed)
    M = rng.randn(B, n, n) + 1j * rng.randn(B, n, n)
    M = M + shift * np.eye(n)
    return M.astype(np.complex64)


class TestComplexSolve:
    def test_solve_matches_numpy(self):
        B, n = 3, 16
        A = cbatch(B, n, seed=1, shift=4.0 * np.sqrt(16))
        rng = np.random.RandomState(2)
        b = (rng.randn(B, n) + 1j * rng.randn(B, n)).astype(
            np.complex64
        )
        xr, xi = solve_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag),
            jnp.asarray(b.real), jnp.asarray(b.imag),
        )
        x = np.asarray(xr) + 1j * np.asarray(xi)
        for i in range(B):
            want = np.linalg.solve(A[i].astype(np.complex128), b[i])
            np.testing.assert_allclose(x[i], want, atol=1e-4)

    def test_inverse_matches_numpy(self):
        B, n = 2, 12
        A = cbatch(B, n, seed=3, shift=10.0)
        ir, ii = inverse_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag)
        )
        inv = np.asarray(ir) + 1j * np.asarray(ii)
        for i in range(B):
            np.testing.assert_allclose(
                A[i] @ inv[i], np.eye(n), atol=1e-3
            )

    def test_det_matches_numpy(self):
        B, n = 3, 8
        A = cbatch(B, n, seed=4, shift=3.0)
        dr, di = det_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag)
        )
        got = np.asarray(dr) + 1j * np.asarray(di)
        want = np.linalg.det(A.astype(np.complex128))
        np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_det_singular_and_phase(self):
        # purely imaginary diagonal: det = i^n · prod — phase matters
        n = 4
        d = np.array([1j, 2j, -1j, 3j], np.complex64)
        A = np.diag(d)[None]
        dr, di = det_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag)
        )
        got = complex(np.asarray(dr)[0], np.asarray(di)[0])
        want = complex(np.prod(d.astype(np.complex128)))
        assert abs(got - want) < 1e-4 * abs(want)
        # singular lane
        A2 = np.zeros((1, 3, 3), np.complex64)
        dr2, di2 = det_complex_batched(
            jnp.asarray(A2.real), jnp.asarray(A2.imag)
        )
        assert np.asarray(dr2)[0] == 0.0 and np.asarray(di2)[0] == 0.0


@pytest.mark.slow
class TestComplexEigh:
    def _hermitian(self, B, n, seed):
        rng = np.random.RandomState(seed)
        G = rng.randn(B, n, n) + 1j * rng.randn(B, n, n)
        return (G + G.conj().transpose(0, 2, 1)) / 2

    def test_matches_numpy(self):
        from linalg_solver_tpu.ops.complexlin import (
            eigh_complex_batched,
        )

        H = self._hermitian(2, 16, seed=50)
        r = eigh_complex_batched(
            jnp.asarray(H.real.astype(np.float32)),
            jnp.asarray(H.imag.astype(np.float32)),
        )
        assert bool(np.asarray(r.ok).all())
        for b in range(2):
            want = np.linalg.eigvalsh(H[b])
            np.testing.assert_allclose(
                np.asarray(r.w[b], np.float64), want, atol=1e-4
            )
            V = (np.asarray(r.v_re[b], np.float64)
                 + 1j * np.asarray(r.v_im[b], np.float64))
            res = np.abs(
                H[b] @ V - V * np.asarray(r.w[b], np.float64)[None, :]
            ).max()
            assert res < 1e-4
            assert np.abs(V.conj().T @ V - np.eye(16)).max() < 1e-4

    def test_degenerate_repair(self):
        """Repeated eigenvalues: the doubled-pair selection can pick
        J-partners (complex-dependent); the host MGS repair must
        restore unitary eigenvectors, not just flag."""
        from linalg_solver_tpu.ops.complexlin import (
            eigh_complex_batched,
        )

        rng = np.random.RandomState(51)
        n = 16
        Q, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
        lam = np.concatenate([np.full(8, 2.0), np.linspace(3, 5, 8)])
        H = (Q * lam) @ Q.conj().T
        r = eigh_complex_batched(
            jnp.asarray(H.real.astype(np.float32))[None],
            jnp.asarray(H.imag.astype(np.float32))[None],
        )
        assert bool(np.asarray(r.ok).all())
        V = (np.asarray(r.v_re[0], np.float64)
             + 1j * np.asarray(r.v_im[0], np.float64))
        assert np.abs(V.conj().T @ V - np.eye(n)).max() < 1e-4
        res = np.abs(
            H @ V - V * np.asarray(r.w[0], np.float64)[None, :]
        ).max()
        assert res < 1e-4


class TestComplexEig:
    def test_matches_numpy_spectrum_and_residual(self):
        from linalg_solver_tpu.ops.complexlin import (
            eig_complex_batched,
        )

        rng = np.random.RandomState(52)
        B, n = 2, 16
        A = (rng.randn(B, n, n)
             + 1j * rng.randn(B, n, n)) / np.sqrt(n)
        g = eig_complex_batched(
            jnp.asarray(A.real.astype(np.float32)),
            jnp.asarray(A.imag.astype(np.float32)),
        )
        assert bool(np.asarray(g.ok).all())
        for b in range(B):
            lam = (np.asarray(g.real[b], np.float64)
                   + 1j * np.asarray(g.imag[b], np.float64))
            want = list(np.linalg.eigvals(A[b]))
            for l in lam:  # nearest-neighbor spectrum match
                j = int(np.argmin(np.abs(np.array(want) - l)))
                assert abs(want[j] - l) < 1e-4, (l, want[j])
                want.pop(j)
            V = (np.asarray(g.v_re[b], np.float64)
                 + 1j * np.asarray(g.v_im[b], np.float64))
            res = np.abs(A[b] @ V - V * lam[None, :]).max()
            assert res < 1e-4

    def test_real_input_reduces_to_real_path(self):
        """Zero imaginary part: the spectrum equals the real
        eigensolver's."""
        from linalg_solver_tpu.ops.complexlin import (
            eig_complex_batched,
        )
        from linalg_solver_tpu.ops.schur import eigvals_schur

        rng = np.random.RandomState(53)
        n = 12
        A = rng.randn(1, n, n).astype(np.float32)
        g = eig_complex_batched(jnp.asarray(A),
                                jnp.asarray(np.zeros_like(A)))
        assert bool(np.asarray(g.ok).all())
        r = eigvals_schur(jnp.asarray(A))
        got = np.sort_complex(np.asarray(g.real[0])
                              + 1j * np.asarray(g.imag[0]))
        want = list(np.asarray(r.real[0]) + 1j * np.asarray(r.imag[0]))
        for l in got:
            j = int(np.argmin(np.abs(np.array(want) - l)))
            assert abs(want[j] - l) < 1e-3
            want.pop(j)


@pytest.mark.slow
class TestLinalgNamespaceComplex:
    def test_eig_eigh_complex_inputs(self):
        from linalg_solver_tpu import linalg as tla

        rng = np.random.RandomState(54)
        n = 10
        A = ((rng.randn(2, n, n) + 1j * rng.randn(2, n, n))
             / np.sqrt(n)).astype(np.complex64)
        w, v = tla.eig(A)
        for b in range(2):
            res = np.abs(
                A[b].astype(np.complex128)
                @ np.asarray(v[b], np.complex128)
                - np.asarray(v[b], np.complex128)
                * np.asarray(w[b], np.complex128)[None, :]
            ).max()
            assert res < 1e-4
        H = (A + A.conj().transpose(0, 2, 1)) / 2
        wh, vh = tla.eigh(H)
        np.testing.assert_allclose(
            np.asarray(wh[0], np.float64),
            np.linalg.eigvalsh(H[0].astype(np.complex128)),
            atol=1e-4,
        )
        assert tla.eigvalsh(H).shape == (2, n)


@pytest.mark.slow
class TestComplexFactorizations:
    """Complex SVD / QR / Cholesky / pinv / lstsq / slogdet through
    the real-embedding kernels (reference has no complex float paths;
    numpy.linalg complex semantics are the oracle)."""

    def _c(self, *shape, seed=60, scale=1.0):
        rng = np.random.RandomState(seed)
        return ((rng.randn(*shape) + 1j * rng.randn(*shape))
                * scale).astype(np.complex64)

    def test_svd_shapes_and_values(self):
        from linalg_solver_tpu.ops.complexlin import svd_complex_batched

        for m, n in [(12, 12), (16, 8), (8, 16)]:
            A = self._c(2, m, n, seed=60 + m + n)
            r = svd_complex_batched(
                jnp.asarray(A.real), jnp.asarray(A.imag)
            )
            assert bool(np.asarray(r.ok).all())
            s = np.asarray(r.s, np.float64)
            want = np.linalg.svd(
                A.astype(np.complex128), compute_uv=False
            )
            np.testing.assert_allclose(s, want, atol=1e-4)
            U = (np.asarray(r.u_re, np.float64)
                 + 1j * np.asarray(r.u_im, np.float64))
            V = (np.asarray(r.v_re, np.float64)
                 + 1j * np.asarray(r.v_im, np.float64))
            k = min(m, n)
            for b in range(2):
                recon = (U[b] * s[b]) @ V[b].conj().T
                assert np.abs(recon - A[b]).max() < 1e-4
                assert np.abs(
                    U[b].conj().T @ U[b] - np.eye(k)
                ).max() < 1e-4
                assert np.abs(
                    V[b].conj().T @ V[b] - np.eye(k)
                ).max() < 1e-4

    def test_qr_chol(self):
        from linalg_solver_tpu.ops.complexlin import (
            chol_complex_batched,
            qr_complex_batched,
        )

        A = self._c(2, 20, 8, seed=61)
        r = qr_complex_batched(jnp.asarray(A.real), jnp.asarray(A.imag))
        assert bool(np.asarray(r.ok).all())
        Q = (np.asarray(r.q_re, np.float64)
             + 1j * np.asarray(r.q_im, np.float64))
        R = (np.asarray(r.r_re, np.float64)
             + 1j * np.asarray(r.r_im, np.float64))
        for b in range(2):
            assert np.abs(Q[b] @ R[b] - A[b]).max() < 1e-4
            assert np.abs(Q[b].conj().T @ Q[b] - np.eye(8)).max() < 1e-4
        assert np.abs(np.tril(R[0], -1)).max() == 0.0
        assert (np.diag(R[0]).real > 0).all()

        G = self._c(2, 12, 12, seed=62)
        H = G @ G.conj().transpose(0, 2, 1) + 12 * np.eye(12)
        c = chol_complex_batched(
            jnp.asarray(H.real.astype(np.float32)),
            jnp.asarray(H.imag.astype(np.float32)),
        )
        assert bool(np.asarray(c.ok).all())
        L = (np.asarray(c.l_re, np.float64)
             + 1j * np.asarray(c.l_im, np.float64))
        for b in range(2):
            rel = np.abs(L[b] @ L[b].conj().T - H[b]).max() \
                / np.abs(H[b]).max()
            assert rel < 1e-5
        assert np.abs(np.triu(L[0], 1)).max() == 0.0
        # non-PD lane flags
        Hbad = H.copy()
        Hbad[0] = -H[0]
        cb = chol_complex_batched(
            jnp.asarray(Hbad.real.astype(np.float32)),
            jnp.asarray(Hbad.imag.astype(np.float32)),
        )
        assert not bool(np.asarray(cb.ok)[0])
        assert bool(np.asarray(cb.ok)[1])

    def test_pinv_lstsq_rank_deficient(self):
        from linalg_solver_tpu.ops.complexlin import (
            lstsq_complex_batched,
            pinv_complex_batched,
        )

        A = self._c(2, 12, 6, seed=63)
        A[:, :, 5] = A[:, :, 0]  # exact deficiency
        pr, pi, ok = pinv_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag)
        )
        assert bool(np.asarray(ok).all())
        P = (np.asarray(pr, np.float64)
             + 1j * np.asarray(pi, np.float64))
        want = np.linalg.pinv(A.astype(np.complex128))
        assert np.abs(P - want).max() < 1e-4
        b = self._c(2, 12, seed=64)
        xr, xi, ok2 = lstsq_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag),
            jnp.asarray(b.real), jnp.asarray(b.imag),
        )
        x = (np.asarray(xr, np.float64)
             + 1j * np.asarray(xi, np.float64))
        xw = np.stack([
            np.linalg.lstsq(
                A[i].astype(np.complex128), b[i], rcond=None
            )[0]
            for i in range(2)
        ])
        assert np.abs(x - xw).max() < 1e-4

    def test_slogdet(self):
        from linalg_solver_tpu.ops.complexlin import (
            slogdet_complex_batched,
        )

        A = self._c(3, 9, 9, seed=65)
        A[2] = 0.0
        sr, si, la = slogdet_complex_batched(
            jnp.asarray(A.real), jnp.asarray(A.imag)
        )
        sw, lw = np.linalg.slogdet(A[:2].astype(np.complex128))
        got_s = np.asarray(sr)[:2] + 1j * np.asarray(si)[:2]
        np.testing.assert_allclose(got_s, sw, atol=1e-4)
        np.testing.assert_allclose(np.asarray(la)[:2], lw, atol=1e-4)
        assert np.asarray(la)[2] == -np.inf
        assert np.asarray(sr)[2] == 0.0


@pytest.mark.slow
class TestLinalgNamespaceComplexFactorizations:
    def test_namespace_complex_routing(self):
        from linalg_solver_tpu import linalg as tla

        rng = np.random.RandomState(66)
        A = ((rng.randn(2, 8, 8) + 1j * rng.randn(2, 8, 8))
             ).astype(np.complex64)
        A128 = A.astype(np.complex128)
        x = tla.solve(A, A[:, :, 0])
        assert np.abs(
            np.asarray(x) - np.linalg.solve(A128, A128[:, :, 0:1])[..., 0]
        ).max() < 1e-4
        X = tla.solve(A, A[:, :, :3])
        assert np.abs(
            np.asarray(X) - np.linalg.solve(A128, A128[:, :, :3])
        ).max() < 1e-4
        assert np.abs(
            np.asarray(tla.inv(A)) - np.linalg.inv(A128)
        ).max() < 1e-4
        d = np.asarray(tla.det(A))
        dw = np.linalg.det(A128)
        assert np.abs(d - dw).max() / np.abs(dw).max() < 1e-4
        sg, la = tla.slogdet(A)
        sgw, law = np.linalg.slogdet(A128)
        assert np.abs(np.asarray(sg) - sgw).max() < 1e-4
        assert np.abs(np.asarray(la) - law).max() < 1e-4
        u, s, vh = tla.svd(A)
        for i in range(2):
            recon = (np.asarray(u, np.complex128)[i]
                     * np.asarray(s, np.float64)[i]) \
                @ np.asarray(vh, np.complex128)[i]
            assert np.abs(recon - A128[i]).max() < 1e-4
        assert np.abs(
            np.asarray(tla.pinv(A)) - np.linalg.pinv(A128)
        ).max() < 1e-4
        q, r = tla.qr(A)
        assert np.abs(
            np.asarray(q, np.complex128) @ np.asarray(r, np.complex128)
            - A128
        ).max() < 1e-4
        H = A @ A.conj().transpose(0, 2, 1) \
            + 8 * np.eye(8, dtype=np.complex64)
        L = np.asarray(tla.cholesky(H), np.complex128)
        assert np.abs(
            L @ L.conj().transpose(0, 2, 1) - H.astype(np.complex128)
        ).max() < 1e-3
        assert (np.asarray(tla.matrix_rank(A)) == 8).all()
        assert np.abs(
            np.asarray(tla.matrix_power(A, -2))
            - np.linalg.matrix_power(A128, -2)
        ).max() < 1e-3


@pytest.mark.slow
class TestComplexFunctionsAndEquations:
    """Complex matrix functions + Sylvester/Lyapunov through the
    embedding (reference has no complex float paths; scipy.linalg
    complex semantics are the oracle)."""

    def _c(self, *shape, seed):
        rng = np.random.RandomState(seed)
        return (rng.randn(*shape) + 1j * rng.randn(*shape)) \
            / np.sqrt(shape[-1])

    def test_expm_sqrtm_logm(self):
        import scipy.linalg as sla

        from linalg_solver_tpu.ops import complexlin as cx

        A = self._c(2, 10, 10, seed=70)
        Ar = jnp.asarray(A.real.astype(np.float32))
        Ai = jnp.asarray(A.imag.astype(np.float32))
        er, ei, ok = cx.expm_complex_batched(Ar, Ai)
        assert bool(np.asarray(ok).all())
        E = np.asarray(er, np.float64) + 1j * np.asarray(ei, np.float64)
        for b in range(2):
            assert np.abs(E[b] - sla.expm(A[b])).max() < 1e-4

        As = A + 3 * np.eye(10)
        Asr = jnp.asarray(As.real.astype(np.float32))
        Asi = jnp.asarray(As.imag.astype(np.float32))
        sr, si, ok = cx.sqrtm_complex_batched(Asr, Asi)
        assert bool(np.asarray(ok).all())
        S = np.asarray(sr, np.float64) + 1j * np.asarray(si, np.float64)
        for b in range(2):
            assert np.abs(S[b] @ S[b] - As[b]).max() < 1e-4
        lr, li, ok = cx.logm_complex_batched(Asr, Asi)
        assert bool(np.asarray(ok).all())
        L = np.asarray(lr, np.float64) + 1j * np.asarray(li, np.float64)
        for b in range(2):
            assert np.abs(L[b] - sla.logm(As[b])).max() < 1e-4

    def test_funm_hermitian(self):
        import scipy.linalg as sla

        from linalg_solver_tpu.ops import complexlin as cx

        A = self._c(2, 10, 10, seed=71)
        H = (A + A.conj().transpose(0, 2, 1)) / 2
        fr, fi, ok = cx.funm_hermitian_batched(
            jnp.asarray(H.real.astype(np.float32)),
            jnp.asarray(H.imag.astype(np.float32)),
            jnp.exp,
        )
        assert bool(np.asarray(ok).all())
        F = np.asarray(fr, np.float64) + 1j * np.asarray(fi, np.float64)
        for b in range(2):
            assert np.abs(F[b] - sla.expm(H[b])).max() < 1e-4

    def test_sylvester_lyapunov(self):
        import scipy.linalg as sla

        from linalg_solver_tpu.ops import complexlin as cx

        A = self._c(2, 10, 10, seed=72) + 2 * np.eye(10)
        Bm = self._c(2, 6, 6, seed=73) + 2 * np.eye(6)
        rng = np.random.RandomState(74)
        C = rng.randn(2, 10, 6) + 1j * rng.randn(2, 10, 6)
        xr, xi, ok = cx.sylvester_complex_batched(
            jnp.asarray(A.real.astype(np.float32)),
            jnp.asarray(A.imag.astype(np.float32)),
            jnp.asarray(Bm.real.astype(np.float32)),
            jnp.asarray(Bm.imag.astype(np.float32)),
            jnp.asarray(C.real.astype(np.float32)),
            jnp.asarray(C.imag.astype(np.float32)),
        )
        assert bool(np.asarray(ok).all())
        X = np.asarray(xr, np.float64) + 1j * np.asarray(xi, np.float64)
        for b in range(2):
            Xw = sla.solve_sylvester(A[b], Bm[b], C[b])
            assert np.abs(X[b] - Xw).max() < 1e-4

        # Hermitian Lyapunov: A X + X Aᴴ = Q, stable A
        Q = self._c(2, 10, 10, seed=75)
        Q = Q @ Q.conj().transpose(0, 2, 1)
        Astab = self._c(2, 10, 10, seed=76) - 3 * np.eye(10)
        xr, xi, ok = cx.lyapunov_complex_batched(
            jnp.asarray(Astab.real.astype(np.float32)),
            jnp.asarray(Astab.imag.astype(np.float32)),
            jnp.asarray(Q.real.astype(np.float32)),
            jnp.asarray(Q.imag.astype(np.float32)),
        )
        assert bool(np.asarray(ok).all())
        X = np.asarray(xr, np.float64) + 1j * np.asarray(xi, np.float64)
        for b in range(2):
            res = np.abs(
                Astab[b] @ X[b] + X[b] @ Astab[b].conj().T - Q[b]
            ).max()
            assert res < 1e-3
            assert np.abs(X[b] - X[b].conj().T).max() < 1e-4

    def test_embedded_singular_sylvester_flagged(self):
        """A=[i], B=[i]: complex-solvable but the embedding is
        singular — must flag ok=False, never return garbage
        silently."""
        from linalg_solver_tpu.ops import complexlin as cx

        one = jnp.ones((1, 1, 1))
        zero = jnp.zeros((1, 1, 1))
        _, _, ok = cx.sylvester_complex_batched(
            zero, one, zero, one, one, zero
        )
        assert not bool(np.asarray(ok)[0])


@pytest.mark.slow
class TestComplexGeneralizedEigAndRoots:
    def test_generalized_eig(self):
        import scipy.linalg as sla

        from linalg_solver_tpu.ops.complexlin import (
            eig_generalized_complex_batched,
        )

        rng = np.random.RandomState(80)
        B, n = 2, 12
        A = rng.randn(B, n, n) + 1j * rng.randn(B, n, n)
        Bm = rng.randn(B, n, n) + 1j * rng.randn(B, n, n) \
            + 4 * np.eye(n)
        g = eig_generalized_complex_batched(
            jnp.asarray(A.real.astype(np.float32)),
            jnp.asarray(A.imag.astype(np.float32)),
            jnp.asarray(Bm.real.astype(np.float32)),
            jnp.asarray(Bm.imag.astype(np.float32)),
        )
        assert bool(np.asarray(g.ok).all())
        assert bool(np.asarray(g.valid).all())
        V = (np.asarray(g.v_re, np.float64)
             + 1j * np.asarray(g.v_im, np.float64))
        lam = (np.asarray(g.real, np.float64)
               + 1j * np.asarray(g.imag, np.float64))
        for b in range(B):
            want = list(sla.eigvals(A[b], Bm[b]))
            for l in lam[b]:
                j = int(np.argmin(np.abs(np.array(want) - l)))
                assert abs(want[j] - l) < 1e-4
                want.pop(j)
            res = np.abs(
                A[b] @ V[b] - Bm[b] @ V[b] * lam[b][None, :]
            ).max()
            assert res < 1e-3

    def test_complex_roots(self):
        from linalg_solver_tpu.ops.complexlin import (
            roots_complex_batched,
        )

        rng = np.random.RandomState(81)
        c = (rng.randn(3, 7) + 1j * rng.randn(3, 7)).astype(
            np.complex64
        )
        r = roots_complex_batched(
            jnp.asarray(c.real), jnp.asarray(c.imag)
        )
        assert bool(np.asarray(r.ok).all())
        for b in range(3):
            got = (np.asarray(r.real, np.float64)[b]
                   + 1j * np.asarray(r.imag, np.float64)[b])
            want = list(np.roots(c[b].astype(np.complex128)))
            for l in got:
                j = int(np.argmin(np.abs(np.array(want) - l)))
                assert abs(want[j] - l) < 1e-4
                want.pop(j)

    def test_zero_leading_coefficient_flagged(self):
        from linalg_solver_tpu.ops.complexlin import (
            roots_complex_batched,
        )

        c = np.zeros((1, 4), np.complex64)
        c[0, 1:] = [1, 2, 3]
        r = roots_complex_batched(
            jnp.asarray(c.real), jnp.asarray(c.imag)
        )
        assert not bool(np.asarray(r.ok)[0])
