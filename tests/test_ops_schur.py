"""Francis double-shift real-Schur eigensolver: differential tests vs
numpy/LAPACK, structural invariants, and the scan-vs-stepwise regression
(the fori_loop lowering of the bulge chase miscompiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from linalg_solver_tpu.ops import schur


def gaussian(B, n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(B, n, n).astype(np.float32)


def prescribed(B, n, seed=0):
    """Well-separated prescribed real spectra (min gap ≫ the pipeline's
    1e-3 cluster tolerance) under a mild similarity."""
    rng = np.random.RandomState(seed)
    base = np.linspace(-5, 5, n, dtype=np.float32)
    lam = np.stack([
        rng.permutation(base) + rng.uniform(-0.1, 0.1, n).astype(
            np.float32
        )
        for _ in range(B)
    ])
    P = rng.randn(B, n, n).astype(np.float32) * 0.3 + np.eye(
        n, dtype=np.float32
    )
    A = np.einsum(
        "bij,bj,bjk->bik", P, lam,
        np.linalg.inv(P.astype(np.float64)).astype(np.float32),
    ).astype(np.float32)
    return A, lam


class TestHessenberg:
    def test_similar_and_banded(self):
        A = gaussian(3, 12, seed=1)
        H = np.asarray(schur.hessenberg(jnp.asarray(A)))
        assert np.abs(np.tril(H, -2)).max() < 1e-5
        for b in range(3):
            ev_a = np.sort_complex(
                np.linalg.eigvals(A[b].astype(np.float64))
            )
            ev_h = np.sort_complex(
                np.linalg.eigvals(H[b].astype(np.float64))
            )
            np.testing.assert_allclose(ev_a, ev_h, atol=1e-4)


class TestRealSchur:
    def test_quasi_triangular_and_similar(self):
        A = gaussian(4, 16, seed=2)
        res = schur.real_schur(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        T = np.asarray(res.T)
        # Strictly quasi-triangular: below-subdiagonal exactly zero and
        # no two consecutive nonzero subdiagonal entries.
        assert np.abs(np.tril(T, -2)).max() == 0.0
        for b in range(4):
            sub = np.abs(np.diagonal(T[b], -1)) > 0
            assert not np.any(sub[:-1] & sub[1:])

    @pytest.mark.parametrize("n", [2, 3, 8, 24])
    def test_eigvals_vs_numpy(self, n):
        A = gaussian(5, n, seed=n)
        res = schur.eigvals_schur(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        got = np.sort_complex(
            (np.asarray(res.real) + 1j * np.asarray(res.imag)).reshape(-1)
        )
        want = np.sort_complex(
            np.linalg.eigvals(A.astype(np.float64)).reshape(-1)
        )
        scale = np.abs(want).max()
        np.testing.assert_allclose(
            got, want, atol=5e-4 * max(scale, 1.0)
        )

    def test_prescribed_real_spectrum(self):
        A, lam = prescribed(4, 24, seed=3)
        res = schur.eigvals_schur(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        got = np.sort(np.asarray(res.real), axis=1)
        want = np.sort(
            np.linalg.eigvals(A.astype(np.float64)).real, axis=1
        )
        np.testing.assert_allclose(got, want, atol=5e-3)
        assert np.abs(np.asarray(res.imag)).max() < 1e-2

    def test_defective_matrix_converges(self):
        # Jordan block of size 4: eigenvalues split by ~eps^(1/4); the
        # solver must converge and land within that cluster radius.
        rng = np.random.RandomState(4)
        n = 8
        J = 2.0 * np.eye(n, dtype=np.float32)
        for i in range(3):
            J[i, i + 1] = 1.0
        P = rng.randn(n, n).astype(np.float32) * 0.2 + np.eye(
            n, dtype=np.float32
        )
        A = (P @ J @ np.linalg.inv(P.astype(np.float64)).astype(
            np.float32
        ))[None]
        res = schur.eigvals_schur(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        np.testing.assert_allclose(
            np.asarray(res.real)[0], np.full(n, 2.0), atol=0.1
        )

    def test_complex_pairs_conjugate(self):
        # rotation-like matrix: all eigenvalues on conjugate pairs
        rng = np.random.RandomState(5)
        S = rng.randn(1, 10, 10).astype(np.float32)
        A = S - np.transpose(S, (0, 2, 1))  # skew: pure imaginary spectrum
        res = schur.eigvals_schur(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        im = np.sort(np.asarray(res.imag)[0])
        np.testing.assert_allclose(im + im[::-1], 0.0, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(res.real)[0], 0.0, atol=1e-4
        )

    def test_chase_scan_matches_stepwise(self):
        """Regression: the bulge chase must be lowered via lax.scan —
        the fori_loop lowering produced O(1)-wrong loop-carried state on
        the TPU backend.  Stepwise single-step calls are the ground
        truth the loop must reproduce."""
        A = gaussian(2, 10, seed=6)
        H, _Q, hi, stag, anorm, _scale = schur._schur_init(
            jnp.asarray(A)
        )
        H2, hi2, st2, _, _ = jax.jit(schur._one_sweep)(
            H, hi, stag, anorm
        )

        # replicate the sweep stepwise
        Hs, his, sts, _ = jax.jit(schur._deflate)(H, hi, stag, anorm)
        start, end = jax.jit(schur._block_bounds)(Hs, his)
        s_arr, p_arr = jax.jit(schur._shifts_per_block)(
            Hs, end, his, sts
        )
        start = jax.jit(schur._bulge_starts)(
            Hs, start, end, s_arr, p_arr
        )
        npad = Hs.shape[1]
        B = Hs.shape[0]
        Qd = jnp.zeros((B, 1, 1), Hs.dtype)
        chain = (
            jnp.zeros((B, 1), Hs.dtype), jnp.zeros((B, 1), Hs.dtype),
            jnp.zeros((B, 1), Hs.dtype), jnp.zeros((B, 1), bool),
        )
        carry = (Hs, Qd, start, end, s_arr, p_arr, his, chain)
        step = jax.jit(schur._chase_step)
        for k in range(npad - 2):
            carry = step(k, carry)
        np.testing.assert_allclose(
            np.asarray(H2), np.asarray(carry[0]), atol=1e-6
        )


class TestFloat64:
    """The whole Schur/eig stack is dtype-generic: under x64 it runs in
    float64 end-to-end (the escape from the f32 conditioning ceiling on
    ill-conditioned spectra — STATUS round plan).  Eigenvalues reach
    ~1e-13 and eigendecomposition residuals ~1e-14."""

    def test_eig_f64_end_to_end(self):
        with jax.enable_x64(True):
            rng = np.random.default_rng(3)
            A = rng.standard_normal((2, 48, 48))
            r = schur.eigvals_schur(jnp.asarray(A))
            assert r.real.dtype == jnp.float64
            assert bool(np.asarray(r.converged).all())
            ev = np.asarray(r.real) + 1j * np.asarray(r.imag)
            worst = 0.0
            for b in range(2):
                want = np.linalg.eigvals(A[b])
                for g in ev[b]:
                    i = np.argmin(np.abs(want - g))
                    worst = max(worst, abs(want[i] - g))
                    want = np.delete(want, i)
            assert worst < 1e-11, worst

            r2 = schur.eig_batched(jnp.asarray(A))
            V = np.asarray(r2.vectors_real) + 1j * np.asarray(
                r2.vectors_imag
            )
            lam = np.asarray(r2.real) + 1j * np.asarray(r2.imag)
            res = np.abs(
                np.einsum("bij,bjk->bik", A, V)
                - lam[:, None, :] * V
            ).max()
            assert res < 1e-12, res
            assert bool(np.asarray(r2.valid).all())


@pytest.mark.slow
class TestMultishift:
    """Small-bulge multishift chain (dlaqr5 shape): shift-slot assembly
    and end-to-end correctness regressions for the two measured failure
    modes — straddling-pair slot corruption (fixed by dlaqr0's shift
    shuffle) and stale deepened starts (fixed by the monotone-start
    clamp)."""

    def test_window_slots_cover_spectrum(self):
        """Every ok slot's (s, p) quadratic must have roots that are
        window eigenvalues, and together the slots must cover the full
        trailing-window spectrum (no duplicates, no drops)."""
        for seed in range(4):
            A = gaussian(2, 48, seed=seed)
            H, _Q, hi, _stag, _an, _sc = schur._schur_init(
                jnp.asarray(A)
            )
            start_raw, _end = schur._block_bounds(H, hi)
            npairs = 3
            s, p, ok = schur._window_shift_pairs(
                H, hi, start_raw, npairs
            )
            s, p, ok = np.asarray(s), np.asarray(p), np.asarray(ok)
            w = 2 * npairs
            n = 48
            Hn = np.asarray(H)[:, :n, :n].astype(np.float64)
            for b in range(2):
                assert ok[b].all()
                ev = np.sort_complex(
                    np.linalg.eigvals(Hn[b, n - w:, n - w:])
                )
                roots = []
                for i in range(npairs):
                    roots.extend(np.roots([1, -s[b, i], p[b, i]]))
                np.testing.assert_allclose(
                    np.sort_complex(np.array(roots)), ev, atol=1e-3
                )

    def test_multishift_eigenvalues_match_numpy(self):
        """Full runs at several chain depths stay similar transforms:
        eigenvalues match numpy within the f32 floor (the stale-start
        bug corrupted them to O(0.1); the straddle bug stalled sweeps
        until the breaker degraded them 60x)."""
        B, n = 3, 48
        A = gaussian(B, n, seed=11)
        ref = [
            np.linalg.eigvals(A[b].astype(np.float64))
            for b in range(B)
        ]
        for npairs in (2, 4):
            r = schur.eigvals_schur(
                jnp.asarray(A), nshift_pairs=npairs
            )
            assert bool(np.asarray(r.converged).all())
            ev = np.asarray(r.real) + 1j * np.asarray(r.imag)
            for b in range(B):
                want = ref[b].copy()
                worst = 0.0
                for g in ev[b]:
                    i = np.argmin(np.abs(want - g))
                    worst = max(worst, abs(want[i] - g))
                    want = np.delete(want, i)
                assert worst < 5e-3, (npairs, b, worst)

    def test_multishift_converges_faster(self):
        """The point of the chain: materially fewer sweeps than the
        single double-shift at the same size."""
        A = gaussian(4, 64, seed=0)
        _res1, done1, _, _ = schur._run_schur(
            jnp.asarray(A), 0, 64, True, False, 1
        )
        _res4, done4, _, _ = schur._run_schur(
            jnp.asarray(A), 0, 64, True, False, 4
        )
        assert int(done4) < int(done1) * 0.8, (int(done1), int(done4))


@pytest.mark.slow
class TestAED:
    """Aggressive early deflation (dlaqr2/3 shape): similarity
    soundness, the strict-inner-deflation regression (a large inner
    Ahues–Tisseur zeroing re-expressed through Q corrupts global
    eigenvalues by its entry size — measured 2e-3), and the speed
    property (fewer rounds than sweeps-only)."""

    def test_aed_round_preserves_spectrum_and_deflates(self):
        B, n = 3, 96
        A = gaussian(B, n, seed=7)
        H, Q, hi, stag, anorm, _sc = schur._schur_init(jnp.asarray(A))
        ref = [
            np.linalg.eigvals(A[b].astype(np.float64)) for b in range(B)
        ]
        for _ in range(12):
            H, Q, hi, stag, slots, skip = schur._aed(
                H, Q, hi, stag, anorm, 16, 4, False
            )
            H, hi, stag, Q, _ = schur._one_sweep(
                H, hi, stag, anorm, None, npairs=4,
                shift_slots=slots, skip=skip,
            )
        assert int(np.asarray(hi).max()) < n - 1   # something deflated
        Hn = np.asarray(H)[:, :n, :n].astype(np.float64)
        for b in range(B):
            got = np.linalg.eigvals(Hn[b])
            want = ref[b].copy()
            worst = 0.0
            for g in got:
                i = np.argmin(np.abs(want - g))
                worst = max(worst, abs(want[i] - g))
                want = np.delete(want, i)
            assert worst < 5e-4, (b, worst)

    def test_deflate_keeps_large_entries_despite_tiny_products(self):
        """The Ahues–Tisseur product test must be NESTED inside the
        classical |h21| <= ulp*tst gate (dlahqr's structure).  As a
        standalone OR-trigger it zeroes any O(1) subdiagonal whose
        superdiagonal partner is ~0 — measured: the companion matrix of
        (x-1)(x-2)(x-3) returned eigenvalues {3±i√2, 0} with
        converged=True, and an AED window's 2.6e-2 inner AT deflation
        turned into a 2e-3 global eigenvalue error at write-back."""
        n = 8
        Hh = np.triu(np.ones((n, n), np.float32), -1) * 2.0
        for j in range(n):
            Hh[j, j] = 3.0 + j
        Hh[4, 3] = 1e-2
        Hh[3, 4] = 1e-12   # |sub·sup| tiny, but |sub| is NOT small
        H = jnp.asarray(np.pad(Hh[None], ((0, 0), (0, 1), (0, 1))))
        hi = jnp.asarray([n - 1], jnp.int32)
        stag = jnp.zeros((1,), jnp.int32)
        anorm = jnp.max(jnp.sum(jnp.abs(H), axis=2), axis=1)
        Hd, _, _, _ = schur._deflate(H, hi, stag, anorm)
        Hs, _, _, _ = schur._deflate(H, hi, stag, anorm, strict=True)
        assert np.asarray(Hd)[0, 4, 3] == np.float32(1e-2)
        assert np.asarray(Hs)[0, 4, 3] == np.float32(1e-2)
        # The stall breaker is the remaining default-vs-strict split:
        # a stalled lane force-zeroes entries the strict mode keeps.
        stag50 = jnp.full((1,), 50, jnp.int32)  # escal = 2^6
        Hh2 = Hh.copy()
        Hh2[4, 3] = 1e-4
        H2 = jnp.asarray(np.pad(Hh2[None], ((0, 0), (0, 1), (0, 1))))
        Hd2, _, _, forced = schur._deflate(H2, hi, stag50, anorm)
        Hs2, _, _, _ = schur._deflate(H2, hi, stag50, anorm, strict=True)
        assert np.asarray(Hd2)[0, 4, 3] == 0.0
        assert np.asarray(Hs2)[0, 4, 3] == np.float32(1e-4)
        assert bool(np.asarray(forced)[0])  # well above 8·eps·‖A‖

    def test_companion_matrix_eigenvalues(self):
        """Regression for the AT-gating bug: companion matrices (zero
        superdiagonal next to O(1) subdiagonals) must produce the
        polynomial's roots."""
        A = np.array(
            [[[6.0, -11.0, 6.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]],
            np.float32,
        )  # companion of (x-1)(x-2)(x-3)
        r = schur.eigvals_schur(jnp.asarray(A))
        assert bool(np.asarray(r.converged)[0])
        got = np.sort(np.asarray(r.real)[0])
        np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-4)
        assert np.abs(np.asarray(r.imag)).max() < 1e-4

    def test_clean_flag_reports_forced_deflations(self):
        """The escalating stall-breaker keeps lanes from hanging but
        degrades the eigenvalues it force-splits; ``clean`` must expose
        that.  (Since the dlahqr AT gating, natural stalls are rare —
        the forced flag is pinned at the _deflate unit level in
        test_deflate_keeps_large_entries_despite_tiny_products; here
        the end-to-end default path must report clean=True.)"""
        rng = np.random.default_rng(1)
        A = rng.standard_normal((4, 128, 128)).astype(np.float32)
        r2 = schur.eigvals_schur(jnp.asarray(A))
        assert bool(np.asarray(r2.converged).all())
        assert bool(np.asarray(r2.clean).all())

    def test_eigvals_aed_matches_numpy_and_converges_faster(self):
        B, n = 3, 128
        A = gaussian(B, n, seed=13)
        res_aed, done_aed, _, _ = schur._run_schur(
            jnp.asarray(A), 0, 64, True, False
        )
        res_off, done_off, _, _ = schur._run_schur(
            jnp.asarray(A), 0, 64, True, False, aed_w=0
        )
        assert bool(np.asarray(res_aed.converged).all())
        assert int(done_aed) < int(done_off) * 0.7, (
            int(done_aed), int(done_off)
        )
        re, im = schur._eigvals_from_T(res_aed.T)
        ev = np.asarray(re) + 1j * np.asarray(im)
        for b in range(B):
            want = np.linalg.eigvals(A[b].astype(np.float64))
            worst = 0.0
            for g in ev[b]:
                i = np.argmin(np.abs(want - g))
                worst = max(worst, abs(want[i] - g))
                want = np.delete(want, i)
            assert worst < 1e-3, (b, worst)


class TestSpectralPipelineSchur:
    def test_matches_qr_method(self):
        from linalg_solver_tpu.models.spectral import spectral_pipeline

        A, lam = prescribed(3, 12, seed=7)
        rep = spectral_pipeline(jnp.asarray(A), method="schur")
        assert bool(np.asarray(rep.diagonalizable).all())
        got = np.sort(np.asarray(rep.eig_real), axis=1)
        np.testing.assert_allclose(
            got, np.sort(lam, axis=1), atol=2e-2
        )
        # D really diagonalizes: P D P^{-1} ≈ A
        recon = np.asarray(
            jnp.einsum(
                "bij,bjk,bkl->bil", rep.P, rep.D, rep.P_inv,
                precision=lax.Precision.HIGHEST,
            )
        )
        np.testing.assert_allclose(recon, A, atol=5e-2)


@pytest.mark.slow
class TestClusteredSpectra:
    """Regression: high-multiplicity clustered spectra used to stall the
    Francis iteration — mid-window subdiagonals bottom out just above the
    strict ulp·|diag| threshold, the bulge is chased through the
    near-zero entry and washes out (vanishing bulge), and the window
    never splits.  The Ahues–Tisseur product criterion (dlahqr's second
    deflation test) deflates those entries."""

    def test_symmetric_multiplicity_clusters_converge(self):
        from linalg_solver_tpu.ops.generate import diagonalizable_batch

        eigs = [1.0] * 11 + [2.0] * 11 + [5.0] * 10
        A = diagonalizable_batch(
            jax.random.PRNGKey(0), 4, eigs, transform="orthogonal"
        )
        res = schur.real_schur(A)
        assert bool(np.asarray(res.converged).all())
        # well under the 8n budget now that windows split
        assert int(res.sweeps) < 64
        ev = schur.eigvals_schur(A)
        true = np.sort(np.array(eigs))
        got = np.sort(np.asarray(ev.real), axis=1)
        np.testing.assert_allclose(
            got, np.broadcast_to(true, got.shape), atol=1e-3
        )
        assert np.abs(np.asarray(ev.imag)).max() < 1e-4

    def test_high_multiplicity_large_n_converges_clean(self):
        """Regression for the AT-floor criterion: multiplicity-85
        spectra at n=256.  A multiplicity-g eigenvalue forces ≥ g−1
        exactly-zero subdiagonals in the unreduced Hessenberg form; f32
        leaves them bouncing at ~n·eps·‖A‖ — above ulp·|diag| and the
        1·eps·‖A‖ floor — and without the backward-error-gated
        Ahues–Tisseur deflation most lanes stalled into the escalating
        breaker at O(1) eigenvalue error (clean=False), batch-size-
        dependent (B=2 happened to converge, B=8/32 did not)."""
        rng = np.random.RandomState(0)
        n = 256
        w = np.repeat([1.0, 2.0, 3.0], [86, 85, 85])
        qs, _ = np.linalg.qr(rng.randn(4, n, n))
        A = ((qs * w[None, None, :]) @ np.swapaxes(qs, 1, 2)).astype(
            np.float32
        )
        res = schur.real_schur(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        assert bool(np.asarray(res.clean).all())
        assert int(res.sweeps) < 40
        re, _ = schur._eigvals_from_T(res.T)
        got = np.sort(np.asarray(re), axis=1)
        want = np.sort(np.repeat([1.0, 2.0, 3.0], [86, 85, 85]))
        np.testing.assert_allclose(
            got, np.broadcast_to(want, got.shape), atol=1e-3
        )

    def test_nonsymmetric_multiplicity_clusters_converge(self):
        from linalg_solver_tpu.ops.generate import diagonalizable_batch

        # A well-conditioned NON-NORMAL similarity (κ(P) ~ tens; the
        # unimodular generator's κ grows exponentially with n and puts
        # the spectrum beyond ANY f32 solver's reach at this size).
        del diagonalizable_batch
        rng = np.random.RandomState(7)
        eigs = [1.0] * 8 + [2.0] * 8 + [5.0] * 8
        n = len(eigs)
        D = np.diag(np.array(eigs, np.float64))
        P = np.eye(n) + 0.3 * rng.randn(4, n, n)
        A = (np.linalg.inv(P) @ D[None] @ P).astype(np.float32)
        res = schur.eigvals_schur(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        got = np.sort(np.asarray(res.real), axis=1)
        want = np.sort(
            np.linalg.eigvals(A.astype(np.float64)).real, axis=1
        )
        np.testing.assert_allclose(got, want, atol=5e-2)


class TestSchurVectors:
    def test_orthogonal_similarity(self):
        rng = np.random.RandomState(0)
        A = rng.randn(3, 24, 24).astype(np.float32)
        sv = schur.real_schur_vectors(jnp.asarray(A))
        assert bool(np.asarray(sv.converged).all())
        T = np.asarray(sv.T, np.float64)
        Q = np.asarray(sv.Q, np.float64)
        f = np.asarray(sv.scale, np.float64)
        for b in range(3):
            assert np.abs(Q[b].T @ Q[b] - np.eye(24)).max() < 1e-4
            D = np.diag(f[b])
            Arec = np.linalg.inv(D) @ Q[b] @ T[b] @ Q[b].T @ D
            err = np.abs(Arec - A[b]).max() / np.abs(A[b]).max()
            assert err < 1e-4, (b, err)

    def test_real_blocks_standardized(self):
        """Real-eigenvalue 2×2 blocks must be split so their columns
        admit eigenvectors (the iteration deflates them unsplit)."""
        rng = np.random.RandomState(5)
        n = 32
        lam = rng.permutation(np.linspace(-5, 5, n)).astype(np.float32)
        P = np.eye(n) + 0.3 * rng.randn(n, n)
        A = (np.linalg.inv(P) @ np.diag(lam) @ P)[None].astype(
            np.float32
        )
        res = schur.eig_real_batched(jnp.asarray(A))
        assert int(np.asarray(res.valid).sum()) == n


class TestEigRealBatched:
    def _check(self, A, res):
        valid = np.asarray(res.valid)
        V = np.asarray(res.vectors, np.float64)
        re = np.asarray(res.real)
        worst = 0.0
        for b in range(A.shape[0]):
            true = np.linalg.eigvals(A[b].astype(np.float64))
            nreal = (np.abs(true.imag) < 1e-3).sum()
            assert valid[b].sum() == nreal, (b, valid[b].sum(), nreal)
            for i in np.nonzero(valid[b])[0]:
                v = V[b][:, i]
                r = np.abs(
                    A[b].astype(np.float64) @ v - re[b][i] * v
                ).max()
                worst = max(worst, r / np.abs(A[b]).max())
        return worst

    def test_gaussian_real_columns(self):
        A = gaussian(4, 24, seed=0)
        res = schur.eig_real_batched(jnp.asarray(A))
        assert bool(np.asarray(res.converged).all())
        assert self._check(A, res) < 1e-4

    def test_complex_pairs_flagged_invalid(self):
        rng = np.random.RandomState(5)
        S = rng.randn(1, 12, 12).astype(np.float32)
        A = S - np.transpose(S, (0, 2, 1))   # pure imaginary spectrum
        res = schur.eig_real_batched(jnp.asarray(A))
        # skew: all eigenvalues imaginary (n even ⇒ no real ones beyond
        # numerical zeros); nearly every column must be invalid
        assert int(np.asarray(res.valid).sum()) <= 2

    def test_balance_undone_in_vectors(self):
        rng = np.random.RandomState(3)
        A = gaussian(1, 24, seed=0)[0].astype(np.float64)
        D = np.diag(2.0 ** rng.randint(-8, 9, 24))
        A2 = (np.linalg.inv(D) @ A @ D)[None].astype(np.float32)
        res = schur.eig_real_batched(jnp.asarray(A2))
        assert self._check(A2, res) < 1e-3


class TestSmallSizesAndKwargs:
    """Review regressions: tiny sizes and keyword calls."""

    def test_eig_2x2_real(self):
        A = np.array([[[0.0, 1.0], [1.0, 0.0]]], np.float32)
        res = schur.eig_real_batched(jnp.asarray(A))
        assert np.asarray(res.valid).sum() == 2
        V = np.asarray(res.vectors, np.float64)[0]
        re = np.asarray(res.real)[0]
        for i in range(2):
            r = np.abs(A[0].astype(np.float64) @ V[:, i] - re[i] * V[:, i])
            assert r.max() < 1e-5

    def test_eig_1x1_zero(self):
        res = schur.eig_real_batched(jnp.zeros((1, 1, 1), jnp.float32))
        assert bool(np.asarray(res.valid)[0, 0])
        assert np.isfinite(np.asarray(res.vectors)).all()
        np.testing.assert_allclose(np.asarray(res.vectors)[0], [[1.0]])

    def test_balance_kwarg(self):
        A = jnp.asarray(gaussian(2, 8, seed=1))
        out = schur.balance_batched(A, iters=8)
        assert out.shape == A.shape

    def test_T_stays_hessenberg_with_deep_starts(self):
        """The deepened bulge start must not leave fill-in below the
        first subdiagonal (the create-step leak through H[l, l-1])."""
        rng = np.random.RandomState(0)
        n = 64
        lam = np.stack([
            rng.permutation(np.linspace(-8, 8, n)) for _ in range(3)
        ]).astype(np.float32)
        P = np.eye(n) + (0.15 / np.sqrt(n)) * rng.randn(3, n, n).astype(
            np.float32
        )
        A = (
            np.linalg.inv(P.astype(np.float64))
            @ np.stack([np.diag(v) for v in lam])
            @ P.astype(np.float64)
        ).astype(np.float32)
        res = schur.real_schur(jnp.asarray(A))
        T = np.asarray(res.T)
        assert np.abs(np.tril(T, -2)).max() == 0.0


class TestEigBatchedComplex:
    """Full complex eigendecomposition via strevc in re/im arithmetic."""

    def _check_full(self, A):
        res = schur.eig_batched(jnp.asarray(A))
        vd = np.asarray(res.valid)
        V = (
            np.asarray(res.vectors_real, np.float64)
            + 1j * np.asarray(res.vectors_imag, np.float64)
        )
        lam = (
            np.asarray(res.real, np.float64)
            + 1j * np.asarray(res.imag, np.float64)
        )
        worst = 0.0
        for b in range(A.shape[0]):
            for i in np.nonzero(vd[b])[0]:
                v = V[b][:, i]
                r = np.abs(
                    A[b].astype(np.float64) @ v - lam[b][i] * v
                ).max()
                worst = max(worst, r / np.abs(A[b]).max())
            # Nearest-neighbor spectrum match (lexicographic complex
            # sorting scrambles order among eigenvalues whose real
            # parts differ only by roundoff).
            want = np.linalg.eigvals(A[b].astype(np.float64))
            for lv in lam[b]:
                assert np.abs(want - lv).min() < 2e-3, (b, lv)
        return vd, worst

    def test_gaussian_full_spectrum(self):
        A = gaussian(4, 24, seed=0)
        vd, worst = self._check_full(A)
        assert (vd.sum(axis=1) == 24).all()
        assert worst < 1e-4, worst

    def test_skew_all_complex(self):
        rng = np.random.RandomState(5)
        S = rng.randn(2, 12, 12).astype(np.float32)
        A = S - np.transpose(S, (0, 2, 1))
        vd, worst = self._check_full(A)
        # all eigenvalues imaginary → every column from a complex pair
        assert (vd.sum(axis=1) >= 10).all()
        assert worst < 1e-4, worst

    def test_conjugate_pair_columns(self):
        A = np.array([[[0.0, -2.0], [2.0, 0.0]]], np.float32)
        res = schur.eig_batched(jnp.asarray(A))
        assert np.asarray(res.valid).all()
        im = np.asarray(res.imag)[0]
        np.testing.assert_allclose(np.sort(im), [-2.0, 2.0], atol=1e-5)
        Vr = np.asarray(res.vectors_real)[0]
        Vi = np.asarray(res.vectors_imag)[0]
        # second column is the conjugate of the first
        np.testing.assert_allclose(Vr[:, 1], Vr[:, 0], atol=1e-6)
        np.testing.assert_allclose(Vi[:, 1], -Vi[:, 0], atol=1e-6)


class TestShiftedBacksolve:
    def test_solves_shifted_system(self):
        rng = np.random.RandomState(0)
        A = rng.randn(2, 12, 12).astype(np.float32)
        sv = schur.real_schur_vectors(jnp.asarray(A))
        T = np.asarray(sv.T, np.float64)
        lam_re = np.full((2, 12), 0.123, np.float32)
        lam_im = np.full((2, 12), 0.456, np.float32)
        R_re = rng.randn(2, 12, 12).astype(np.float32)
        R_im = rng.randn(2, 12, 12).astype(np.float32)
        Wr, Wi = schur._shifted_backsolve(
            sv.T, jnp.asarray(lam_re), jnp.asarray(lam_im),
            jnp.asarray(R_re), jnp.asarray(R_im),
        )
        W = np.asarray(Wr, np.float64) + 1j * np.asarray(Wi, np.float64)
        R = R_re.astype(np.float64) + 1j * R_im.astype(np.float64)
        for b in range(2):
            M = T[b] - (0.123 + 0.456j) * np.eye(12)
            assert np.abs(M @ W[b] - R[b]).max() < 1e-4

    def test_refine_keeps_results_valid(self):
        A = gaussian(2, 16, seed=9)
        r0 = schur.eig_batched(jnp.asarray(A), refine_steps=0)
        r1 = schur.eig_batched(jnp.asarray(A), refine_steps=1)
        for res in (r0, r1):
            vd = np.asarray(res.valid)
            V = (
                np.asarray(res.vectors_real, np.float64)
                + 1j * np.asarray(res.vectors_imag, np.float64)
            )
            lam = (
                np.asarray(res.real, np.float64)
                + 1j * np.asarray(res.imag, np.float64)
            )
            for b in range(2):
                for i in np.nonzero(vd[b])[0]:
                    v = V[b][:, i]
                    r = np.abs(
                        A[b].astype(np.float64) @ v - lam[b][i] * v
                    ).max()
                    assert r / np.abs(A[b]).max() < 1e-4


class TestEigCondition:
    """Per-eigenvalue reciprocal condition numbers (dtrsna RCONDE
    semantics): s = |y^H x| for unit right/left eigenvectors, left
    vectors obtained by reusing _trevc_full on J T^T J."""

    def test_matches_f64_oracle(self):
        from linalg_solver_tpu.ops.schur import eig_condition_batched

        rng = np.random.RandomState(5)
        n = 16
        A = rng.randn(2, n, n).astype(np.float32) / np.sqrt(n)
        r = eig_condition_batched(jnp.asarray(A))
        assert bool(np.asarray(r.converged).all())
        assert bool(np.asarray(r.valid).all())
        for b in range(2):
            lam = (np.asarray(r.real, np.float64)[b]
                   + 1j * np.asarray(r.imag, np.float64)[b])
            w64, V = np.linalg.eig(A[b].astype(np.float64))
            w2, W2 = np.linalg.eig(A[b].astype(np.float64).T)
            got = np.asarray(r.s, np.float64)[b]
            for i, l in enumerate(lam):
                iv = int(np.argmin(np.abs(w64 - l)))
                jw = int(np.argmin(np.abs(w2 - l)))
                v = V[:, iv]
                y = np.conj(W2[:, jw])
                want = abs(np.vdot(y, v)) / (
                    np.linalg.norm(v) * np.linalg.norm(y)
                )
                assert abs(got[i] - want) < 1e-4, (i, got[i], want)

    def test_near_defective_flags_tiny_s(self):
        from linalg_solver_tpu.ops.schur import eig_condition_batched

        rng = np.random.RandomState(6)
        n = 16
        J = (np.eye(n) * 0.5 + np.eye(n, k=1)).astype(np.float32)
        P = rng.randn(n, n).astype(np.float32)
        A = np.linalg.solve(P, J @ P)[None].astype(np.float32)
        r = eig_condition_batched(jnp.asarray(A))
        # a Jordan chain has eigenvalue condition ~eps^{(k-1)/k}: the
        # reciprocal condition must collapse and the error estimate
        # must reach O(1) — honest "don't trust these eigenvalues".
        assert float(np.asarray(r.s).min()) < 1e-3
        assert float(np.asarray(r.err_est).max()) > 1e-2
