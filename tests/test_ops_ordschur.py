"""Ordered Schur forms: rsf2csf, reordering, invariant subspaces.

Differential oracles: scipy.linalg.rsf2csf / schur(sort=...) and
numpy f64 eigendecompositions.  Everything runs on CPU at float32, so
tolerances sit at the f32 composition floor (~1e-5 relative).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.ordschur import (
    invariant_subspace_batched,
    rsf2csf_batched,
    schur_reorder_batched,
    schur_sort_batched,
)
from linalg_solver_tpu.ops.schur import real_schur_vectors


def _schur(A):
    return real_schur_vectors(jnp.asarray(A))


def _complex(re, im):
    return np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)


def _match_spectra(got, want, tol):
    """Nearest-neighbor spectra comparison (sort_complex scrambles
    near-ties whose real parts differ by roundoff)."""
    got = np.asarray(got, complex).ravel()
    want = np.asarray(want, complex).ravel()
    assert got.shape == want.shape
    for g in got:
        assert np.abs(g - want).min() < tol, (g, want)


class TestRsf2csf:
    def test_structure_and_reconstruction(self):
        rng = np.random.RandomState(0)
        B, n = 4, 14
        A = rng.randn(B, n, n).astype(np.float32)
        sv = _schur(A)
        assert bool(np.asarray(sv.converged).all())
        cs = rsf2csf_batched(sv.T, sv.Q)
        T = _complex(cs.t_re, cs.t_im)
        Q = _complex(cs.q_re, cs.q_im)
        for b in range(B):
            Db = np.diag(np.asarray(sv.scale[b], np.float64))
            Dbi = np.diag(1 / np.asarray(sv.scale[b], np.float64))
            assert np.abs(np.tril(T[b], -1)).max() == 0.0
            assert np.abs(Q[b].conj().T @ Q[b] - np.eye(n)).max() < 5e-6
            recon = Q[b] @ T[b] @ Q[b].conj().T
            assert np.abs(recon - Db @ A[b] @ Dbi).max() < 2e-5 * np.abs(
                A[b]
            ).max()

    def test_diag_matches_scipy_eigenvalues(self):
        rng = np.random.RandomState(1)
        B, n = 3, 10
        A = rng.randn(B, n, n).astype(np.float32)
        sv = _schur(A)
        cs = rsf2csf_batched(sv.T, sv.Q)
        w = np.diagonal(_complex(cs.t_re, cs.t_im), axis1=1, axis2=2)
        for b in range(B):
            want = np.linalg.eigvals(A[b].astype(np.float64))
            _match_spectra(w[b], want, 5e-5)
            # conjugate pairs adjacent, +iν first
            im = w[b].imag
            for j in range(n):
                if im[j] > 0:
                    assert abs(w[b, j + 1] - w[b, j].conj()) < 1e-6

    def test_against_scipy_rsf2csf(self):
        # Same T, Q handed to scipy's rsf2csf: the complex forms agree
        # up to per-column phase; compare |T| and the diagonal exactly.
        import scipy.linalg

        rng = np.random.RandomState(2)
        n = 8
        A = rng.randn(n, n).astype(np.float32)
        sv = _schur(A[None])
        T0 = np.asarray(sv.T[0], np.float64)
        Q0 = np.asarray(sv.Q[0], np.float64)
        Ts, Qs = scipy.linalg.rsf2csf(T0, Q0)
        cs = rsf2csf_batched(sv.T, sv.Q)
        T = _complex(cs.t_re, cs.t_im)[0]
        _match_spectra(np.diag(T), np.diag(Ts), 1e-5)
        # both are unitary similarities of the same matrix
        Q = _complex(cs.q_re, cs.q_im)[0]
        assert (
            np.abs(Q @ T @ Q.conj().T - Qs @ Ts @ Qs.conj().T).max()
            < 1e-5
        )

    def test_already_triangular_is_noop(self):
        rng = np.random.RandomState(3)
        B, n = 2, 6
        T = np.triu(rng.randn(B, n, n)).astype(np.float32)
        Q = np.broadcast_to(np.eye(n, dtype=np.float32), (B, n, n))
        cs = rsf2csf_batched(jnp.asarray(T), jnp.asarray(Q))
        np.testing.assert_allclose(np.asarray(cs.t_re), T, atol=1e-6)
        assert np.abs(np.asarray(cs.t_im)).max() == 0.0


class TestSchurSort:
    @pytest.mark.parametrize(
        "key", ["abs_desc", "abs_asc", "real_desc", "real_asc"]
    )
    def test_sorted_and_similar(self, key):
        rng = np.random.RandomState(4)
        B, n = 3, 12
        A = rng.randn(B, n, n).astype(np.float32)
        sv = _schur(A)
        os = schur_sort_batched(sv.T, sv.Q, key=key)
        w = _complex(os.w_re, os.w_im)
        T = _complex(os.t_re, os.t_im)
        Q = _complex(os.q_re, os.q_im)
        for b in range(B):
            k = np.abs(w[b]) if key.startswith("abs") else w[b].real
            if key.endswith("desc"):
                k = -k
            assert (np.diff(k) >= -1e-4 * np.abs(k[:-1]) - 1e-5).all(), k
            assert np.abs(np.tril(T[b], -1)).max() == 0.0
            assert np.abs(Q[b].conj().T @ Q[b] - np.eye(n)).max() < 1e-5
            Db = np.diag(np.asarray(sv.scale[b], np.float64))
            Dbi = np.diag(1 / np.asarray(sv.scale[b], np.float64))
            recon = Q[b] @ T[b] @ Q[b].conj().T
            assert np.abs(recon - Db @ A[b] @ Dbi).max() < 3e-5 * np.abs(
                A[b]
            ).max()
            _match_spectra(
                w[b], np.linalg.eigvals(A[b].astype(np.float64)), 5e-5
            )

    def test_conjugate_pairs_stay_adjacent(self):
        rng = np.random.RandomState(5)
        B, n = 2, 10
        A = rng.randn(B, n, n).astype(np.float32)
        sv = _schur(A)
        os = schur_sort_batched(sv.T, sv.Q, key="abs_desc")
        w = _complex(os.w_re, os.w_im)
        for b in range(B):
            j = 0
            while j < n:
                if w[b, j].imag != 0:
                    assert w[b, j].imag > 0
                    assert abs(w[b, j + 1] - w[b, j].conj()) < 1e-6
                    j += 2
                else:
                    j += 1

    def test_matches_scipy_sorted_schur(self):
        # scipy.linalg.schur(sort='lhp') counts the left-half-plane
        # eigenvalues; compare leading diag sets after our real_asc sort.
        import scipy.linalg

        rng = np.random.RandomState(6)
        n = 9
        A = rng.randn(n, n).astype(np.float32)
        _, _, sdim = scipy.linalg.schur(
            A.astype(np.float64), output="complex", sort="lhp"
        )
        sv = _schur(A[None])
        os = schur_sort_batched(sv.T, sv.Q, key="real_asc")
        w = _complex(os.w_re, os.w_im)[0]
        assert (w[:sdim].real < 0).all()
        assert (w[sdim:].real >= 0).all()


class TestSchurReorder:
    def test_partition_selected_first(self):
        rng = np.random.RandomState(7)
        B, n = 3, 11
        A = rng.randn(B, n, n).astype(np.float32)
        sv = _schur(A)
        cs = rsf2csf_batched(sv.T, sv.Q)
        w0_im = np.diagonal(np.asarray(cs.t_im), axis1=1, axis2=2)
        w0_re = np.diagonal(np.asarray(cs.t_re), axis1=1, axis2=2)
        # Select |λ| > median as a conjugation-closed criterion — but
        # feed the mask in the REAL quasi-triangular diag order.
        dT = np.asarray(sv.T)
        mask = np.zeros((B, n), bool)
        for b in range(B):
            w = np.linalg.eigvals(dT[b].astype(np.float64))
            med = np.median(np.abs(w))
            # positions: use the real-form diagonal magnitude proxy via
            # the complex form computed above (same block positions)
            mask[b] = np.hypot(w0_re[b], w0_im[b]) > med
        os = schur_reorder_batched(sv.T, sv.Q, jnp.asarray(mask))
        w = _complex(os.w_re, os.w_im)
        m = np.asarray(os.m)
        T = _complex(os.t_re, os.t_im)
        Q = _complex(os.q_re, os.q_im)
        for b in range(B):
            lead = np.abs(w[b, : m[b]])
            trail = np.abs(w[b, m[b]:])
            assert lead.min() > trail.max() - 1e-4
            Db = np.diag(np.asarray(sv.scale[b], np.float64))
            Dbi = np.diag(1 / np.asarray(sv.scale[b], np.float64))
            recon = Q[b] @ T[b] @ Q[b].conj().T
            assert np.abs(recon - Db @ A[b] @ Dbi).max() < 3e-5 * np.abs(
                A[b]
            ).max()
            _match_spectra(
                w[b], np.linalg.eigvals(A[b].astype(np.float64)), 5e-5
            )

    def test_pair_symmetrization(self):
        # Selecting only ONE member of a conjugate pair must pull the
        # whole pair (a real invariant subspace cannot split it).
        rng = np.random.RandomState(8)
        n = 6
        # rotation-heavy: guaranteed complex pairs
        A = (rng.randn(n, n) - rng.randn(n, n).T).astype(np.float32)
        sv = _schur(A[None])
        dT = np.asarray(sv.T[0])
        sub = np.diagonal(dT, -1)
        # find a 2×2 block and select only its top position
        tops = [j for j in range(n - 1) if sub[j] != 0]
        assert tops, "expected at least one complex pair"
        mask = np.zeros((1, n), bool)
        mask[0, tops[0]] = True
        os = schur_reorder_batched(sv.T, sv.Q, jnp.asarray(mask))
        assert int(os.m[0]) == 2
        w = _complex(os.w_re, os.w_im)[0]
        assert abs(w[1] - w[0].conj()) < 1e-6


class TestInvariantSubspace:
    def test_stable_subspace(self):
        rng = np.random.RandomState(9)
        B, n = 4, 12
        A = rng.randn(B, n, n).astype(np.float32)
        res = invariant_subspace_batched(
            jnp.asarray(A), lambda re, im: re < 0
        )
        assert bool(np.asarray(res.ok).all()), np.asarray(res.resid)
        m = np.asarray(res.m)
        for b in range(B):
            mb = int(m[b])
            wa = np.linalg.eigvals(A[b].astype(np.float64))
            assert mb == int((wa.real < 0).sum())
            V = np.asarray(res.v[b], np.float64)[:, :mb]
            assert np.abs(V.T @ V - np.eye(mb)).max() < 1e-5
            # zero padding beyond m
            assert np.abs(np.asarray(res.v[b])[:, mb:]).max() == 0.0
            H = V.T @ A[b].astype(np.float64) @ V
            _match_spectra(
                np.linalg.eigvals(H),
                wa[wa.real < 0],
                5e-4,
            )

    def test_dominant_subspace_magnitude(self):
        rng = np.random.RandomState(10)
        B, n = 2, 10
        A = rng.randn(B, n, n).astype(np.float32)
        res = invariant_subspace_batched(
            jnp.asarray(A), lambda re, im: re * re + im * im > 4.0
        )
        assert bool(np.asarray(res.ok).all())
        for b in range(B):
            wa = np.linalg.eigvals(A[b].astype(np.float64))
            assert int(res.m[b]) == int((np.abs(wa) > 2.0).sum())

    def test_empty_and_full_selection(self):
        rng = np.random.RandomState(11)
        A = rng.randn(2, 6, 6).astype(np.float32)
        full = invariant_subspace_batched(
            jnp.asarray(A), lambda re, im: jnp.ones_like(re, bool)
        )
        assert (np.asarray(full.m) == 6).all()
        assert bool(np.asarray(full.ok).all())
        empty = invariant_subspace_batched(
            jnp.asarray(A), lambda re, im: jnp.zeros_like(re, bool)
        )
        assert (np.asarray(empty.m) == 0).all()
        assert np.abs(np.asarray(empty.v)).max() == 0.0

    def test_repeated_eigenvalues(self):
        # Diagonalizable with a repeated eigenvalue: subspace for the
        # repeated value has the full geometric dimension.
        rng = np.random.RandomState(12)
        n = 8
        D = np.diag([3.0, 3.0, 3.0, -1.0, -1.0, 2.0, 5.0, -4.0])
        P = rng.randn(n, n)
        while abs(np.linalg.det(P)) < 0.5:
            P = rng.randn(n, n)
        A = (P @ D @ np.linalg.inv(P)).astype(np.float32)
        res = invariant_subspace_batched(
            jnp.asarray(A[None]),
            lambda re, im: jnp.abs(re - 3.0) < 0.5,
        )
        assert int(res.m[0]) == 3
        assert bool(np.asarray(res.ok).all()), np.asarray(res.resid)
        V = np.asarray(res.v[0], np.float64)[:, :3]
        H = V.T @ A.astype(np.float64) @ V
        np.testing.assert_allclose(
            np.linalg.eigvals(H), [3.0, 3.0, 3.0], atol=2e-3
        )

    def test_symmetric_matrix(self):
        rng = np.random.RandomState(13)
        n = 10
        G = rng.randn(n, n)
        A = ((G + G.T) / 2).astype(np.float32)
        res = invariant_subspace_batched(
            jnp.asarray(A[None]), lambda re, im: re > 0
        )
        wa = np.linalg.eigvalsh(A.astype(np.float64))
        assert int(res.m[0]) == int((wa > 0).sum())
        assert bool(np.asarray(res.ok).all())


class TestClusterCondition:
    def _setup(self, seed=0, B=3, n=10):
        rng = np.random.RandomState(seed)
        A = rng.randn(B, n, n).astype(np.float32)
        sv = _schur(A)
        cs = rsf2csf_batched(sv.T, sv.Q)
        wre = np.asarray(jnp.diagonal(cs.t_re, axis1=1, axis2=2))
        sel = jnp.asarray(wre < 0)
        return A, sv, sel

    def test_matches_dense_oracle(self):
        import scipy.linalg

        from linalg_solver_tpu.ops.ordschur import (
            schur_cluster_cond_batched,
        )

        A, sv, sel = self._setup()
        B, n = A.shape[0], A.shape[1]
        cc = schur_cluster_cond_batched(sv.T, sv.Q, sel, sep_iters=8)
        os = schur_reorder_batched(sv.T, sv.Q, sel)
        for b in range(B):
            m = int(os.m[b])
            Tb = _complex(os.t_re[b], os.t_im[b])
            T11, T22, T12 = Tb[:m, :m], Tb[m:, m:], Tb[:m, m:]
            X = scipy.linalg.solve_sylvester(T11, -T22, T12)
            s_or = 1 / np.sqrt(1 + np.linalg.norm(X, "fro") ** 2)
            K = np.kron(np.eye(n - m), T11) - np.kron(T22.T, np.eye(m))
            sep_or = np.linalg.svd(K, compute_uv=False)[-1]
            gap_or = min(
                abs(l1 - l2)
                for l1 in np.diag(T11)
                for l2 in np.diag(T22)
            )
            assert abs(float(cc.s[b]) - s_or) < 2e-3 * s_or
            assert abs(float(cc.sep[b]) - sep_or) < 0.05 * sep_or
            assert abs(float(cc.gap[b]) - gap_or) < 1e-3 * gap_or
            assert float(cc.sep[b]) <= float(cc.gap[b]) + 1e-5
            assert not bool(cc.perturbed[b])

    def test_adjoint_solver(self):
        # S-H(Y) solve: T11^H Y - Y T22^H = C, checked by residual.
        from linalg_solver_tpu.ops.ordschur import _trsyl_masked

        A, sv, sel = self._setup(seed=3)
        os = schur_reorder_batched(sv.T, sv.Q, sel)
        B, n = A.shape[0], A.shape[1]
        rng = np.random.RandomState(5)
        C = rng.randn(B, n, n).astype(np.float32)
        block = (
            (np.arange(n)[:, None] < np.asarray(os.m)[:, None, None])
            & (np.arange(n)[None, :] >= np.asarray(os.m)[:, None, None])
        )
        Cm = (C * block).astype(np.float32)
        Yr, Yi, pert = _trsyl_masked(
            os.t_re, os.t_im, os.m, jnp.asarray(Cm),
            jnp.zeros_like(jnp.asarray(Cm)), adjoint=True,
        )
        for b in range(B):
            m = int(os.m[b])
            Tb = _complex(os.t_re[b], os.t_im[b])
            Y = _complex(Yr[b], Yi[b])[:m, m:]
            R = (Tb[:m, :m].conj().T @ Y - Y @ Tb[m:, m:].conj().T
                 - Cm[b][:m, m:])
            assert np.abs(R).max() < 5e-5 * max(np.abs(Y).max(), 1.0)

    def test_empty_and_full_selection(self):
        from linalg_solver_tpu.ops.ordschur import (
            schur_cluster_cond_batched,
        )

        A, sv, _ = self._setup(seed=7, B=2, n=6)
        none = jnp.zeros((2, 6), bool)
        cc = schur_cluster_cond_batched(sv.T, sv.Q, none)
        assert (np.asarray(cc.s) == 1.0).all()
        assert np.isinf(np.asarray(cc.sep)).all()
        assert np.isinf(np.asarray(cc.gap)).all()
        every = jnp.ones((2, 6), bool)
        cc2 = schur_cluster_cond_batched(sv.T, sv.Q, every)
        assert (np.asarray(cc2.s) == 1.0).all()
        assert np.isinf(np.asarray(cc2.sep)).all()

    def test_shared_eigenvalue_flags_perturbed(self):
        # Splitting a repeated eigenvalue across the clusters: sep ~ 0
        # and the denominator floor trips the perturbed flag.
        from linalg_solver_tpu.ops.ordschur import (
            schur_cluster_cond_batched,
        )

        n = 6
        T = np.triu(np.random.RandomState(9).randn(n, n)).astype(
            np.float32
        )
        np.fill_diagonal(T, [2.0, 2.0, 3.0, 4.0, 5.0, 6.0])
        Q = np.eye(n, dtype=np.float32)
        sel = np.zeros((1, n), bool)
        sel[0, 0] = True   # select ONE copy of the repeated 2.0
        cc = schur_cluster_cond_batched(
            jnp.asarray(T[None]), jnp.asarray(Q[None]),
            jnp.asarray(sel),
        )
        assert bool(cc.perturbed[0])
        assert float(cc.sep[0]) < 1e-2

    def test_normal_matrix_sep_equals_gap(self):
        # For symmetric (normal) A, sep(T11, T22) == gap exactly.
        from linalg_solver_tpu.ops.ordschur import (
            schur_cluster_cond_batched,
        )

        rng = np.random.RandomState(11)
        n = 8
        G = rng.randn(n, n)
        A = ((G + G.T) / 2).astype(np.float32)
        sv = _schur(A[None])
        cs = rsf2csf_batched(sv.T, sv.Q)
        wre = np.asarray(jnp.diagonal(cs.t_re, axis1=1, axis2=2))
        sel = jnp.asarray(wre < np.median(wre))
        cc = schur_cluster_cond_batched(sv.T, sv.Q, sel, sep_iters=10)
        sep, gap = float(cc.sep[0]), float(cc.gap[0])
        assert abs(sep - gap) < 0.02 * gap
        # normal matrix: cluster mean perfectly conditioned (s = 1).
        assert float(cc.s[0]) > 0.99
