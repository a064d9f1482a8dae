"""The numpy.linalg-shaped namespace vs numpy itself.

Every function is checked with (a) no batch dims, (b) one batch dim,
(c) two leading batch dims — the reshaping shim is the main new code.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu import linalg as tla


def wellcond(shape, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(*shape)
    n = shape[-1]
    return (a + 4.0 * np.sqrt(n) * np.eye(n)).astype(np.float32)


def spd(shape, seed=0):
    rng = np.random.RandomState(seed)
    g = rng.randn(*shape)
    return (
        np.einsum("...ik,...jk->...ij", g, g)
        + 0.5 * np.eye(shape[-1])
    ).astype(np.float32)


BATCHES = [(), (3,), (2, 2)]


class TestSolveFamily:
    @pytest.mark.parametrize("lead", BATCHES)
    def test_solve_vector(self, lead):
        a = wellcond(lead + (24, 24), seed=1)
        b = np.random.RandomState(2).randn(*lead, 24).astype(np.float32)
        x = np.asarray(tla.solve(jnp.asarray(a), jnp.asarray(b)))
        want = np.linalg.solve(
            a.astype(np.float64), b.astype(np.float64)[..., None]
        )[..., 0]
        assert x.shape == want.shape
        np.testing.assert_allclose(x, want, atol=1e-4 * np.abs(want).max())

    def test_solve_matrix_rhs(self):
        a = wellcond((3, 32, 32), seed=3)
        b = np.random.RandomState(4).randn(3, 32, 5).astype(np.float32)
        x = np.asarray(tla.solve(jnp.asarray(a), jnp.asarray(b)))
        want = np.linalg.solve(a.astype(np.float64), b.astype(np.float64))
        assert x.shape == want.shape
        np.testing.assert_allclose(x, want, atol=1e-4 * np.abs(want).max())

    @pytest.mark.parametrize("lead", BATCHES)
    def test_inv_det_slogdet(self, lead):
        a = wellcond(lead + (16, 16), seed=5)
        inv = np.asarray(tla.inv(jnp.asarray(a)))
        np.testing.assert_allclose(
            inv, np.linalg.inv(a.astype(np.float64)), atol=1e-4
        )
        d = np.asarray(tla.det(jnp.asarray(a)))
        want = np.linalg.det(a.astype(np.float64))
        np.testing.assert_allclose(d, want, rtol=1e-3)
        s, l = tla.slogdet(jnp.asarray(a))
        ws, wl = np.linalg.slogdet(a.astype(np.float64))
        np.testing.assert_allclose(np.asarray(s), ws)
        np.testing.assert_allclose(np.asarray(l), wl, rtol=1e-4)

    def test_slogdet_overflow_regime(self):
        """det overflows f32 at n=80 with entries ~4: slogdet stays
        finite and correct."""
        a = wellcond((80, 80), seed=6) * 3.0
        s, l = tla.slogdet(jnp.asarray(a))
        ws, wl = np.linalg.slogdet(a.astype(np.float64))
        assert np.isfinite(float(l))
        np.testing.assert_allclose(float(s), ws)
        np.testing.assert_allclose(float(l), wl, rtol=1e-4)

    def test_lstsq_pinv(self):
        a = np.random.RandomState(7).randn(2, 40, 12).astype(np.float32)
        b = np.random.RandomState(8).randn(2, 40).astype(np.float32)
        x = np.asarray(tla.lstsq(jnp.asarray(a), jnp.asarray(b)))
        want = np.stack([
            np.linalg.lstsq(a[i].astype(np.float64),
                            b[i].astype(np.float64), rcond=None)[0]
            for i in range(2)
        ])
        np.testing.assert_allclose(x, want, atol=1e-3)
        p = np.asarray(tla.pinv(jnp.asarray(a)))
        np.testing.assert_allclose(
            p, np.linalg.pinv(a.astype(np.float64)), atol=1e-3
        )


class TestEigFamily:
    @pytest.mark.parametrize("lead", BATCHES)
    def test_eigh(self, lead):
        a = spd(lead + (20, 20), seed=9)
        w, v = tla.eigh(jnp.asarray(a))
        w, v = np.asarray(w), np.asarray(v)
        ww = np.linalg.eigvalsh(a.astype(np.float64))
        np.testing.assert_allclose(w, ww, atol=1e-3 * np.abs(ww).max())
        # eigenvector property
        r = np.einsum("...ij,...jk->...ik", a, v) - w[..., None, :] * v
        assert np.abs(r).max() < 1e-2

    def test_eig_complex_like_numpy(self):
        a = np.random.RandomState(10).randn(2, 24, 24).astype(np.float32)
        w, v = tla.eig(jnp.asarray(a))
        w, v = np.asarray(w), np.asarray(v)
        assert np.iscomplexobj(w) and np.iscomplexobj(v)
        for i in range(2):
            want = np.sort_complex(np.linalg.eigvals(a[i].astype(np.float64)))
            got = np.asarray(sorted(w[i], key=lambda z: (z.real, z.imag)))
            # nearest-neighbor match (sort_complex scrambles ties)
            rem = list(want)
            worst = 0.0
            for g in got:
                j = int(np.argmin(np.abs(np.array(rem) - g)))
                worst = max(worst, abs(rem[j] - g))
                rem.pop(j)
            assert worst < 1e-3
            # residual of a few eigenpairs
            r = a[i] @ v[i] - v[i] * w[i][None, :]
            assert np.abs(r).max() < 5e-2

    def test_eigvals_matches_eig(self):
        a = np.random.RandomState(11).randn(1, 16, 16).astype(np.float32)
        w1 = np.sort(np.asarray(tla.eigvals(jnp.asarray(a)))[0])
        w2 = np.sort(np.asarray(tla.eig(jnp.asarray(a))[0])[0])
        np.testing.assert_allclose(w1.real, w2.real, atol=1e-4)


class TestFactorizations:
    @pytest.mark.parametrize("lead", BATCHES)
    def test_qr(self, lead):
        a = np.random.RandomState(12).randn(*lead, 24, 10).astype(
            np.float32
        )
        q, r = tla.qr(jnp.asarray(a))
        q, r = np.asarray(q, np.float64), np.asarray(r, np.float64)
        np.testing.assert_allclose(
            np.einsum("...ik,...kj->...ij", q, r), a, atol=1e-4
        )
        eye = np.einsum("...ki,...kj->...ij", q, q)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(10), eye.shape), atol=1e-4
        )

    def test_svd(self):
        a = np.random.RandomState(13).randn(2, 20, 12).astype(np.float32)
        u, s, vh = tla.svd(jnp.asarray(a))
        u, s, vh = map(lambda x: np.asarray(x, np.float64), (u, s, vh))
        np.testing.assert_allclose(
            np.einsum("bik,bk,bkj->bij", u, s, vh), a, atol=1e-3
        )
        np.testing.assert_allclose(
            s, np.linalg.svd(a.astype(np.float64), compute_uv=False),
            rtol=1e-3, atol=1e-4,
        )
        s_only = np.asarray(tla.svd(jnp.asarray(a), compute_uv=False))
        np.testing.assert_allclose(s_only, s, atol=1e-5)

    @pytest.mark.parametrize("shape", [(20, 12), (12, 20)])
    def test_svd_full_matrices(self, shape):
        """full_matrices=True pads U (tall) / Vh (wide) with an
        orthonormal complement — square factors, same reconstruction."""
        m, n = shape
        a = np.random.RandomState(13).randn(2, m, n).astype(np.float32)
        u, s, vh = tla.svd(jnp.asarray(a), full_matrices=True)
        u, s, vh = map(lambda x: np.asarray(x, np.float64), (u, s, vh))
        assert u.shape == (2, m, m) and vh.shape == (2, n, n)
        k = min(m, n)
        np.testing.assert_allclose(
            np.einsum("bik,bk,bkj->bij", u[:, :, :k], s, vh[:, :k]),
            a, atol=1e-3,
        )
        for q in (u, vh):
            eye = np.einsum("bki,bkj->bij", q, q)
            np.testing.assert_allclose(
                eye, np.broadcast_to(np.eye(q.shape[-1]), eye.shape),
                atol=2e-4,
            )

    def test_svd_full_matrices_complex(self):
        rng = np.random.RandomState(29)
        a = (rng.randn(2, 14, 8) + 1j * rng.randn(2, 14, 8)).astype(
            np.complex64
        )
        u, s, vh = tla.svd(jnp.asarray(a), full_matrices=True)
        u = np.asarray(u, np.complex128)
        s = np.asarray(s, np.float64)
        vh = np.asarray(vh, np.complex128)
        assert u.shape == (2, 14, 14) and vh.shape == (2, 8, 8)
        np.testing.assert_allclose(
            np.einsum("bik,bk,bkj->bij", u[:, :, :8], s, vh),
            a, atol=2e-3,
        )
        eye = np.einsum("bki,bkj->bij", u.conj(), u)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(14), eye.shape), atol=3e-4
        )

    def test_cholesky(self):
        a = spd((3, 16, 16), seed=14)
        L = np.asarray(tla.cholesky(jnp.asarray(a)), np.float64)
        np.testing.assert_allclose(
            np.einsum("bik,bjk->bij", L, L), a, atol=1e-3
        )
        assert np.abs(np.triu(L, 1)).max() == 0.0


class TestMisc:
    def test_matrix_rank_cond(self):
        rng = np.random.RandomState(15)
        U = np.linalg.qr(rng.randn(12, 12))[0]
        w = np.ones(12); w[-3:] = 0.0
        a = ((U * w) @ U.T).astype(np.float32)[None]
        assert int(np.asarray(tla.matrix_rank(jnp.asarray(a)))[0]) == 9
        aw = wellcond((1, 16, 16), seed=16)
        c = float(np.asarray(tla.cond(jnp.asarray(aw)))[0])
        want = np.linalg.cond(aw[0].astype(np.float64))
        assert abs(c - want) / want < 0.05

    @pytest.mark.parametrize(
        "p", [1, -1, np.inf, -np.inf, "fro", -2]
    )
    def test_cond_all_norms(self, p):
        aw = wellcond((2, 16, 16), seed=16)
        got = np.asarray(tla.cond(jnp.asarray(aw), p=p), np.float64)
        want = np.stack([
            np.linalg.cond(aw[i].astype(np.float64), p=p)
            for i in range(2)
        ])
        np.testing.assert_allclose(got, want, rtol=1e-3)

    def test_cond_complex_norms(self):
        rng = np.random.RandomState(41)
        a = (
            rng.randn(1, 10, 10) + 1j * rng.randn(1, 10, 10)
            + 6 * np.eye(10)
        ).astype(np.complex64)
        for p in (1, np.inf, "fro"):
            got = float(np.asarray(tla.cond(jnp.asarray(a), p=p))[0])
            want = np.linalg.cond(a[0].astype(np.complex128), p=p)
            assert abs(got - want) / want < 1e-2

    @pytest.mark.parametrize("p", [0, 1, 3, 8, -1, -2])
    def test_matrix_power(self, p):
        a = wellcond((2, 10, 10), seed=17) / 10.0
        got = np.asarray(tla.matrix_power(jnp.asarray(a), p), np.float64)
        want = np.stack([
            np.linalg.matrix_power(a[i].astype(np.float64), p)
            for i in range(2)
        ])
        np.testing.assert_allclose(
            got, want, atol=1e-4 * max(np.abs(want).max(), 1.0)
        )

    def test_norm_passthrough(self):
        x = np.random.RandomState(18).randn(4, 5).astype(np.float32)
        np.testing.assert_allclose(
            float(tla.norm(jnp.asarray(x))), np.linalg.norm(x), rtol=1e-6
        )


class TestNumpy2Additions:
    """numpy 2.0 linalg API surface: svdvals, matrix/vector norms,
    vecdot, multi_dot, tensorsolve/tensorinv, small wrappers."""

    def test_svdvals_and_norms(self):
        rng = np.random.RandomState(40)
        a = rng.randn(2, 12, 12).astype(np.float32)
        np.testing.assert_allclose(
            np.sort(np.asarray(tla.svdvals(jnp.asarray(a)))[0]),
            np.sort(np.linalg.svd(a[0].astype(np.float64),
                                  compute_uv=False)),
            atol=1e-4,
        )
        for o in ["fro", "nuc", 2, -2, 1, -1, np.inf, -np.inf]:
            got = float(np.asarray(
                tla.matrix_norm(jnp.asarray(a), ord=o)
            )[0])
            want = float(np.linalg.norm(a[0].astype(np.float64), ord=o))
            assert abs(got - want) / max(abs(want), 1.0) < 1e-4, o
        np.testing.assert_allclose(
            float(tla.vector_norm(jnp.asarray(a[0, 0]), ord=3)),
            np.linalg.norm(a[0, 0].astype(np.float64), ord=3),
            rtol=1e-5,
        )

    def test_multi_dot_and_vecdot(self):
        rng = np.random.RandomState(41)
        ms = [rng.randn(5, 40), rng.randn(40, 3),
              rng.randn(3, 60), rng.randn(60, 7)]
        got = np.asarray(tla.multi_dot(
            [jnp.asarray(m.astype(np.float32)) for m in ms]
        ), np.float64)
        want = np.linalg.multi_dot(ms)
        np.testing.assert_allclose(got, want, atol=1e-3)
        v = rng.randn(40)
        got_v = np.asarray(tla.multi_dot(
            [jnp.asarray(v.astype(np.float32))]
            + [jnp.asarray(m.astype(np.float32)) for m in ms[1:]]
        ), np.float64)
        np.testing.assert_allclose(
            got_v, np.linalg.multi_dot([v] + ms[1:]), atol=1e-3
        )
        x = np.array([1 + 1j, 2j], np.complex64)
        y = np.array([3.0, 4.0], np.complex64)
        np.testing.assert_allclose(
            np.asarray(tla.vecdot(jnp.asarray(x), jnp.asarray(y))),
            np.vecdot(x, y),
        )

    def test_tensorsolve_tensorinv(self):
        rng = np.random.RandomState(42)
        a = rng.randn(4, 6, 8, 3).astype(np.float32)
        b = rng.randn(4, 6).astype(np.float32)
        x = np.asarray(tla.tensorsolve(jnp.asarray(a), jnp.asarray(b)),
                       np.float64)
        want = np.linalg.tensorsolve(a.astype(np.float64),
                                     b.astype(np.float64))
        assert x.shape == want.shape
        np.testing.assert_allclose(x, want, atol=1e-3)
        ti = np.asarray(tla.tensorinv(jnp.asarray(a), ind=2), np.float64)
        np.testing.assert_allclose(
            ti, np.linalg.tensorinv(a.astype(np.float64), ind=2),
            atol=1e-3,
        )

    def test_small_wrappers(self):
        rng = np.random.RandomState(43)
        a = rng.randn(2, 5, 5).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(tla.trace(jnp.asarray(a))),
            np.trace(a, axis1=-2, axis2=-1), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(tla.diagonal(jnp.asarray(a))),
            np.diagonal(a, axis1=-2, axis2=-1), rtol=1e-6
        )
        assert np.asarray(
            tla.matrix_transpose(jnp.asarray(a))
        ).shape == (2, 5, 5)
        u = np.array([1.0, 0, 0], np.float32)
        v = np.array([0, 1.0, 0], np.float32)
        np.testing.assert_allclose(
            np.asarray(tla.cross(jnp.asarray(u), jnp.asarray(v))),
            np.cross(u, v),
        )
        np.testing.assert_allclose(
            np.asarray(tla.outer(jnp.asarray(u), jnp.asarray(v))),
            np.outer(u, v),
        )
