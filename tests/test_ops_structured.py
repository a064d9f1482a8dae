"""Circulant / Hankel / Vandermonde structured solvers vs dense oracles."""

import numpy as np

import jax.numpy as jnp

from linalg_solver_tpu.ops.structured import (
    circulant_dense_batched,
    circulant_matvec_batched,
    circulant_solve_batched,
    hankel_dense_batched,
    hankel_matvec_batched,
    hankel_solve_batched,
    vandermonde_dense_batched,
    vandermonde_solve_batched,
    vandermonde_solve_t_batched,
)


def diag_dominant_symbol(B, n, seed=0):
    rng = np.random.RandomState(seed)
    c = (rng.randn(B, n) * np.exp(-0.4 * np.arange(n))).astype(np.float32)
    c[:, 0] += 4.0
    return c


class TestCirculant:
    def test_dense_matches_scipy(self):
        from scipy.linalg import circulant

        c = diag_dominant_symbol(1, 11, seed=1)
        got = np.asarray(circulant_dense_batched(jnp.asarray(c)))[0]
        np.testing.assert_allclose(got, circulant(c[0]), atol=1e-6)

    def test_matvec_matches_dense(self):
        c = diag_dominant_symbol(3, 17, seed=2)
        v = np.random.RandomState(3).randn(3, 17).astype(np.float32)
        got = np.asarray(
            circulant_matvec_batched(jnp.asarray(c), jnp.asarray(v)),
            np.float64,
        )
        C = np.asarray(circulant_dense_batched(jnp.asarray(c)), np.float64)
        np.testing.assert_allclose(
            got, np.einsum("bij,bj->bi", C, v), atol=1e-4
        )

    def test_solve_exact(self):
        c = diag_dominant_symbol(4, 64, seed=4)
        b = np.random.RandomState(5).randn(4, 64).astype(np.float32)
        res = circulant_solve_batched(jnp.asarray(c), jnp.asarray(b))
        assert bool(np.asarray(res.ok).all())
        C = np.asarray(circulant_dense_batched(jnp.asarray(c)), np.float64)
        want = np.linalg.solve(C, b[..., None].astype(np.float64))[..., 0]
        np.testing.assert_allclose(np.asarray(res.x, np.float64), want,
                                   atol=1e-4)

    def test_singular_lane_flagged(self):
        """A lane whose symbol has an exactly-zero DFT mode (ones
        vector: all modes except DC vanish) must report ok=False while
        healthy lanes in the same batch stay ok."""
        c = diag_dominant_symbol(2, 16, seed=6)
        c[1] = 1.0  # rank-one circulant: fft = [n, 0, 0, ...]
        res = circulant_solve_batched(jnp.asarray(c), jnp.ones((2, 16),
                                                              np.float32))
        ok = np.asarray(res.ok)
        assert bool(ok[0]) and not bool(ok[1])
        assert np.isfinite(np.asarray(res.x)).all()


class TestHankel:
    def _hankel(self, B, n, seed):
        rng = np.random.RandomState(seed)
        h = (rng.randn(B, 2 * n - 1)
             * np.exp(-0.4 * np.abs(np.arange(2 * n - 1) - (n - 1)))
             ).astype(np.float32)
        h[:, n - 1] += 4.0  # dominant anti-diagonal => well-conditioned
        return h[:, :n], h[:, n - 1:]

    def test_dense_matches_scipy(self):
        from scipy.linalg import hankel

        c, r = self._hankel(1, 9, seed=7)
        got = np.asarray(
            hankel_dense_batched(jnp.asarray(c), jnp.asarray(r))
        )[0]
        np.testing.assert_allclose(got, hankel(c[0], r[0]), atol=1e-6)

    def test_matvec_matches_dense(self):
        c, r = self._hankel(3, 21, seed=8)
        v = np.random.RandomState(9).randn(3, 21).astype(np.float32)
        got = np.asarray(
            hankel_matvec_batched(
                jnp.asarray(c), jnp.asarray(r), jnp.asarray(v)
            ),
            np.float64,
        )
        H = np.asarray(
            hankel_dense_batched(jnp.asarray(c), jnp.asarray(r)),
            np.float64,
        )
        np.testing.assert_allclose(
            got, np.einsum("bij,bj->bi", H, v), atol=1e-4
        )

    def test_solve_matches_dense(self):
        c, r = self._hankel(2, 48, seed=10)
        b = np.random.RandomState(11).randn(2, 48).astype(np.float32)
        res = hankel_solve_batched(
            jnp.asarray(c), jnp.asarray(r), jnp.asarray(b), tol=1e-6
        )
        assert bool(np.asarray(res.converged).all())
        H = np.asarray(
            hankel_dense_batched(jnp.asarray(c), jnp.asarray(r)),
            np.float64,
        )
        want = np.linalg.solve(H, b[..., None].astype(np.float64))[..., 0]
        np.testing.assert_allclose(np.asarray(res.x, np.float64), want,
                                   atol=1e-4)


class TestVandermonde:
    def _nodes(self, B, n, seed):
        """Chebyshev-like well-spread nodes with per-lane jitter —
        the benign regime where BP shines."""
        rng = np.random.RandomState(seed)
        base = np.cos(np.pi * (np.arange(n) + 0.5) / n)
        x = base[None, :] + 0.05 * rng.randn(B, n) / n
        return np.sort(x, axis=1).astype(np.float32)

    def test_dense_matches_numpy(self):
        x = self._nodes(1, 7, seed=12)
        got = np.asarray(vandermonde_dense_batched(jnp.asarray(x)))[0]
        want = np.vander(x[0], increasing=True)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_primal_is_interpolation(self):
        """V a = f in O(n²): the returned coefficients must reproduce
        the data through numpy polyval in f64."""
        B, n = 3, 10
        x = self._nodes(B, n, seed=13)
        f = np.random.RandomState(14).randn(B, n).astype(np.float32)
        res = vandermonde_solve_batched(jnp.asarray(x), jnp.asarray(f))
        assert bool(np.asarray(res.ok).all())
        a = np.asarray(res.x, np.float64)
        for i in range(B):
            vals = np.polyval(a[i][::-1], x[i].astype(np.float64))
            np.testing.assert_allclose(vals, f[i], atol=5e-4)

    def test_primal_matches_f64_dense_solve(self):
        B, n = 2, 9
        x = self._nodes(B, n, seed=15)
        f = np.random.RandomState(16).randn(B, n).astype(np.float32)
        res = vandermonde_solve_batched(jnp.asarray(x), jnp.asarray(f))
        V = np.asarray(vandermonde_dense_batched(jnp.asarray(x)),
                       np.float64)
        want = np.linalg.solve(V, f[..., None].astype(np.float64))[..., 0]
        np.testing.assert_allclose(np.asarray(res.x, np.float64), want,
                                   rtol=2e-3, atol=2e-3)

    def test_exact_on_polynomial_data(self):
        """Interpolating exact polynomial values recovers the exact
        (small-integer) coefficients — BP's signature accuracy case."""
        n = 8
        coeffs = np.array([2.0, -1.0, 0.0, 3.0, 0.0, 0.0, 0.0, 1.0],
                          np.float64)
        x = self._nodes(1, n, seed=17).astype(np.float64)
        f = np.polyval(coeffs[::-1], x[0])[None].astype(np.float32)
        res = vandermonde_solve_batched(
            jnp.asarray(x.astype(np.float32)), jnp.asarray(f)
        )
        np.testing.assert_allclose(np.asarray(res.x)[0], coeffs,
                                   atol=5e-4)

    def test_dual_matches_f64_dense_solve(self):
        B, n = 3, 9
        x = self._nodes(B, n, seed=18)
        b = np.random.RandomState(19).randn(B, n).astype(np.float32)
        res = vandermonde_solve_t_batched(jnp.asarray(x), jnp.asarray(b))
        assert bool(np.asarray(res.ok).all())
        V = np.asarray(vandermonde_dense_batched(jnp.asarray(x)),
                       np.float64)
        want = np.linalg.solve(
            np.swapaxes(V, 1, 2), b[..., None].astype(np.float64)
        )[..., 0]
        np.testing.assert_allclose(np.asarray(res.x, np.float64), want,
                                   rtol=2e-3, atol=2e-3)

    def test_coincident_nodes_flagged(self):
        x = self._nodes(2, 6, seed=20)
        x[1, 3] = x[1, 2]  # exactly repeated node
        f = np.random.RandomState(21).randn(2, 6).astype(np.float32)
        res = vandermonde_solve_batched(jnp.asarray(x), jnp.asarray(f))
        ok = np.asarray(res.ok)
        assert bool(ok[0]) and not bool(ok[1])

    def test_n1_trivial(self):
        x = np.array([[0.5]], np.float32)
        f = np.array([[2.5]], np.float32)
        res = vandermonde_solve_batched(jnp.asarray(x), jnp.asarray(f))
        assert bool(np.asarray(res.ok).all())
        np.testing.assert_allclose(np.asarray(res.x), f)


class TestVandermondeOverflow:
    def test_large_n_overflow_flagged(self):
        """n = 128 Chebyshev-like nodes: cond(V) is astronomically
        large and the f32 BP intermediates overflow — the lane must
        report ok=False (measured silently-NaN on TPU before the
        finiteness gate)."""
        rng = np.random.RandomState(30)
        n = 128
        base = np.cos(np.pi * (np.arange(n) + 0.5) / n)
        x = np.sort(base[None] + 0.02 * rng.randn(1, n) / n,
                    axis=1).astype(np.float32)
        f = rng.randn(1, n).astype(np.float32)
        res = vandermonde_solve_batched(jnp.asarray(x), jnp.asarray(f))
        assert not bool(np.asarray(res.ok).all())
