"""Device polynomial roots (companion + Schur) vs numpy.roots."""

import numpy as np
import pytest

import jax.numpy as jnp

from linalg_solver_tpu.ops.roots import roots_batched


def match(got, want, tol):
    for g in got:
        j = np.argmin(np.abs(want - g))
        assert abs(want[j] - g) < tol, (g, want)
        want = np.delete(want, j)


class TestRoots:
    @pytest.mark.parametrize("d", [1, 2, 5, 12])
    def test_matches_numpy(self, d):
        rng = np.random.RandomState(d)
        B = 3
        c = rng.randn(B, d + 1).astype(np.float32)
        c[:, 0] += np.sign(c[:, 0]) + (c[:, 0] == 0)
        res = roots_batched(jnp.asarray(c))
        assert bool(np.asarray(res.ok).all())
        assert bool(np.asarray(res.converged).all())
        got = np.asarray(res.real) + 1j * np.asarray(res.imag)
        for i in range(B):
            want = np.roots(c[i].astype(np.float64))
            scale = max(np.abs(want).max(), 1.0)
            match(got[i], want, 1e-3 * scale)

    def test_known_factored(self):
        # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
        c = np.array([[1.0, -6.0, 11.0, -6.0]], np.float32)
        res = roots_batched(jnp.asarray(c))
        got = np.sort(np.asarray(res.real)[0])
        np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-4)
        assert np.abs(np.asarray(res.imag)).max() < 1e-4

    def test_complex_pair(self):
        # x^2 + 1 = 0 -> ±i
        c = np.array([[1.0, 0.0, 1.0]], np.float32)
        res = roots_batched(jnp.asarray(c))
        im = np.sort(np.asarray(res.imag)[0])
        np.testing.assert_allclose(im, [-1.0, 1.0], atol=1e-5)

    def test_zero_lead_flagged(self):
        c = np.array([[0.0, 1.0, 1.0], [1.0, 0.0, -4.0]], np.float32)
        res = roots_batched(jnp.asarray(c))
        ok = np.asarray(res.ok)
        assert not bool(ok[0]) and bool(ok[1])
