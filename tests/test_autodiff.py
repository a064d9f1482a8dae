"""Reverse-mode differentiation of the production solvers.

The hot paths (blocked/Pallas LU, refined solves, expm's squaring
``while_loop``) are not reverse-differentiable by unrolling — the
framework installs custom VJPs with the classical adjoints:

- solve:    ``ȳ = A⁻ᵀ x̄``, ``Ā = −ȳ xᵀ``, ``b̄ = ȳ``
- inverse:  ``Ā = −Xᵀ Ḡ Xᵀ``
- det:      ``Ā = ḡ · det(A) · A⁻ᵀ`` (Jacobi)
- slogdet:  ``Ā = ḡ_log · A⁻ᵀ``
- expm:     ``Ā = L(Aᵀ, Ḡ)`` (Fréchet adjoint, Higham Thm. 10.17)

Oracles are computed analytically in numpy float64.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from linalg_solver_tpu import linalg as tla
from linalg_solver_tpu.ops import dispatch


def _well_conditioned(rng, B, n):
    A = rng.randn(B, n, n).astype(np.float32)
    return A + n * np.eye(n, dtype=np.float32)


class TestSolveVJP:
    @pytest.mark.parametrize("backend", ["auto", "loop"])
    def test_grad_matches_analytic(self, backend):
        rng = np.random.RandomState(0)
        B, n = 3, 16
        A = _well_conditioned(rng, B, n)
        b = rng.randn(B, n).astype(np.float32)
        G = rng.randn(B, n).astype(np.float32)

        def f(a_, b_):
            return jnp.sum(
                jnp.asarray(G) * dispatch.solve_batched(a_, b_, backend)
            )

        ga, gb = jax.grad(f, argnums=(0, 1))(
            jnp.asarray(A), jnp.asarray(b)
        )
        for i in range(B):
            A64 = A[i].astype(np.float64)
            x = np.linalg.solve(A64, b[i].astype(np.float64))
            y = np.linalg.solve(A64.T, G[i].astype(np.float64))
            np.testing.assert_allclose(
                np.asarray(gb[i], np.float64), y, rtol=2e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(ga[i], np.float64), -np.outer(y, x),
                rtol=2e-4, atol=1e-5,
            )

    def test_grad_under_jit(self):
        rng = np.random.RandomState(1)
        A = _well_conditioned(rng, 2, 8)
        b = rng.randn(2, 8).astype(np.float32)

        @jax.jit
        def loss(a_, b_):
            x = dispatch.solve_batched(a_, b_)
            return jnp.sum(x * x)

        ga = jax.grad(loss)(jnp.asarray(A), jnp.asarray(b))
        assert np.isfinite(np.asarray(ga)).all()
        # directional finite difference in f64 numpy
        d = rng.randn(2, 8, 8)
        d = (d / np.abs(d).max()).astype(np.float64)

        def loss64(A_):
            x = np.stack([
                np.linalg.solve(A_[i], b[i].astype(np.float64))
                for i in range(2)
            ])
            return float((x * x).sum())

        eps = 1e-5
        A64 = A.astype(np.float64)
        fd = (loss64(A64 + eps * d) - loss64(A64 - eps * d)) / (2 * eps)
        got = float((np.asarray(ga, np.float64) * d).sum())
        assert abs(got - fd) < 2e-3 * max(1.0, abs(fd))


class TestInverseVJP:
    def test_grad_matches_analytic(self):
        rng = np.random.RandomState(2)
        B, n = 2, 12
        A = _well_conditioned(rng, B, n)
        G = rng.randn(B, n, n).astype(np.float32)

        def f(a_):
            return jnp.sum(jnp.asarray(G) * dispatch.inverse_batched(a_))

        ga = jax.grad(f)(jnp.asarray(A))
        for i in range(B):
            X = np.linalg.inv(A[i].astype(np.float64))
            want = -X.T @ G[i].astype(np.float64) @ X.T
            np.testing.assert_allclose(
                np.asarray(ga[i], np.float64), want, rtol=5e-4,
                atol=1e-5 * np.abs(want).max(),
            )


class TestDetVJP:
    def test_grad_matches_jacobi_formula(self):
        rng = np.random.RandomState(3)
        B, n = 3, 10
        A = _well_conditioned(rng, B, n) / n  # keep det O(1)
        w = rng.randn(B).astype(np.float32)

        def f(a_):
            return jnp.sum(jnp.asarray(w) * dispatch.det_batched(a_))

        ga = jax.grad(f)(jnp.asarray(A))
        for i in range(B):
            A64 = A[i].astype(np.float64)
            want = w[i] * np.linalg.det(A64) * np.linalg.inv(A64).T
            np.testing.assert_allclose(
                np.asarray(ga[i], np.float64), want, rtol=1e-3,
                atol=1e-6 + 1e-4 * np.abs(want).max(),
            )


class TestSlogdetVJP:
    def test_grad_is_inverse_transpose(self):
        rng = np.random.RandomState(4)
        B, n = 2, 9
        A = _well_conditioned(rng, B, n)

        def f(a_):
            _, la = tla.slogdet(a_)
            return jnp.sum(la)

        ga = jax.grad(f)(jnp.asarray(A))
        for i in range(B):
            want = np.linalg.inv(A[i].astype(np.float64)).T
            np.testing.assert_allclose(
                np.asarray(ga[i], np.float64), want, rtol=5e-4,
                atol=1e-5,
            )


class TestExpmVJP:
    def test_grad_matches_frechet_adjoint(self):
        import scipy.linalg

        from linalg_solver_tpu.ops.funm import expm_batched

        rng = np.random.RandomState(5)
        B, n = 3, 10
        A = (rng.randn(B, n, n) / np.sqrt(n)).astype(np.float32)
        G = rng.randn(B, n, n).astype(np.float32)

        def f(a_):
            return jnp.sum(jnp.asarray(G) * expm_batched(a_))

        ga = jax.grad(f)(jnp.asarray(A))
        for i in range(B):
            _, want = scipy.linalg.expm_frechet(
                A[i].astype(np.float64).T, G[i].astype(np.float64)
            )
            scale = max(np.abs(want).max(), 1.0)
            assert (
                np.abs(np.asarray(ga[i], np.float64) - want).max() / scale
                < 5e-5
            )

    def test_grad_large_norm_lane(self):
        # A lane that actually squares (‖A‖ > θ₁₃): the while_loop path.
        from linalg_solver_tpu.ops.funm import expm_batched

        rng = np.random.RandomState(6)
        n = 6
        A = (3.0 * rng.randn(2, n, n)).astype(np.float32)

        def f(a_):
            return jnp.sum(expm_batched(a_) ** 2) / 1e6

        ga = jax.grad(f)(jnp.asarray(A))
        assert np.isfinite(np.asarray(ga)).all()


class TestLinalgNamespaceGrad:
    def test_solve_vector_and_matrix_rhs(self):
        rng = np.random.RandomState(7)
        n, k = 16, 3
        A = _well_conditioned(rng, 1, n)[0]
        b = rng.randn(n).astype(np.float32)
        Bm = rng.randn(n, k).astype(np.float32)

        ga_v = jax.grad(lambda a_: jnp.sum(tla.solve(a_, b)))(
            jnp.asarray(A)
        )
        ga_m = jax.grad(lambda a_: jnp.sum(tla.solve(a_, Bm)))(
            jnp.asarray(A)
        )
        A64 = A.astype(np.float64)
        g1 = np.ones(n)
        y = np.linalg.solve(A64.T, g1)
        x = np.linalg.solve(A64, b.astype(np.float64))
        np.testing.assert_allclose(
            np.asarray(ga_v, np.float64), -np.outer(y, x),
            rtol=1e-3, atol=1e-5,
        )
        Gm = np.ones((n, k))
        Y = np.linalg.solve(A64.T, Gm)
        X = np.linalg.solve(A64, Bm.astype(np.float64))
        np.testing.assert_allclose(
            np.asarray(ga_m, np.float64), -(Y @ X.T), rtol=1e-3,
            atol=1e-5,
        )

    def test_inv_and_det(self):
        rng = np.random.RandomState(8)
        n = 8
        A = _well_conditioned(rng, 1, n)[0] / n
        ga = jax.grad(lambda a_: jnp.trace(tla.inv(a_)))(jnp.asarray(A))
        A64 = A.astype(np.float64)
        X = np.linalg.inv(A64)
        np.testing.assert_allclose(
            np.asarray(ga, np.float64), -(X.T @ X.T), rtol=1e-3,
            atol=1e-5,
        )
        gd = jax.grad(lambda a_: tla.det(a_))(jnp.asarray(A))
        want = np.linalg.det(A64) * np.linalg.inv(A64).T
        np.testing.assert_allclose(
            np.asarray(gd, np.float64), want, rtol=1e-3, atol=1e-6
        )


class TestLstsqVJP:
    def test_overdetermined_grad(self):
        from linalg_solver_tpu.ops.lstsq import lstsq_batched

        rng = np.random.RandomState(9)
        B, m, n = 2, 20, 6
        A = rng.randn(B, m, n).astype(np.float32)
        b = rng.randn(B, m).astype(np.float32)
        G = rng.randn(B, n).astype(np.float32)

        def f(a_, b_):
            return jnp.sum(jnp.asarray(G) * lstsq_batched(a_, b_).x)

        ga, gb = jax.grad(f, argnums=(0, 1))(
            jnp.asarray(A), jnp.asarray(b)
        )
        for i in range(B):
            A64 = A[i].astype(np.float64)
            b64 = b[i].astype(np.float64)
            g64 = G[i].astype(np.float64)
            x = np.linalg.lstsq(A64, b64, rcond=None)[0]
            z = np.linalg.solve(A64.T @ A64, g64)
            r = b64 - A64 @ x
            want_a = np.outer(r, z) - np.outer(A64 @ z, x)
            np.testing.assert_allclose(
                np.asarray(ga[i], np.float64), want_a, rtol=2e-3,
                atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(gb[i], np.float64), A64 @ z, rtol=2e-3,
                atol=1e-4,
            )

    def test_underdetermined_grad(self):
        from linalg_solver_tpu.ops.lstsq import lstsq_batched

        rng = np.random.RandomState(10)
        B, m, n = 2, 6, 20
        A = rng.randn(B, m, n).astype(np.float32)
        b = rng.randn(B, m).astype(np.float32)
        G = rng.randn(B, n).astype(np.float32)

        def f(a_, b_):
            return jnp.sum(jnp.asarray(G) * lstsq_batched(a_, b_).x)

        ga, gb = jax.grad(f, argnums=(0, 1))(
            jnp.asarray(A), jnp.asarray(b)
        )
        for i in range(B):
            A64 = A[i].astype(np.float64)
            b64 = b[i].astype(np.float64)
            g64 = G[i].astype(np.float64)
            Gm = A64 @ A64.T
            w = np.linalg.solve(Gm, b64)
            x = A64.T @ w
            u = np.linalg.solve(Gm, A64 @ g64)
            want_a = np.outer(w, g64 - A64.T @ u) - np.outer(u, x)
            np.testing.assert_allclose(
                np.asarray(ga[i], np.float64), want_a, rtol=2e-3,
                atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(gb[i], np.float64), u, rtol=2e-3, atol=1e-4
            )

    def test_resid_differentiates_through_x(self):
        # resid is a plain composition of x — grad of the squared
        # residual wrt A must match 2·r·(∂r/∂A) computed in f64.
        from linalg_solver_tpu.ops.lstsq import lstsq_batched

        rng = np.random.RandomState(11)
        B, m, n = 1, 12, 4
        A = rng.randn(B, m, n).astype(np.float32)
        b = rng.randn(B, m).astype(np.float32)

        def f(a_):
            return jnp.sum(lstsq_batched(a_, jnp.asarray(b)).resid ** 2)

        ga = np.asarray(jax.grad(f)(jnp.asarray(A)), np.float64)[0]
        # f64 directional finite difference
        d = rng.randn(m, n)
        d /= np.abs(d).max()
        eps = 1e-6

        def f64(A_):
            x = np.linalg.lstsq(A_, b[0].astype(np.float64),
                                rcond=None)[0]
            r = b[0].astype(np.float64) - A_ @ x
            return float(r @ r)

        A64 = A[0].astype(np.float64)
        fd = (f64(A64 + eps * d) - f64(A64 - eps * d)) / (2 * eps)
        got = float((ga * d).sum())
        assert abs(got - fd) < 5e-3 * max(1.0, abs(fd)), (got, fd)
